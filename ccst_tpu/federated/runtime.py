"""Federated training runtime: round loop, evaluation, checkpointing.

Rebuild of the reference's main loop (federated/fed_run.py:649-766):

  round r in [resume, rounds):
    - each client trains ``wk_iters`` local epochs from its current weights
      (fresh plain-SGD each round, fed_run.py:657)
    - aggregate (fedavg/fedbn/fedprox/adafea) -> server + refreshed clients
    - validate the server on every source client's val split
    - test the server on the held-out target domain
    - checkpoint ``latest`` every ``save_freq`` rounds; track ``best`` by
      mean source-val accuracy and record its target-test accuracy
      (fed_run.py:734-766)

Two execution modes:
  - sequential simulation (one device, reference-parity semantics);
  - client-parallel: clients stacked on a leading axis and stepped under
    ``jax.vmap`` — on a multi-chip mesh the stacked axis is sharded over
    the ``client`` axis so every client trains simultaneously and
    aggregation lowers to weighted all-reduce over ICI (see
    ``ccst_tpu.parallel.fed_mesh``).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.config import FedConfig
from ccst_tpu.data.loader import Batch, ImageBatchLoader
from ccst_tpu.federated.aggregate import aggregate, stack_clients, unstack_clients
from ccst_tpu.federated.data import ClientData, build_client_data
from ccst_tpu.federated.train_ops import make_eval_step, make_train_step
from ccst_tpu.models.classifiers import get_network
from ccst_tpu.utils.checkpoint import (
    checkpoint_paths,
    load_checkpoint,
    save_checkpoint,
)
from ccst_tpu.utils.metrics import MetricsLogger

Array = jax.Array
State = Dict[str, Any]


@jax.jit
def _u8_to_unit(x: Array) -> Array:
    return x.astype(jnp.float32) / 255.0


def _batch_dict(batch: Batch) -> Dict[str, Array]:
    b = batch.images.shape[0]
    mask = (np.arange(b) < batch.valid).astype(np.float32)
    imgs = jnp.asarray(batch.images)
    if imgs.dtype == jnp.uint8:
        # u8 transport (federated/data.py loaders): images cross PCIe as
        # bytes (1/4 the traffic) and convert to the raw [0,1] float the
        # train steps expect ON DEVICE — bit-identical to shipping float32
        # (the same integer bytes / 255 either way)
        imgs = _u8_to_unit(imgs)
    return {
        "images": imgs,
        "labels": jnp.asarray(batch.labels),
        "mask": jnp.asarray(mask),
    }


class FederatedRunner:
    def __init__(
        self,
        cfg: FedConfig,
        model=None,
        clients: Optional[List[ClientData]] = None,
        test_loader: Optional[ImageBatchLoader] = None,
        amp_bank: Optional[np.ndarray] = None,
        logger: Optional[MetricsLogger] = None,
    ):
        self.cfg = cfg
        spec = cfg.spec
        self.model = model or get_network(
            cfg.network, classes=spec.num_classes, dg_method=cfg.dg_method
        )
        if clients is None or test_loader is None:
            clients, test_loader = build_client_data(cfg)
        self.clients = clients
        self.test_loader = test_loader
        # deepall trains a single centralized pseudo-client (clients[0]);
        # the remaining entries only supply per-domain val splits
        self.n_clients = 1 if cfg.mode.lower() == "deepall" else len(self.clients)
        # equal client weights 1/N (fed_run.py:577)
        self.weights = jnp.full((self.n_clients,), 1.0 / self.n_clients)
        self.amp_bank = None if amp_bank is None else jnp.asarray(amp_bank)

        run_name = (
            f"{cfg.dataset}_{cfg.target}_{cfg.mode}_{cfg.fusion_mode}_"
            f"{cfg.dg_method}_{cfg.network}_seed{cfg.seed}"
        )
        self.run_name = run_name
        self.logger = logger or MetricsLogger(
            os.path.join(cfg.log_path, run_name + ".jsonl")
        )
        self.ckpt = checkpoint_paths(cfg.save_path, run_name)

        # --- model state init (server replicated to clients, fed_run.py:579)
        key = jax.random.PRNGKey(cfg.seed)
        dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        init_rngs = {"params": key}
        if cfg.dg_method.lower() == "mixstyle":
            init_rngs["mixstyle"] = jax.random.PRNGKey(cfg.seed + 1)
        variables = self.model.init(init_rngs, dummy, train=False)
        self.server: State = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        self.client_states: List[State] = [
            jax.tree.map(lambda x: x, self.server) for _ in range(self.n_clients)
        ]

        raw_step = make_train_step(
            self.model,
            n_classes=spec.num_classes,
            image_size=cfg.image_size,
            lr=cfg.lr,
            dg_method=cfg.dg_method,
            mode=cfg.mode,
            mu=cfg.mu,
            jig_weight=cfg.jig_weight,
            jigsaw_n_classes=cfg.jigsaw_n_classes,
            bias_whole_image=cfg.bias_whole_image,
            meta_step_size=cfg.meta_step_size,
            clip_value=cfg.clip_value,
            min_scale=cfg.min_scale,
            max_scale=cfg.max_scale,
        )
        self._train_step = jax.jit(raw_step)
        self._ptrainer = None
        if cfg.parallel_clients:
            from ccst_tpu.parallel.fed_mesh import ParallelFedTrainer, make_fed_mesh

            mesh = None
            if cfg.client_shards * cfg.data_shards > 1:
                mesh = make_fed_mesh(cfg.client_shards, cfg.data_shards)
            self._ptrainer = ParallelFedTrainer(
                raw_step, cfg.mode, self.weights, mesh=mesh
            )
        # --IN_test: evaluate with every BatchNorm swapped for an affine
        # InstanceNorm reusing the BN scale/bias (fed_run.py:218-232). The
        # zoo names norm modules identically across kinds, so the same params
        # tree applies.
        eval_model = self.model
        if cfg.in_test:
            if not hasattr(self.model, "norm"):
                raise ValueError(f"--IN_test unsupported for {cfg.network}")
            eval_model = self.model.clone(norm="in")
        self.eval_model = eval_model
        self._eval_step = jax.jit(
            make_eval_step(eval_model, image_size=cfg.image_size)
        )
        self._aggregate = jax.jit(
            lambda cp, cs, w: aggregate(cfg.mode, cp, cs, w),
        )
        self.start_round = 0
        self.best = {"val_acc_mean": -1.0, "round": -1, "test_acc": None}

    @property
    def client_names(self) -> List[str]:
        return [c.name for c in self.clients]

    # ------------------------------------------------------------------
    # local training
    # ------------------------------------------------------------------

    def train_client_epoch(
        self, ci: int, state: State, rng: jax.Array
    ) -> Tuple[State, Dict[str, float]]:
        server_params = self.server["params"]
        n_steps = 0
        metrics = []  # device arrays: converting per step would sync the
        # device every batch and defeat JAX async dispatch
        for step_idx, batch in enumerate(self.clients[ci].train):
            bd = _batch_dict(batch)
            if self.amp_bank is not None:
                bd["amp_bank"] = self.amp_bank
            rng, step_key = jax.random.split(rng)
            state, m = self._train_step(
                state, server_params, bd, step_key, jnp.asarray(step_idx)
            )
            metrics.append((m.loss, m.correct, m.count))
            n_steps += 1
        loss_sum = correct = count = 0.0
        for l, c, n in metrics:  # one sync at epoch end
            loss_sum += float(l)
            correct += float(c)
            count += float(n)
        return state, {
            "train_loss": loss_sum / max(n_steps, 1),
            "train_acc": correct / max(count, 1.0),
        }

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------

    def evaluate(self, state: State, loader: ImageBatchLoader) -> Tuple[float, float]:
        """(mean loss, accuracy) — `test()` (fed_run.py:214-259)."""
        loss_sum = correct = count = 0.0
        for batch in loader:
            l, c, n = self._eval_step(state, _batch_dict(batch))
            loss_sum += float(l)
            correct += float(c)
            count += float(n)
        if count == 0:
            return 0.0, 0.0
        return loss_sum / count, correct / count

    def server_eval_state(self) -> State:
        """State used for server-side evaluation. For fedbn, BN statistics are
        re-averaged from the clients (test_fedbn, fed_run.py:350-381) — our
        aggregate already averaged them into the server, so this is just the
        server state."""
        return self.server

    # ------------------------------------------------------------------
    # round loop
    # ------------------------------------------------------------------

    def resume(self) -> None:
        if not os.path.exists(self.ckpt["latest"]):
            return
        payload = load_checkpoint(self.ckpt["latest"])
        self.server = jax.tree.map(jnp.asarray, payload["server"])
        if self.cfg.mode.lower() == "fedbn" and "clients" in payload:
            self.client_states = [
                jax.tree.map(jnp.asarray, c) for c in payload["clients"]
            ]
        else:
            # fedavg-family resume restarts clients from server weights
            # (fed_run.py:627-640)
            self.client_states = [
                jax.tree.map(lambda x: x, self.server)
                for _ in range(self.n_clients)
            ]
        # restore the best-so-far record (now saved up-to-date in latest):
        # without it, the first post-resume round always overwrote the best
        # checkpoint regardless of its validation score
        if payload.get("best"):
            self.best = dict(payload["best"])
        self.start_round = int(payload["round"]) + 1
        self.best = payload.get("best", self.best)
        self.logger.log("resume", round=self.start_round)

    def save(self, round_idx: int, best: bool = False) -> None:
        payload = {
            "server": self.server,
            "round": round_idx,
            "best": self.best,
        }
        if self.cfg.mode.lower() == "fedbn":
            payload["clients"] = self.client_states
        save_checkpoint(self.ckpt["best" if best else "latest"], payload)

    def run_round(self, round_idx: int) -> Dict[str, Any]:
        cfg = self.cfg
        t0 = time.perf_counter()
        rng = jax.random.PRNGKey(cfg.seed * 100003 + round_idx)
        train_metrics = {}
        has_stats = bool(self.client_states[0]["batch_stats"])
        if self._ptrainer is not None:
            # one vmapped program steps every client per local step
            from ccst_tpu.parallel.fed_mesh import stack_step_batches

            stacked = stack_clients(self.client_states)
            stacked = self._ptrainer.shard_states(stacked)

            def to_bd(batch):
                bd = _batch_dict(batch)
                if self.amp_bank is not None:
                    bd["amp_bank"] = self.amp_bank
                return bd

            for wk in range(cfg.wk_iters):
                rng, sub = jax.random.split(rng)
                batches = stack_step_batches(
                    [self.clients[ci].train for ci in range(self.n_clients)], to_bd
                )
                stacked, pm = self._ptrainer.run_epoch(
                    stacked, self.server["params"], batches, sub
                )
            for ci in range(self.n_clients):
                train_metrics[self.clients[ci].name] = {
                    "train_loss": float(pm["train_loss"][ci]),
                    "train_acc": float(pm["train_acc"][ci]),
                }
            cp, cs = stacked["params"], (stacked["batch_stats"] if has_stats else {})
            sp, ss, ncp, ncs = self._ptrainer.communicate(cp, cs)
        else:
            for wk in range(cfg.wk_iters):
                for ci in range(self.n_clients):
                    rng, sub = jax.random.split(rng)
                    self.client_states[ci], m = self.train_client_epoch(
                        ci, self.client_states[ci], sub
                    )
                    train_metrics[self.clients[ci].name] = m

            cp = stack_clients([s["params"] for s in self.client_states])
            cs = (
                stack_clients([s["batch_stats"] for s in self.client_states])
                if has_stats
                else {}
            )
            sp, ss, ncp, ncs = self._aggregate(cp, cs, self.weights)
        self.server = {"params": sp, "batch_stats": ss}
        new_params = unstack_clients(ncp, self.n_clients)
        new_stats = (
            unstack_clients(ncs, self.n_clients)
            if has_stats
            else [{} for _ in range(self.n_clients)]
        )
        self.client_states = [
            {"params": p, "batch_stats": s} for p, s in zip(new_params, new_stats)
        ]

        eval_state = self.server_eval_state()
        val_accs = []
        for c in (self.clients if self.cfg.mode.lower() != "deepall" else self.clients[1:]):
            _, acc = self.evaluate(eval_state, c.val)
            val_accs.append(acc)
        val_acc_mean = float(np.mean(val_accs)) if val_accs else 0.0
        _, test_acc = self.evaluate(eval_state, self.test_loader)

        record = {
            "round": round_idx,
            "val_acc_mean": val_acc_mean,
            "test_acc": test_acc,
            "seconds": time.perf_counter() - t0,
            **{f"train_acc/{k}": v["train_acc"] for k, v in train_metrics.items()},
            **{f"train_loss/{k}": v["train_loss"] for k, v in train_metrics.items()},
        }
        self.logger.log("round", **record)

        # best-update BEFORE save(latest): the latest payload embeds
        # self.best, and a stale copy there meant a crash + resume could
        # let a later, worse round overwrite the best checkpoint
        is_best = val_acc_mean > self.best["val_acc_mean"]
        if is_best:
            self.best = {
                "val_acc_mean": val_acc_mean,
                "round": round_idx,
                "test_acc": test_acc,
            }
        if round_idx % cfg.save_freq == 0 or round_idx == cfg.rounds - 1:
            self.save(round_idx)
        if is_best:
            self.save(round_idx, best=True)
            self.logger.log("best", **self.best)
        return record

    def run(self) -> Dict[str, Any]:
        from ccst_tpu.utils.profiling import maybe_trace

        if self.cfg.resume:
            self.resume()
        with maybe_trace(self.cfg.trace_dir or None):
            for r in range(self.start_round, self.cfg.rounds):
                self.run_round(r)
        self.logger.log("done", **self.best)
        return dict(self.best)

    # ------------------------------------------------------------------
    # test-only entry (fed_run.py:582-595)
    # ------------------------------------------------------------------

    def test_only(self, which: str = "best") -> float:
        payload = load_checkpoint(self.ckpt[which])
        self.server = jax.tree.map(jnp.asarray, payload["server"])
        _, acc = self.evaluate(self.server_eval_state(), self.test_loader)
        self.logger.log("test_only", checkpoint=which, test_acc=acc)
        return acc
