"""Launchable multi-process (DCN) federated training.

The reference's distributed entry point is an ``mp.spawn`` +
``dist.init_process_group`` script you can actually run
(reconstruct_img/imagenet_reconstruct.py:141-175). This module is the
TPU-native equivalent for `fed-train`: each process (host) joins a
``jax.distributed`` cluster, owns a contiguous block of clients, loads ONLY
its clients' data (the DistributedSampler analogue), and steps them inside
one global jitted program over the (client, data) mesh — the client axis
rides the process/DCN boundary, FedAvg lowers to a cross-host weighted
all-reduce (parallel/multihost.py layout doctrine).

Division of labor per round:
  - every process: local-epoch stepping of its clients (global collective
    program), its own clients' val-split evaluation (host-local compute);
  - process 0 additionally: target-domain test evaluation, metrics JSONL,
    checkpoint writing (single-writer — no cross-host file races).

Launch (2 hosts):
  ccst-tpu fed-train --coordinator host0:1357 --num-procs 2 --proc-id 0 ...
  ccst-tpu fed-train --coordinator host0:1357 --num-procs 2 --proc-id 1 ...
or the CCST_COORDINATOR / CCST_NUM_PROCS / CCST_PROC_ID env equivalents.
Driven end-to-end by tests/test_multihost.py::test_cli_multihost_fed_train.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ccst_tpu.config import FedConfig
from ccst_tpu.federated.aggregate import stack_clients, unstack_clients
from ccst_tpu.federated.data import build_client_data
from ccst_tpu.federated.runtime import FederatedRunner, _batch_dict
from ccst_tpu.parallel import multihost
from ccst_tpu.parallel.fed_mesh import ParallelFedTrainer

State = Dict[str, Any]


def _steps_per_epoch(loader) -> int:
    n = getattr(loader, "n_batches", None)
    if n is not None:
        return int(n)
    return (len(loader.paths) + loader.batch_size - 1) // loader.batch_size


def _fixed_length_stacked_batches(
    loaders: List, to_bd, n_steps: int
) -> Iterator[Dict[str, Any]]:
    """Yield exactly ``n_steps`` stacked (C_local, B, ...) batch dicts.

    Unlike fed_mesh.stack_step_batches (which stops when the LOCAL clients
    are exhausted), every process must execute the same number of global
    collective steps, so the step count is fixed up front from the global
    max epoch length; locally-exhausted clients contribute zero-mask
    padding steps (identical masked-step semantics)."""
    iters = [iter(l) for l in loaders]
    last: List[Optional[Dict[str, Any]]] = [None] * len(iters)
    for _ in range(n_steps):
        batches = []
        for i, it in enumerate(iters):
            b = None
            if it is not None:
                try:
                    b = to_bd(next(it))
                    last[i] = b
                except StopIteration:
                    iters[i] = None
            if b is None:
                if last[i] is None:
                    raise ValueError(f"local client {i} has no batches")
                b = {**last[i], "mask": jnp.zeros_like(last[i]["mask"])}
            batches.append(b)
        yield jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


class MultihostFedRunner:
    """Round loop over a jax.distributed cluster.

    Reuses FederatedRunner for everything host-local (model init, train-step
    construction, eval, checkpoint/metrics formats) and replaces the stepping
    core with globally-sharded collective programs. ``jax.distributed`` must
    already be initialized (multihost.initialize) before construction.
    """

    def __init__(self, cfg: FedConfig, amp_bank: Optional[np.ndarray] = None):
        n_procs = jax.process_count()
        self.proc = jax.process_index()
        sources = list(cfg.source_domains)
        n_clients = len(sources)
        if n_clients % n_procs:
            raise ValueError(
                f"{n_clients} source clients not divisible by {n_procs} "
                f"processes (PACS/OfficeHome have 3: launch 1 or 3 hosts)"
            )
        self.my_clients = list(multihost.process_clients(n_clients))

        # loader objects are built for every client on every host (cheap:
        # path lists only — decode threads start at iteration), but each
        # process only ever ITERATES its own clients' train/val loaders and
        # rank 0 the test loader, so actual image IO is process-local (the
        # DistributedSampler analogue)
        clients_all, test_loader = build_client_data(cfg)
        my_names = [sources[i] for i in self.my_clients]
        self.local_clients = [c for c in clients_all if c.name in my_names]
        # every process must know every client's epoch length for the global
        # step count; lists are identical on all hosts, so this is local math
        self.global_steps = max(
            _steps_per_epoch(c.train) for c in clients_all
        )

        # host-local runner: provides train step, eval step, logging and
        # checkpoint plumbing. Clients list is the full set so run-name,
        # weights and val bookkeeping match the single-host layout.
        # Single-writer rule: only process 0 gets a file-backed logger (a
        # null logger elsewhere — non-writers never even create the file).
        from ccst_tpu.utils.metrics import MetricsLogger

        logger = None if self.proc == 0 else MetricsLogger(None, echo=False)
        self.inner = FederatedRunner(
            cfg, clients=clients_all, test_loader=test_loader,
            amp_bank=amp_bank, logger=logger,
        )

        n_local_dev = max(len(jax.local_devices()), 1)
        data_shards = cfg.data_shards if cfg.data_shards > 1 else 1
        if n_local_dev * n_procs < n_clients * data_shards:
            data_shards = 1
        self.mesh = multihost.global_fed_mesh(n_clients, data_shards)
        raw_step = self.inner._train_step.__wrapped__  # un-jitted step
        self.trainer = ParallelFedTrainer(
            raw_step, cfg.mode, self.inner.weights, mesh=self.mesh
        )
        self.n_clients = n_clients
        self.cfg = cfg
        # one compiled replication program, reused for every tree pulled to
        # host (jit caches by function identity: a fresh lambda per call
        # would re-trace 4x per round)
        self._replicate = jax.jit(
            lambda t: t, out_shardings=NamedSharding(self.mesh, P())
        )

    # ------------------------------------------------------------------

    def _global_states(self) -> State:
        """Stack THIS process's client states and assemble the global
        client-sharded tree (every host contributes its own block)."""
        local = stack_clients(
            [self.inner.client_states[i] for i in self.my_clients]
        )
        return multihost.shard_stacked_tree(
            jax.tree.map(np.asarray, local), self.mesh, "client"
        )

    def _to_host(self, tree):
        """Replicated global tree -> host numpy (readable on every process)."""
        rep = self._replicate(tree)
        return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), rep)

    def run_round(self, round_idx: int) -> Dict[str, Any]:
        cfg = self.cfg
        inner = self.inner
        t0 = time.perf_counter()
        rng = jax.random.PRNGKey(cfg.seed * 100003 + round_idx)

        states = self._global_states()
        server_params = multihost.replicate_tree(
            jax.tree.map(np.asarray, inner.server["params"]), self.mesh
        )

        def to_bd(batch):
            bd = _batch_dict(batch)
            if inner.amp_bank is not None:
                bd["amp_bank"] = inner.amp_bank
            return bd

        n = self.n_clients
        metric_acc = None  # (4, n) device-side running sum: one host sync
        # per ROUND instead of four blocking DCN gathers per step
        for wk in range(cfg.wk_iters):
            rng, sub = jax.random.split(rng)
            for step_idx, local_batch in enumerate(
                _fixed_length_stacked_batches(
                    [c.train for c in self.local_clients], to_bd,
                    self.global_steps,
                )
            ):
                sub, skey = jax.random.split(sub)
                rngs = multihost.replicate_tree(
                    np.asarray(jax.random.split(skey, n)), self.mesh
                )
                batch = {
                    k: multihost.from_process_local(
                        self.mesh,
                        P("client", "data") if v.ndim >= 2 else P("client"),
                        v,
                    )
                    for k, v in local_batch.items()
                }
                states, m = self.trainer.step(
                    states, server_params, batch, rngs, jnp.asarray(step_idx)
                )
                step_metrics = jnp.stack([m.loss, m.correct, m.count, m.active])
                metric_acc = (
                    step_metrics if metric_acc is None else metric_acc + step_metrics
                )
        from jax.experimental import multihost_utils

        loss, correct, count, active = np.asarray(
            multihost_utils.process_allgather(metric_acc, tiled=True)
        )

        has_stats = bool(inner.client_states[0]["batch_stats"])
        sp, ss, ncp, ncs = self.trainer.communicate(
            states["params"], states["batch_stats"] if has_stats else {}
        )
        # pull the aggregated server + refreshed clients to every host
        inner.server = {
            "params": jax.tree.map(jnp.asarray, self._to_host(sp)),
            "batch_stats": jax.tree.map(jnp.asarray, self._to_host(ss))
            if has_stats else {},
        }
        ncp_h = self._to_host(ncp)
        ncs_h = self._to_host(ncs) if has_stats else None
        new_params = unstack_clients(jax.tree.map(jnp.asarray, ncp_h), n)
        new_stats = (
            unstack_clients(jax.tree.map(jnp.asarray, ncs_h), n)
            if has_stats else [{} for _ in range(n)]
        )
        inner.client_states = [
            {"params": p, "batch_stats": s}
            for p, s in zip(new_params, new_stats)
        ]

        # evaluation: my clients' val splits locally, then allgather accs;
        # the target test set only on process 0 (its loader exists everywhere
        # but only rank 0 pays the IO)
        eval_state = inner.server_eval_state()
        val_acc = np.zeros(n)
        for i in self.my_clients:
            _, acc = inner.evaluate(eval_state, inner.clients[i].val)
            val_acc[i] = acc
        from jax.experimental import multihost_utils

        # each host filled only its own clients' entries; the stacked
        # allgather result is (P, n) and summing over hosts reassembles
        gathered = multihost_utils.process_allgather(val_acc, tiled=False)
        val_acc = np.asarray(gathered).reshape(jax.process_count(), n).sum(0)
        val_acc_mean = float(val_acc.mean())

        test_acc = 0.0
        if self.proc == 0:
            _, test_acc = inner.evaluate(eval_state, inner.test_loader)
        test_acc = float(
            np.asarray(
                multihost_utils.process_allgather(
                    np.asarray([test_acc]), tiled=False
                )
            ).sum()
        )

        record = {
            "round": round_idx,
            "val_acc_mean": val_acc_mean,
            "test_acc": test_acc,
            "seconds": time.perf_counter() - t0,
            "train_loss_mean": float(
                (loss / np.maximum(active, 1.0)).mean()
            ),
            "train_acc_mean": float(
                (correct / np.maximum(count, 1.0)).mean()
            ),
        }
        inner.logger.log("round", **record)

        # best-update BEFORE save(latest) — same ordering fix as
        # FederatedRunner.run_round (the latest payload embeds inner.best)
        is_best = val_acc_mean > inner.best["val_acc_mean"]
        if is_best:
            inner.best = {
                "val_acc_mean": val_acc_mean,
                "round": round_idx,
                "test_acc": test_acc,
            }
        if self.proc == 0 and (
            round_idx % cfg.save_freq == 0 or round_idx == cfg.rounds - 1
        ):
            inner.save(round_idx)
        if is_best and self.proc == 0:
            inner.save(round_idx, best=True)
            inner.logger.log("best", **inner.best)
        return record

    def run(self) -> Dict[str, Any]:
        if self.cfg.resume:
            # every process reads the same checkpoint file (shared FS in a
            # real deployment) -> identical resume state everywhere
            self.inner.resume()
        for r in range(self.inner.start_round, self.cfg.rounds):
            self.run_round(r)
        self.inner.logger.log("done", **self.inner.best)
        return dict(self.inner.best)
