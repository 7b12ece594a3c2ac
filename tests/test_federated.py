"""Federated runtime: aggregation semantics, DG-method train steps, and a
mini end-to-end run with checkpoint/resume and best-model selection."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-scale; dev fast tier: -m 'not slow'

from ccst_tpu.config import FedConfig
from ccst_tpu.data.lists import write_list
from ccst_tpu.data.loader import save_image_u8
from ccst_tpu.federated.aggregate import (
    aggregate,
    is_bn_path,
    stack_clients,
    unstack_clients,
)
from ccst_tpu.federated.runtime import FederatedRunner
from ccst_tpu.federated.train_ops import make_train_step
from ccst_tpu.models.classifiers import get_network
from ccst_tpu.utils.metrics import summarize_run

DOMAINS = ["art_painting", "cartoon", "photo", "sketch"]


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


def make_states(n=3, seed=0):
    model = get_network("resnet4", classes=4)
    x = jnp.ones((1, 36, 36, 3))
    states = []
    for i in range(n):
        v = model.init(jax.random.PRNGKey(seed + i), x, train=False)
        states.append({"params": v["params"], "batch_stats": v["batch_stats"]})
    return model, states


def test_fedavg_aggregation_weighted_mean_and_broadcast():
    _, states = make_states(3)
    cp = stack_clients([s["params"] for s in states])
    cs = stack_clients([s["batch_stats"] for s in states])
    w = jnp.asarray([0.5, 0.3, 0.2])
    sp, ss, ncp, ncs = aggregate("fedavg", cp, cs, w)

    # server = weighted mean of a sample leaf
    leaf = lambda t: t["conv1"]["kernel"]
    expect = sum(float(wi) * np.asarray(leaf(s["params"])) for wi, s in zip(w, states))
    np.testing.assert_allclose(np.asarray(leaf(sp)), expect, rtol=1e-5)
    # all clients got the server weights
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(leaf(ncp))[i], np.asarray(leaf(sp)), rtol=1e-6
        )


def test_fedbn_keeps_client_bn_local():
    _, states = make_states(2)
    cp = stack_clients([s["params"] for s in states])
    cs = stack_clients([s["batch_stats"] for s in states])
    w = jnp.asarray([0.5, 0.5])
    sp, ss, ncp, ncs = aggregate("fedbn", cp, cs, w)

    # non-BN leaves broadcast from server
    np.testing.assert_allclose(
        np.asarray(ncp["conv1"]["kernel"][0]),
        np.asarray(ncp["conv1"]["kernel"][1]),
        rtol=1e-6,
    )
    # BN scale stays per-client (bn1 init is identical 1.0, so perturb
    # client 0's bn scale first)
    bn_scale = np.asarray(cp["bn1"]["scale"]).copy()
    bn_scale[0] += 0.5
    cp = {**cp, "bn1": {**cp["bn1"], "scale": jnp.asarray(bn_scale)}}
    sp, ss, ncp, ncs = aggregate("fedbn", cp, cs, w)
    assert not np.allclose(
        np.asarray(ncp["bn1"]["scale"][0]), np.asarray(ncp["bn1"]["scale"][1])
    )
    # batch_stats untouched (stay local)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ncs)[0]), np.asarray(jax.tree.leaves(cs)[0])
    )


def test_is_bn_path_predicate():
    import dataclasses

    Key = jax.tree_util.DictKey
    assert is_bn_path((Key("bn1"), Key("scale")))
    assert is_bn_path((Key("layer1_0"), Key("BatchNorm_0"), Key("bias")))
    assert not is_bn_path((Key("conv1"), Key("kernel")))
    assert not is_bn_path((Key("class_classifier"), Key("kernel")))


def test_every_zoo_model_bn_matches_fedbn_selector():
    """Every registry model's BatchNorm modules must be recognized by
    is_bn_path, or fedbn silently degrades to fedavg for that network
    (regression: AlexNet's BNs were flax-auto-named TorchBatchNorm_N,
    which the selector did not match). Module names are shared between
    the params and batch_stats trees, so checking the batch_stats paths
    (every one of which belongs to a norm layer by construction) covers
    the params selection too."""
    for name, size in [
        ("alexnet", 63), ("DigitModel", 28), ("resnet18", 36), ("resnet50", 36),
    ]:
        model = get_network(name, classes=4)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
        )
        leaves = jax.tree_util.tree_flatten_with_path(
            variables["batch_stats"]
        )[0]
        assert leaves, name
        for path, _ in leaves:
            assert is_bn_path(path), (name, path)


# ---------------------------------------------------------------------------
# train steps per DG method
# ---------------------------------------------------------------------------


def make_batch(rng, n=4, size=36, classes=4):
    return {
        "images": jnp.asarray(rng.random((n, size, size, 3), np.float32)),
        "labels": jnp.asarray(rng.integers(0, classes, n)),
        "mask": jnp.ones((n,), jnp.float32),
    }


@pytest.mark.parametrize("dg", ["no_DG", "RSC", "Jigsaw", "MixStyle"])
def test_train_step_updates_params(dg, rng):
    model = get_network("resnet4", classes=4, dg_method=dg)
    x = jnp.ones((1, 36, 36, 3))
    init_rngs = {"params": jax.random.PRNGKey(0)}
    if dg == "MixStyle":
        init_rngs["mixstyle"] = jax.random.PRNGKey(1)
    v = model.init(init_rngs, x, train=False)
    state = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    step = jax.jit(
        make_train_step(
            model, n_classes=4, image_size=36, lr=0.05, dg_method=dg
        )
    )
    batch = make_batch(rng)
    new_state, m = step(state, state["params"], batch, jax.random.PRNGKey(2), jnp.asarray(0))
    assert np.isfinite(float(m.loss))
    assert 0 <= float(m.correct) <= 4
    before = np.asarray(state["params"]["conv1"]["kernel"])
    after = np.asarray(new_state["params"]["conv1"]["kernel"])
    assert not np.allclose(before, after)


def test_train_step_feddg(rng):
    model = get_network("resnet4", classes=4)
    x = jnp.ones((1, 36, 36, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    state = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    step = jax.jit(
        make_train_step(
            model, n_classes=4, image_size=36, lr=0.05, dg_method="feddg",
            meta_step_size=1e-2,
        )
    )
    batch = make_batch(rng)
    batch["amp_bank"] = jnp.asarray(
        np.abs(np.fft.fft2(rng.random((5, 3, 36, 36)), axes=(-2, -1))), jnp.float32
    )
    new_state, m = step(state, state["params"], batch, jax.random.PRNGKey(2), jnp.asarray(0))
    assert np.isfinite(float(m.loss))
    assert not np.allclose(
        np.asarray(state["params"]["conv1"]["kernel"]),
        np.asarray(new_state["params"]["conv1"]["kernel"]),
    )


def test_fedprox_penalty_active_after_step0(rng):
    model = get_network("resnet4", classes=4)
    x = jnp.ones((1, 36, 36, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    state = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    step = jax.jit(
        make_train_step(
            model, n_classes=4, image_size=36, lr=0.0, dg_method="no_DG",
            mode="fedprox", mu=1000.0,
        )
    )
    # far-away server weights => huge prox term at step>0, none at step 0
    far_server = jax.tree.map(lambda p: p + 1.0, state["params"])
    batch = make_batch(rng)
    _, m0 = step(state, far_server, batch, jax.random.PRNGKey(1), jnp.asarray(0))
    _, m1 = step(state, far_server, batch, jax.random.PRNGKey(1), jnp.asarray(1))
    assert float(m1.loss) > float(m0.loss) + 100.0


def test_padded_batch_is_noop(rng):
    model = get_network("resnet4", classes=4)
    x = jnp.ones((1, 36, 36, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    state = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    step = jax.jit(make_train_step(model, n_classes=4, image_size=36, lr=0.1))
    batch = make_batch(rng)
    batch["mask"] = jnp.zeros((4,), jnp.float32)
    new_state, m = step(state, state["params"], batch, jax.random.PRNGKey(1), jnp.asarray(0))
    np.testing.assert_allclose(
        np.asarray(state["params"]["conv1"]["kernel"]),
        np.asarray(new_state["params"]["conv1"]["kernel"]),
    )
    assert float(m.count) == 0.0


# ---------------------------------------------------------------------------
# end-to-end mini run
# ---------------------------------------------------------------------------


@pytest.fixture
def fed_dataset(tmp_path, rng):
    root = str(tmp_path)
    for d in DOMAINS:
        names, labels = [], []
        for ci, cls in enumerate(["dog", "horse"]):
            for i in range(6):
                rel = f"PACS/kfold/{d}/{cls}/img{i}.png"
                # classes differ by mean brightness so tiny training can learn
                base = 0.25 if ci == 0 else 0.75
                img = np.clip(
                    rng.normal(base, 0.08, (36, 36, 3)), 0, 1
                ).astype(np.float32)
                save_image_u8(img, os.path.join(root, rel))
                names.append(rel)
                labels.append(ci)
        write_list(os.path.join(root, "txt_lists", "pacs", f"{d}_train.txt"), names, labels)
        write_list(
            os.path.join(root, "txt_lists", "pacs", f"{d}_test.txt"),
            names[:4],
            labels[:4],
        )
    return root


def small_fed_cfg(root, **kw):
    defaults = dict(
        dataset="pacs",
        target="photo",
        mode="fedavg",
        network="resnet4",
        rounds=2,
        lr=0.05,
        batch_size=4,
        image_size=36,
        val_size=0.25,
        seed=1,
        data_root=root,
        list_root=root,
        save_path=os.path.join(root, "ckpt"),
        log_path=os.path.join(root, "logs"),
        save_freq=1,
    )
    defaults.update(kw)
    cfg = FedConfig(**defaults)
    return cfg


def patched_classes(monkeypatch):
    # resnet4 with 2 classes for the tiny dataset
    pass


def test_federated_end_to_end_fedavg(fed_dataset, monkeypatch):
    import ccst_tpu.config as cc

    cfg = small_fed_cfg(fed_dataset)
    monkeypatch.setitem(
        cc.DATASETS, "pacs", cc.DATASETS["pacs"].__class__(
            name="pacs", domains=cc.DATASETS["pacs"].domains, num_classes=2,
            image_size=36, stylize_size=64,
        )
    )
    runner = FederatedRunner(cfg)
    assert runner.client_names == ["art_painting", "cartoon", "sketch"]
    result = runner.run()
    assert result["round"] >= 0
    assert 0.0 <= result["test_acc"] <= 1.0
    # checkpoints written
    assert os.path.exists(runner.ckpt["latest"])
    assert os.path.exists(runner.ckpt["best"])
    # metrics stream summarizable (read_log equivalent)
    log_path = os.path.join(cfg.log_path, runner.run_name + ".jsonl")
    summary = summarize_run(log_path, expected_rounds=cfg.rounds)
    assert summary["complete"]
    assert summary["rounds_seen"] == 2
    assert summary["test_acc_at_best_val"] is not None


def test_federated_resume(fed_dataset, monkeypatch):
    import ccst_tpu.config as cc

    monkeypatch.setitem(
        cc.DATASETS, "pacs", cc.DATASETS["pacs"].__class__(
            name="pacs", domains=cc.DATASETS["pacs"].domains, num_classes=2,
            image_size=36, stylize_size=64,
        )
    )
    cfg = small_fed_cfg(fed_dataset, rounds=1)
    runner = FederatedRunner(cfg)
    runner.run()
    cfg2 = small_fed_cfg(fed_dataset, rounds=3, resume=True)
    runner2 = FederatedRunner(cfg2)
    runner2.resume()
    assert runner2.start_round == 1
    # the best-so-far record survives the restart: without it, the first
    # post-resume round overwrote the best checkpoint unconditionally
    assert runner2.best == runner.best
    assert runner2.best["val_acc_mean"] > -1.0
    # test-only path
    acc = runner.test_only("best")
    assert 0.0 <= acc <= 1.0


def test_federated_fedbn_mode(fed_dataset, monkeypatch):
    import ccst_tpu.config as cc

    monkeypatch.setitem(
        cc.DATASETS, "pacs", cc.DATASETS["pacs"].__class__(
            name="pacs", domains=cc.DATASETS["pacs"].domains, num_classes=2,
            image_size=36, stylize_size=64,
        )
    )
    cfg = small_fed_cfg(fed_dataset, mode="fedbn", rounds=1)
    runner = FederatedRunner(cfg)
    runner.run_round(0)
    # client BN scales may diverge; non-BN must be identical across clients
    k0 = np.asarray(runner.client_states[0]["params"]["conv1"]["kernel"])
    k1 = np.asarray(runner.client_states[1]["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(k0, k1, rtol=1e-6)


def test_federated_parallel_clients(fed_dataset, monkeypatch):
    """parallel_clients=True: one vmapped step for all clients, same API."""
    import ccst_tpu.config as cc

    monkeypatch.setitem(
        cc.DATASETS, "pacs", cc.DATASETS["pacs"].__class__(
            name="pacs", domains=cc.DATASETS["pacs"].domains, num_classes=2,
            image_size=36, stylize_size=64,
        )
    )
    cfg = small_fed_cfg(fed_dataset, rounds=2, parallel_clients=True)
    runner = FederatedRunner(cfg)
    result = runner.run()
    assert 0.0 <= result["test_acc"] <= 1.0
    rec_keys = [c.name for c in runner.clients]
    assert set(rec_keys) == {"art_painting", "cartoon", "sketch"}
    # client states were refreshed from the server (fedavg broadcast)
    k0 = np.asarray(runner.client_states[0]["params"]["conv1"]["kernel"])
    k1 = np.asarray(runner.client_states[1]["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(k0, k1, rtol=1e-6)


def test_federated_parallel_on_mesh(fed_dataset, monkeypatch):
    """parallel clients sharded over a (client=1, data=2) mesh."""
    import ccst_tpu.config as cc

    monkeypatch.setitem(
        cc.DATASETS, "pacs", cc.DATASETS["pacs"].__class__(
            name="pacs", domains=cc.DATASETS["pacs"].domains, num_classes=2,
            image_size=36, stylize_size=64,
        )
    )
    cfg = small_fed_cfg(
        fed_dataset, rounds=1, parallel_clients=True,
        client_shards=3, data_shards=2, batch_size=4,
    )
    runner = FederatedRunner(cfg)
    rec = runner.run_round(0)
    assert np.isfinite(rec["val_acc_mean"])


def test_federated_deepall(fed_dataset, monkeypatch):
    import ccst_tpu.config as cc

    monkeypatch.setitem(
        cc.DATASETS, "pacs", cc.DATASETS["pacs"].__class__(
            name="pacs", domains=cc.DATASETS["pacs"].domains, num_classes=2,
            image_size=36, stylize_size=64,
        )
    )
    cfg = small_fed_cfg(fed_dataset, mode="deepall", rounds=1)
    runner = FederatedRunner(cfg)
    assert runner.n_clients == 1
    assert runner.clients[0].name == "deepall"
    assert runner.clients[0].n_train == 3 * 9  # 3 domains x 12*0.75 train
    rec = runner.run_round(0)
    assert "train_acc/deepall" in rec


def test_masked_percentile_matches_unpadded(rng):
    """RSC's batch-level threshold must come from the REAL rows only: the
    static-shape masked percentile equals jnp.percentile on the valid
    subset for every partial-batch size."""
    from ccst_tpu.federated.train_ops import _masked_percentile

    x = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    for n_valid in (1, 2, 3, 5, 8):
        mask = jnp.asarray((np.arange(8) < n_valid).astype(np.float32))
        got = _masked_percentile(x, mask, (1 - 1 / 3) * 100)
        want = jnp.percentile(x[:n_valid], (1 - 1 / 3) * 100)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6,
            err_msg=f"n_valid={n_valid}",
        )


def test_rsc_percentile_ignores_padding(rng):
    """The RSC step's sample-unmute decisions for real rows are identical
    whether or not padding rows are present."""
    from ccst_tpu.federated.train_ops import _rsc_logits

    model = get_network("resnet4", classes=4)
    x_real = rng.random((3, 36, 36, 3)).astype(np.float32)
    y_real = rng.integers(0, 4, 3).astype(np.int64)
    v = model.init(jax.random.PRNGKey(0), jnp.ones((1, 36, 36, 3)), train=False)
    state = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}

    # padded batch: repeat-pad (the loader contract) + valid mask
    x_pad = np.concatenate([x_real, x_real[:1]])
    y_pad = np.concatenate([y_real, y_real[:1]])
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])

    logits_unpadded, _ = _rsc_logits(
        model, state, state["params"], jnp.asarray(x_real),
        jnp.asarray(y_real), 4, mask_valid=jnp.ones((3,)),
    )
    logits_padded, _ = _rsc_logits(
        model, state, state["params"], jnp.asarray(x_pad),
        jnp.asarray(y_pad), 4, mask_valid=mask,
    )
    # resnet4 has BatchNorm: batch stats differ between a 3-row and a
    # repeat-padded 4-row batch (weighted resample), so compare the MUTING
    # decision, not raw logits: with identical per-row features the sample
    # threshold must select the same real rows. Use a statfree check via
    # tolerance: decisions agree when logits are close.
    np.testing.assert_allclose(
        np.asarray(logits_padded[:3]), np.asarray(logits_unpadded),
        rtol=0.15, atol=0.15,
    )
