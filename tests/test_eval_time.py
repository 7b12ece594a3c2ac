"""Eval-time subsystems: Tent adaptation, IN-test, SWA/AutoSWA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.federated.tent import (
    bn_param_mask,
    entropy_loss,
    make_tent_step,
)
from ccst_tpu.models.classifiers import get_network
from ccst_tpu.utils.swa import (
    IIDMax,
    LossValley,
    SWAState,
    swa_init,
    swa_lr_schedule,
    swa_merge,
    swa_update,
)


def small_state(seed=0, classes=4):
    model = get_network("resnet4", classes=classes)
    x = jnp.ones((1, 36, 36, 3))
    v = model.init(jax.random.PRNGKey(seed), x, train=False)
    return model, {"params": v["params"], "batch_stats": v.get("batch_stats", {})}


def test_tent_updates_only_bn_affine(rng):
    model, state = small_state()
    step = jax.jit(make_tent_step(model, image_size=36, lr=0.1))
    batch = {
        "images": jnp.asarray(rng.random((4, 36, 36, 3), np.float32)),
        "labels": jnp.asarray(rng.integers(0, 4, 4)),
        "mask": jnp.ones((4,), jnp.float32),
    }
    new_state, correct, count = step(state, batch)
    # BN affine moved
    assert not np.allclose(
        np.asarray(state["params"]["bn1"]["scale"]),
        np.asarray(new_state["params"]["bn1"]["scale"]),
    )
    # conv kernels untouched
    np.testing.assert_array_equal(
        np.asarray(state["params"]["conv1"]["kernel"]),
        np.asarray(new_state["params"]["conv1"]["kernel"]),
    )
    assert float(count) == 4.0


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_tent_reduces_entropy(rng):
    model, state = small_state()
    step = jax.jit(make_tent_step(model, image_size=36, lr=0.05))
    batch = {
        "images": jnp.asarray(rng.random((8, 36, 36, 3), np.float32)),
        "labels": jnp.asarray(rng.integers(0, 4, 8)),
        "mask": jnp.ones((8,), jnp.float32),
    }

    def ent(s):
        logits = model.apply(
            {"params": s["params"], "batch_stats": s["batch_stats"]},
            jnp.asarray(batch["images"]), train=False,
        )
        from ccst_tpu.ops.image import eval_transform
        logits = model.apply(
            {"params": s["params"], "batch_stats": s["batch_stats"]},
            eval_transform(batch["images"], 36), train=False,
        )
        return float(entropy_loss(logits, batch["mask"]))

    e0 = ent(state)
    for _ in range(10):
        state, _, _ = step(state, batch)
    e1 = ent(state)
    assert e1 < e0


def test_bn_param_mask():
    _, state = small_state()
    mask = bn_param_mask(state["params"])
    assert float(mask["bn1"]["scale"]) == 1.0
    assert float(mask["conv1"]["kernel"]) == 0.0
    assert float(mask["class_classifier"]["kernel"]) == 0.0


def test_in_test_eval_runs(rng):
    """IN-test: same params evaluated under an InstanceNorm model."""
    model, state = small_state()
    in_model = model.clone(norm="in")
    x = jnp.asarray(rng.random((2, 36, 36, 3), np.float32))
    out = in_model.apply({"params": state["params"]}, x, train=False)
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# SWA
# ---------------------------------------------------------------------------


def tree_of(v):
    return {"w": jnp.asarray([float(v)])}


def test_swa_running_mean():
    s = swa_init(tree_of(1.0), step=0)
    s = swa_update(s, tree_of(3.0), step=1)
    np.testing.assert_allclose(np.asarray(s.avg_params["w"]), [2.0])
    s = swa_update(s, tree_of(5.0), step=2)
    np.testing.assert_allclose(np.asarray(s.avg_params["w"]), [3.0])
    assert s.n_averaged == 3 and s.end_step == 2


def test_swa_merge_weighted():
    a = swa_init(tree_of(1.0))
    a = swa_update(a, tree_of(1.0))         # n=2, mean 1
    b = swa_init(tree_of(4.0))              # n=1, mean 4
    m = swa_merge(a, b)
    np.testing.assert_allclose(np.asarray(m.avg_params["w"]), [2.0])
    assert m.n_averaged == 3


def test_swa_lr_schedule():
    lr = swa_lr_schedule(0.1, 0.01, 10)
    assert lr(0) == pytest.approx(0.1)
    assert lr(5) == pytest.approx(0.055)
    assert lr(10) == pytest.approx(0.01)
    assert lr(100) == pytest.approx(0.01)


def test_loss_valley_converges_and_averages():
    lv = LossValley(n_converge=3, n_tolerance=3, tolerance_ratio=0.5)
    losses = [1.0, 0.8, 0.9, 0.85, 0.82, 0.84]
    for i, l in enumerate(losses):
        seg = swa_init(tree_of(float(i)), step=i)
        seg.end_step = i
        lv.update(seg, l)
    # min at idx0 of some window triggers convergence eventually
    final = lv.get_final()
    assert final is not None
    assert final.n_averaged >= 1


def test_loss_valley_dead_valley():
    lv = LossValley(n_converge=2, n_tolerance=2, tolerance_ratio=0.1)
    # decreasing then exploding loss -> valley dies
    for i, l in enumerate([0.5, 0.6, 5.0, 6.0, 7.0]):
        seg = swa_init(tree_of(float(i)), step=i)
        seg.end_step = i
        lv.update(seg, l)
    assert lv.is_converged
    assert lv.dead_valley


def test_iidmax_policy():
    pol = IIDMax()
    accs = [0.5, 0.7, 0.6]
    for i, a in enumerate(accs):
        pol.update(tree_of(float(i)), a, lambda p: float(np.asarray(p["w"])[0]) / 10, i)
    final = pol.get_final()
    assert final is not None


def test_tent_drivers(rng, tmp_path):
    """The two reference tent entry points (fed_run.py:261-347): whole-stream
    multi-epoch adaptation (`tent_test`, CLI `fed-test --tent`) and K-steps-
    per-batch on-the-fly scoring (`tent_test_on_the_fly`)."""
    from ccst_tpu.data.loader import Batch
    from ccst_tpu.federated.tent import tent_test, tent_test_on_the_fly
    from ccst_tpu.utils.metrics import MetricsLogger

    model, state = small_state()

    class FakeLoader:
        """Two fixed batches, the second partially padded."""

        def __iter__(self):
            r = np.random.default_rng(5)
            for valid in (4, 3):
                yield Batch(
                    images=r.random((4, 36, 36, 3), np.float32),
                    labels=r.integers(0, 4, 4).astype(np.int64),
                    valid=valid,
                    paths=[""] * 4,
                )

    log_path = str(tmp_path / "tent.jsonl")
    logger = MetricsLogger(log_path, echo=False)
    new_state, acc = tent_test(
        model, state, FakeLoader(), image_size=36, lr=0.05, epochs=2,
        logger=logger,
    )
    assert 0.0 <= acc <= 1.0
    # adaptation really happened (BN affine moved) but convs are frozen
    assert not np.allclose(
        np.asarray(state["params"]["bn1"]["scale"]),
        np.asarray(new_state["params"]["bn1"]["scale"]),
    )
    np.testing.assert_array_equal(
        np.asarray(state["params"]["conv1"]["kernel"]),
        np.asarray(new_state["params"]["conv1"]["kernel"]),
    )

    acc_fly = tent_test_on_the_fly(
        model, state, FakeLoader(), image_size=36, lr=0.05,
        steps_per_batch=2, logger=logger,
    )
    logger.close()
    assert 0.0 <= acc_fly <= 1.0
    lines = open(log_path).read()
    assert "tent_epoch" in lines and "tent_on_the_fly" in lines


def test_swa_update_bn(rng):
    """swa_utils.update_bn counterpart: streaming the data once replaces the
    EMA running stats with plain batch-mean statistics of the given params."""
    from ccst_tpu.data.loader import Batch
    from ccst_tpu.utils.swa import swa_update_bn

    model, state = small_state()

    class OneBatch:
        def __iter__(self):
            r = np.random.default_rng(3)
            yield Batch(
                images=r.random((8, 36, 36, 3), np.float32),
                labels=r.integers(0, 4, 8).astype(np.int64),
                valid=8,
                paths=[""] * 8,
            )

    fresh = swa_update_bn(model, state["params"], OneBatch(), image_size=36)
    assert set(fresh) == set(state["batch_stats"])
    # stats moved away from the init (zero-mean/unit-var) toward the data
    assert not np.allclose(
        np.asarray(fresh["bn1"]["mean"]),
        np.asarray(state["batch_stats"]["bn1"]["mean"]),
    )
    for leaf in jax.tree.leaves(fresh):
        assert np.all(np.isfinite(np.asarray(leaf)))
