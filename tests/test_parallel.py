"""Mesh-parallel paths on the 8-device virtual CPU mesh: client-parallel
federated training and spatially-sharded stylization."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.federated.train_ops import make_train_step
from ccst_tpu.models import vgg
from ccst_tpu.models.classifiers import get_network
from ccst_tpu.parallel.fed_mesh import (
    ParallelFedTrainer,
    make_fed_mesh,
    stack_step_batches,
)
from ccst_tpu.parallel.spatial import make_spatial_mesh, make_spatial_stylize

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_client_states(model, n, seed=0):
    x = jnp.ones((1, 36, 36, 3))
    states = []
    for i in range(n):
        v = model.init(jax.random.PRNGKey(seed), x, train=False)  # same init
        states.append({"params": v["params"], "batch_stats": v.get("batch_stats", {})})
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def batches_for(rng, n_batches, b=4, size=36, classes=4):
    out = []
    for _ in range(n_batches):
        out.append(
            {
                "images": jnp.asarray(rng.random((b, size, size, 3), np.float32)),
                "labels": jnp.asarray(rng.integers(0, classes, b)),
                "mask": jnp.ones((b,), jnp.float32),
            }
        )
    return out


@pytest.mark.parametrize(
    "use_mesh",
    [
        False,
        # the mesh arm is covered in the slow tier (plus
        # test_three_clients_on_eight_devices and the dryrun stages);
        # the fast tier keeps the vmap path (r5 fast-tier trim)
        pytest.param(True, marks=pytest.mark.slow),
    ],
)
def test_parallel_fed_epoch_and_aggregate(rng, use_mesh):
    model = get_network("resnet4", classes=4)
    n_clients = 2
    step = make_train_step(model, n_classes=4, image_size=36, lr=0.05)
    mesh = make_fed_mesh(2, 4) if use_mesh else None
    trainer = ParallelFedTrainer(
        step, "fedavg", jnp.asarray([0.5, 0.5]), mesh=mesh
    )
    states = make_client_states(model, n_clients)
    if mesh is not None:
        states = trainer.shard_states(states)
    server_params = jax.tree.map(lambda x: x[0], states["params"])

    # clients with different epoch lengths: 3 vs 2 batches
    client_batches = [batches_for(rng, 3), batches_for(rng, 2)]
    stacked = stack_step_batches(client_batches, lambda b: b)
    new_states, metrics = trainer.run_epoch(
        states, server_params, stacked, jax.random.PRNGKey(0)
    )
    assert metrics["train_acc"].shape == (2,)
    # params actually moved, for both clients
    for ci in range(2):
        before = np.asarray(states["params"]["conv1"]["kernel"][ci])
        after = np.asarray(new_states["params"]["conv1"]["kernel"][ci])
        assert not np.allclose(before, after)
    # aggregation
    sp, ss, ncp, ncs = trainer.communicate(
        new_states["params"], new_states["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(ncp["conv1"]["kernel"][0]),
        np.asarray(ncp["conv1"]["kernel"][1]),
        rtol=1e-6,
    )


def test_parallel_matches_sequential(rng):
    """vmapped client steps must equal running each client separately."""
    model = get_network("resnet4", classes=4)
    step_fn = make_train_step(model, n_classes=4, image_size=36, lr=0.05)
    step = jax.jit(step_fn)
    states = make_client_states(model, 2)
    server_params = jax.tree.map(lambda x: x[0], states["params"])
    batch_data = batches_for(rng, 1)[0]
    rngs = jax.random.split(jax.random.PRNGKey(7), 2)

    # sequential
    seq_out = []
    for ci in range(2):
        st = jax.tree.map(lambda x: x[ci], states)
        st2, _ = step(st, server_params, batch_data, rngs[ci], jnp.asarray(0))
        seq_out.append(st2)

    # parallel
    trainer = ParallelFedTrainer(step_fn, "fedavg", jnp.asarray([0.5, 0.5]))
    stacked_batch = jax.tree.map(lambda x: jnp.stack([x, x]), batch_data)
    par_states, _ = trainer.step(
        states, server_params, stacked_batch, rngs, jnp.asarray(0)
    )
    for ci in range(2):
        np.testing.assert_allclose(
            np.asarray(par_states["params"]["conv1"]["kernel"][ci]),
            np.asarray(seq_out[ci]["params"]["conv1"]["kernel"]),
            rtol=1e-5,
            atol=1e-6,
        )


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_three_clients_on_eight_devices(rng):
    """The real PACS shape: 3 source clients on an 8-device mesh (client
    axis 1, data axis 8) — and a clear error when the client axis cannot
    tile the stacked client dimension."""
    model = get_network("resnet4", classes=4)
    step = make_train_step(model, n_classes=4, image_size=36, lr=0.05)
    w = jnp.full((3,), 1.0 / 3)

    with pytest.raises(ValueError, match="not divisible"):
        ParallelFedTrainer(step, "fedavg", w, mesh=make_fed_mesh(2, 4))

    trainer = ParallelFedTrainer(step, "fedavg", w, mesh=make_fed_mesh(1, 8))
    states = trainer.shard_states(make_client_states(model, 3))
    server_params = jax.tree.map(lambda x: x[0], states["params"])
    client_batches = [batches_for(rng, 2, b=8), batches_for(rng, 2, b=8),
                      batches_for(rng, 1, b=8)]
    stacked = stack_step_batches(client_batches, lambda b: b)
    new_states, metrics = trainer.run_epoch(
        states, server_params, stacked, jax.random.PRNGKey(0)
    )
    assert metrics["train_loss"].shape == (3,)
    assert np.all(np.isfinite(metrics["train_loss"]))
    sp, ss, ncp, ncs = trainer.communicate(
        new_states["params"], new_states["batch_stats"]
    )
    assert np.all(np.isfinite(np.asarray(sp["conv1"]["kernel"])))


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_masked_steps_are_full_noops_and_excluded_from_loss(rng):
    """A padded (mask all-zero) step must leave params AND batch_stats
    untouched, and must not deflate the reported per-client loss."""
    model = get_network("resnet18", classes=4)  # has batch_stats
    step = jax.jit(make_train_step(model, n_classes=4, image_size=36, lr=0.05))
    x = jnp.ones((1, 36, 36, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    state = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    batch = batches_for(rng, 1)[0]
    masked = {**batch, "mask": jnp.zeros_like(batch["mask"])}
    new_state, m = step(
        state, state["params"], masked, jax.random.PRNGKey(1), jnp.asarray(0)
    )
    assert float(m.active) == 0.0 and float(m.loss) == 0.0
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # short-epoch client: 1 real batch + padding; loss must equal the
    # 1-batch loss, not half of it
    trainer = ParallelFedTrainer(step, "fedavg", jnp.asarray([0.5, 0.5]))
    states = make_client_states(model, 2)
    server_params = jax.tree.map(lambda z: z[0], states["params"])
    client_batches = [batches_for(rng, 2), batches_for(rng, 1)]
    stacked = stack_step_batches(client_batches, lambda b: b)
    _, metrics = trainer.run_epoch(
        states, server_params, stacked, jax.random.PRNGKey(0)
    )
    assert metrics["train_loss"][1] > 0.5  # ~log(4) for 4 classes, not ~half


def test_spatial_sharded_stylize_matches_single_device(rng):
    """H-sharded stylization must be numerically identical to unsharded
    (XLA inserts the halo exchanges)."""
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    images = rng.random((1, 128, 64, 3), dtype=np.float32)
    s_mean = rng.standard_normal(512, dtype=np.float32) * 0.05
    s_std = (rng.random(512, dtype=np.float32) * 0.1 + 0.05).astype(np.float32)

    mesh = make_spatial_mesh(4)
    sharded = make_spatial_stylize(mesh, dtype=jnp.float32)
    out_sharded = np.asarray(sharded(enc, dec, images, s_mean, s_std, 1.0))

    from ccst_tpu.pipeline.stylize import StylizeEngine

    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    out_single = np.asarray(engine.stylize(jnp.asarray(images), s_mean, s_std, 1.0))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("n", [16, 32])
def test_dryrun_multichip_scales(n):
    """VERDICT r4 #7: the full dryrun stage set (fed step + FedAvg, spatial
    halo stylize, DP AdaIN train, TP ResNet-50, uneven 3-client fed) must
    compile and execute on meshes LARGER than the usual 8 — n in {16, 32}.
    The conftest pins this process to 8 virtual devices, so dryrun
    re-provisions the bigger mesh in a subprocess (the same path the driver
    exercises when the backend is pre-initialized)."""
    import sys

    sys.path.insert(0, REPO_ROOT)
    import __graft_entry__ as g

    g.dryrun_multichip(n)


@pytest.mark.slow
def test_spatial_sharded_stylize_512px_height(rng):
    """VERDICT r4 #7: spatial bit-parity at a 512px-SHAPED input — H=512 is
    the production stylize height (64 relu4_1 rows -> 8 rows per shard on
    the full 8-way mesh), not a 16*n toy height. W=128 keeps the CPU-mesh
    FLOPs tractable; the sharded axis geometry (shard size, halo widths at
    every level, ceil-mode pool boundaries) is identical to 512x512 because
    only H is partitioned."""
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    images = rng.random((1, 512, 128, 3), dtype=np.float32)
    s_mean = rng.standard_normal(512, dtype=np.float32) * 0.05
    s_std = (rng.random(512, dtype=np.float32) * 0.1 + 0.05).astype(np.float32)

    mesh = make_spatial_mesh(8)
    sharded = make_spatial_stylize(mesh, dtype=jnp.float32)
    out_sharded = np.asarray(sharded(enc, dec, images, s_mean, s_std, 1.0))

    from ccst_tpu.pipeline.stylize import StylizeEngine

    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    out_single = np.asarray(engine.stylize(jnp.asarray(images), s_mean, s_std, 1.0))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_resnet50_param_sharding_model_axis(rng):
    """Tensor parallelism via GSPMD (parallel/tensor.py): ResNet-50 params
    sharded over the `model` axis of a (data=2, model=4) mesh; forward
    logits and a grad step must match the unsharded computation. This
    retires the reference's hand-split ModelParallelResNet50
    (nets/resnet.py:235-260) with sharding annotations instead of model
    surgery."""
    from ccst_tpu.parallel.tensor import make_dp_tp_mesh, shard_batch, shard_params

    model = get_network("resnet50", classes=4)
    x = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 4, 4))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    def loss_fn(params, x, labels):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1)), logits

    (loss_ref, logits_ref), grads_ref = jax.value_and_grad(
        loss_fn, has_aux=True
    )(variables["params"], x, labels)

    mesh = make_dp_tp_mesh(2, 4)
    params_sh = shard_params(variables["params"], mesh)
    # confirm something is actually model-sharded (conv kernels >=128 cout)
    k = params_sh["layer4_0"]["Conv_2"]["kernel"]
    assert "model" in str(k.sharding.spec), k.sharding
    batch = shard_batch({"x": x, "labels": labels}, mesh)

    (loss_sh, logits_sh), grads_sh = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params_sh, batch["x"], batch["labels"])

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(logits_sh), np.asarray(logits_ref), atol=2e-4
    )
    g1 = np.asarray(grads_sh["conv1"]["kernel"])
    g2 = np.asarray(grads_ref["conv1"]["kernel"])
    np.testing.assert_allclose(g1, g2, atol=2e-4)


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_spatial_stylize_int8_static_bit_matches():
    """The production int8-static executor under H-axis sharding: the
    integer conv paths are exact; the AdaIN content statistic is an f32
    spatial reduction whose order changes under sharding, so the match is
    to f32-reduction tolerance rather than bitwise."""
    import numpy as np

    from ccst_tpu.models import vgg, vgg_fast
    from ccst_tpu.ops.adain import adain_from_stats, alpha_blend
    from ccst_tpu.parallel.spatial import make_spatial_mesh, make_spatial_stylize_q8s

    rng = np.random.default_rng(3)
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    images = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    s_mean = jnp.asarray(rng.standard_normal(512).astype(np.float32) * 0.05)
    s_std = jnp.asarray(rng.random(512).astype(np.float32) * 0.1 + 0.02)
    scales = vgg_fast.calibrate_scales(enc, dec, images, [(s_mean, s_std)])
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    dq = vgg_fast.prepare_decoder_q8s(dec, scales)

    feat = vgg_fast.apply_encoder_q8s(eq, images)
    t = alpha_blend(adain_from_stats(feat, s_mean, s_std), feat,
                    jnp.asarray(1.0, feat.dtype))
    want = np.asarray(vgg_fast.apply_decoder_q8s(dq, t), np.float32)

    # 4-way: at 64px the relu4_1 height is 8 — an 8-way shard leaves 1 row
    # per device and trips an XLA SPMD halo-pad type bug for int8 convs
    # (pad(s8, f32 constant)); >=2 rows per shard partitions cleanly, which
    # production sizes satisfy at 8-way (512px -> 64 rows at relu4_1)
    mesh = make_spatial_mesh(4)
    run = make_spatial_stylize_q8s(mesh, eq, dq)
    got = np.asarray(run(images, s_mean, s_std))
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_batch_stylize_int8_static_bit_matches():
    """Data-parallel (batch-sharded) int8 stylize: no cross-shard math, so
    the 8-way result is BIT-identical to the single device."""
    import numpy as np

    from ccst_tpu.models import vgg, vgg_fast
    from ccst_tpu.ops.adain import adain_from_stats, alpha_blend
    from ccst_tpu.parallel.spatial import make_batch_stylize_q8s, make_spatial_mesh

    rng = np.random.default_rng(5)
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    images = jnp.asarray(rng.random((8, 32, 32, 3), np.float32))
    s_mean = jnp.asarray(rng.standard_normal(512).astype(np.float32) * 0.05)
    s_std = jnp.asarray(rng.random(512).astype(np.float32) * 0.1 + 0.02)
    scales = vgg_fast.calibrate_scales(enc, dec, images, [(s_mean, s_std)])
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    dq = vgg_fast.prepare_decoder_q8s(dec, scales)

    feat = vgg_fast.apply_encoder_q8s(eq, images)
    t = alpha_blend(adain_from_stats(feat, s_mean, s_std), feat,
                    jnp.asarray(1.0, feat.dtype))
    want = np.asarray(vgg_fast.apply_decoder_q8s(dq, t), np.float32)

    run = make_batch_stylize_q8s(make_spatial_mesh(8), eq, dq)
    got = np.asarray(run(images, s_mean, s_std))
    np.testing.assert_array_equal(got, want)
