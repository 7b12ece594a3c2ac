"""Golden-value regression anchors.

These pin the exact fp32 numerics of the stylize path under fixed seeds so
future optimization rounds (kernel swaps, fusion rewrites) can prove they
did not drift. The goldens are generated once and committed
(tests/goldens/*.npz); regenerate ONLY when an intentional numeric change is
made, with the reason recorded here.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _stylize_fixture():
    from ccst_tpu.models import vgg
    from ccst_tpu.pipeline.stylize import StylizeEngine

    enc = vgg.init_params(jax.random.PRNGKey(42), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(43), vgg.DECODER_ARCH)
    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    rng = np.random.default_rng(1234)
    images = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    s_mean = rng.standard_normal(512).astype(np.float32) * 0.05
    s_std = (rng.random(512).astype(np.float32) * 0.1 + 0.02).astype(np.float32)
    return engine, images, s_mean, s_std


def test_stylize_golden():
    engine, images, s_mean, s_std = _stylize_fixture()
    out = np.asarray(engine.stylize(images, s_mean, s_std, 0.8))
    path = os.path.join(GOLDEN_DIR, "stylize_32px.npz")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, out=out)
        pytest.skip("golden generated; rerun to compare")
    golden = np.load(path)["out"]
    # CPU vs CPU must be near-exact; tolerate platform ulp differences
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-6)


def test_style_bank_golden(rng):
    from ccst_tpu.models import vgg
    from ccst_tpu.pipeline.style_bank import make_bank_step
    from ccst_tpu.ops.welford import welford_finalize, welford_init

    enc = vgg.init_params(jax.random.PRNGKey(42), vgg.ENCODER_ARCH)
    data = np.random.default_rng(99).random((4, 32, 32, 3)).astype(np.float32)
    step = make_bank_step(enc, dtype=jnp.float32)
    state = step(welford_init(512), jnp.asarray(data), jnp.asarray(4))
    mean, std = welford_finalize(state)
    out = np.stack([np.asarray(mean), np.asarray(std)])
    path = os.path.join(GOLDEN_DIR, "style_bank_32px.npz")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, out=out)
        pytest.skip("golden generated; rerun to compare")
    golden = np.load(path)["out"]
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-6)


def test_stylize_golden_production_shape():
    """Production-shaped anchor: 512px, bfloat16 compute (the bench/pipeline
    configuration). bf16 rounding is deterministic per platform but not
    across platforms, so the comparison allows bf16-scale tolerance while
    still catching any semantic drift (a wrong pad/pool/fusion moves pixels
    by orders of magnitude more than 1 ulp)."""
    from ccst_tpu.models import vgg
    from ccst_tpu.pipeline.stylize import StylizeEngine

    enc = vgg.init_params(jax.random.PRNGKey(42), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(43), vgg.DECODER_ARCH)
    engine = StylizeEngine(enc, dec, dtype=jnp.bfloat16)
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.random((1, 512, 512, 3), np.float32))
    s_mean = rng.standard_normal(512).astype(np.float32) * 0.05
    s_std = (rng.random(512).astype(np.float32) * 0.1 + 0.02).astype(np.float32)
    out = np.asarray(engine.stylize(images, s_mean, s_std, 1.0))
    assert out.shape == (1, 512, 512, 3)
    path = os.path.join(GOLDEN_DIR, "stylize_512px_bf16.npz")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, out=out.astype(np.float16))
        pytest.skip("golden generated; rerun to compare")
    golden = np.load(path)["out"].astype(np.float32)
    span = float(golden.max() - golden.min()) or 1.0
    err = np.abs(out - golden)
    assert err.mean() / span < 2e-3, f"mean drift {err.mean()/span:.2e}"
    assert np.quantile(err, 0.999) / span < 2e-2


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_stylize_golden_int8_static():
    """Drift anchor for the quantized engine: int8-static at 64px with
    fixed weights/scales. The int8 path is integer-deterministic (int32
    conv accumulation + f32 epilogue + rint), so this is compared tightly;
    the fused Pallas engine must match it bit for bit."""
    from ccst_tpu.models import vgg, vgg_fast

    enc = vgg.init_params(jax.random.PRNGKey(42), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(43), vgg.DECODER_ARCH)
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    s_mean = jnp.asarray(rng.standard_normal(512).astype(np.float32) * 0.05)
    s_std = jnp.asarray(rng.random(512).astype(np.float32) * 0.1 + 0.02)
    scales = vgg_fast.calibrate_scales(enc, dec, images, [(s_mean, s_std)])
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    dq = vgg_fast.prepare_decoder_q8s(dec, scales)
    from ccst_tpu.ops.adain import adain_from_stats

    feat = vgg_fast.apply_encoder_q8s(eq, images)
    out = np.asarray(
        vgg_fast.apply_decoder_q8s(dq, adain_from_stats(feat, s_mean, s_std)),
        np.float32,
    )
    # fused engine == unfused, bit for bit
    featf = vgg_fast.apply_encoder_q8s_fused(eq, images)
    outf = np.asarray(
        vgg_fast.apply_decoder_q8s_fused(dq, adain_from_stats(featf, s_mean, s_std)),
        np.float32,
    )
    np.testing.assert_array_equal(out, outf)

    path = os.path.join(GOLDEN_DIR, "stylize_64px_int8_static.npz")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, out=out.astype(np.float16))
        pytest.skip("golden generated; rerun to compare")
    golden = np.load(path)["out"].astype(np.float32)
    span = float(golden.max() - golden.min()) or 1.0
    err = np.abs(out - golden)
    assert err.mean() / span < 2e-3, f"mean drift {err.mean()/span:.2e}"
