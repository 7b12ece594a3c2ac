"""Parity tests for the packed / int8 execution engines (models/vgg_fast.py).

The packed bf16 engine must match the reference executor exactly (same
arithmetic, different schedule); the int8 engine is a quantized
approximation bounded by PSNR.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.models import vgg, vgg_fast
from ccst_tpu.ops.adain import adain_from_stats


@pytest.fixture(scope="module")
def enc_dec():
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    return enc, dec


@pytest.fixture(scope="module")
def images(enc_dec):
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.random((2, 32, 48, 3), np.float32))


def test_packed_kernel_reflect_equivalence(rng):
    """Edge-pad on the packed plane == reflect-pad on the original plane."""
    x = jnp.asarray(rng.random((1, 16, 12, 5), np.float32) - 0.5)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(7).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"),
        w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    ref = jnp.maximum(ref, 0.0)
    K = jnp.asarray(vgg_fast.make_packed_kernel(w))
    out = vgg_fast.packed_reflect_conv(vgg_fast.pack_s2d(x), K, b)
    np.testing.assert_allclose(
        np.asarray(vgg_fast.unpack_d2s(out, 7)), np.asarray(ref), atol=1e-5
    )


def test_packed_encoder_exact(enc_dec, images):
    enc, _ = enc_dec
    want = vgg.apply_encoder(enc, images)
    prep = vgg_fast.prepare_encoder(enc)
    got = vgg_fast.apply_encoder_packed(prep, images, dtype=jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_decoder_exact(enc_dec, images):
    enc, dec = enc_dec
    feat = vgg.apply_encoder(enc, images)
    want = vgg.apply_decoder(dec, feat)
    prep = vgg_fast.prepare_decoder(dec)
    got = vgg_fast.apply_decoder_packed(prep, feat, dtype=jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_rejects_odd_sizes(enc_dec):
    enc, _ = enc_dec
    prep = vgg_fast.prepare_encoder(enc)
    with pytest.raises(ValueError, match="even"):
        vgg_fast.apply_encoder_packed(
            prep, jnp.zeros((1, 33, 32, 3)), dtype=jnp.float32
        )


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_int8_static_scale_stylize_quality(enc_dec, images):
    """int8-e2e engine (static calibrated scales): quality must be in the
    same band as the dynamic-scale engine."""
    enc, dec = enc_dec
    s_mean = jnp.asarray(np.random.default_rng(3).standard_normal(512) * 0.1,
                         jnp.float32)
    s_std = jnp.asarray(np.random.default_rng(4).random(512) + 0.5, jnp.float32)

    feat = vgg.apply_encoder(enc, images)
    want = vgg.apply_decoder(dec, adain_from_stats(feat, s_mean, s_std))

    scales = vgg_fast.calibrate_scales(enc, dec, images, [(s_mean, s_std)])
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    dq = vgg_fast.prepare_decoder_q8s(dec, scales)
    featq = vgg_fast.apply_encoder_q8s(eq, images, dtype=jnp.float32)
    got = vgg_fast.apply_decoder_q8s(
        dq, adain_from_stats(featq, s_mean, s_std), dtype=jnp.float32
    )
    assert got.shape == want.shape
    err = np.asarray(got, np.float32) - np.asarray(want, np.float32)
    span = float(np.asarray(want).max() - np.asarray(want).min()) or 1.0
    psnr = 10 * np.log10(span**2 / float(np.mean(err**2)))
    assert psnr > 20.0, f"int8-e2e stylize PSNR {psnr:.1f} dB too low"


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_int8_stylize_quality(enc_dec, images):
    """Full int8 stylize tracks the fp32 path (coarse bound: quantization
    noise, not correctness drift — exact parity belongs to the bf16 engines)."""
    enc, dec = enc_dec
    s_mean = jnp.asarray(np.random.default_rng(3).standard_normal(512) * 0.1,
                         jnp.float32)
    s_std = jnp.asarray(np.random.default_rng(4).random(512) + 0.5, jnp.float32)

    feat = vgg.apply_encoder(enc, images)
    want = vgg.apply_decoder(dec, adain_from_stats(feat, s_mean, s_std))

    eq = vgg_fast.prepare_encoder_q8(enc)
    dq = vgg_fast.prepare_decoder_q8(dec)
    featq = vgg_fast.apply_encoder_q8(eq, images, dtype=jnp.float32)
    got = vgg_fast.apply_decoder_q8(
        dq, adain_from_stats(featq, s_mean, s_std), dtype=jnp.float32
    )
    err = np.asarray(got, np.float32) - np.asarray(want, np.float32)
    span = float(np.asarray(want).max() - np.asarray(want).min()) or 1.0
    psnr = 10 * np.log10(span**2 / float(np.mean(err**2)))
    assert psnr > 20.0, f"int8 stylize PSNR {psnr:.1f} dB too low"


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_stylize_engine_executor_selection(enc_dec, images):
    """StylizeEngine(engine=...) wires every executor; packed == ref
    exactly, int8-static self-calibrates on first use and stays close."""
    import jax.numpy as jnp
    from ccst_tpu.pipeline.stylize import StylizeEngine

    enc, dec = enc_dec
    s_means = np.stack([np.zeros(512, np.float32), np.full(512, 0.1, np.float32)])
    s_stds = np.stack([np.ones(512, np.float32), np.full(512, 0.8, np.float32)])

    ref = StylizeEngine(enc, dec, dtype=jnp.float32, engine="ref")
    want = np.asarray(ref.stylize_multi(images, s_means, s_stds))

    packed = StylizeEngine(enc, dec, dtype=jnp.float32, engine="packed")
    got = np.asarray(packed.stylize_multi(images, s_means, s_stds))
    np.testing.assert_allclose(got, want, atol=5e-5)

    q8s = StylizeEngine(enc, dec, dtype=jnp.float32, engine="int8-static")
    got = np.asarray(q8s.stylize_multi(images, s_means, s_stds))
    assert not q8s._needs_calibration
    span = float(want.max() - want.min()) or 1.0
    psnr = 10 * np.log10(span**2 / float(np.mean((got - want) ** 2)))
    assert psnr > 20.0, f"int8-static engine PSNR {psnr:.1f}"


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_stylize_engine_int8_fused_matches_static(rng):
    """StylizeEngine('int8-fused') == StylizeEngine('int8-static') bit for
    bit after identical calibration (the fused engine only changes HOW the
    level-1 stage executes; off-TPU the Pallas kernel runs in interpret
    mode automatically)."""
    import jax

    from ccst_tpu.models import vgg
    from ccst_tpu.pipeline.stylize import StylizeEngine

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    images = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    s_mean = rng.standard_normal(512).astype(np.float32) * 0.05
    s_std = (rng.random(512) * 0.1 + 0.02).astype(np.float32)

    outs = {}
    for kind in ("int8-static", "int8-fused"):
        e = StylizeEngine(enc, dec, engine=kind)
        e.calibrate(images, [(s_mean, s_std)])
        outs[kind] = np.asarray(e.stylize(images, s_mean, s_std))
    np.testing.assert_array_equal(outs["int8-static"], outs["int8-fused"])


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_fused_engine_odd_size_falls_back(rng):
    """Sizes whose packed height defies the kernel's row-tile constraint
    (e.g. 36px -> 18 rows) silently use the unfused chain."""
    import jax

    from ccst_tpu.models import vgg, vgg_fast

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    images = jnp.asarray(rng.random((1, 36, 36, 3)), jnp.float32)
    scales = vgg_fast.calibrate_scales(enc, dec, images)
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    ref = vgg_fast.apply_encoder_q8s(eq, images)
    got = vgg_fast.apply_encoder_q8s_fused(eq, images)  # falls back
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
