"""Pallas kernels (interpret mode on CPU): fused AdaIN and channel moments."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.kernels.adain_pallas import fused_adain
from ccst_tpu.kernels.welford_pallas import channel_moments
from ccst_tpu.ops.adain import adain_from_stats, alpha_blend


def test_fused_adain_matches_reference_ops(rng):
    feat = rng.standard_normal((2, 8, 8, 256), dtype=np.float32) * 2 + 1
    s_mean = rng.standard_normal(256, dtype=np.float32)
    s_std = (rng.random(256, dtype=np.float32) + 0.1).astype(np.float32)
    for alpha in (1.0, 0.6):
        ref = alpha_blend(
            adain_from_stats(jnp.asarray(feat), s_mean, s_std),
            jnp.asarray(feat),
            alpha,
        )
        out = fused_adain(
            jnp.asarray(feat), s_mean, s_std, alpha=alpha, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_adain_bfloat16(rng):
    feat = rng.standard_normal((1, 8, 8, 128), dtype=np.float32)
    s_mean = np.zeros(128, np.float32)
    s_std = np.ones(128, np.float32)
    out = fused_adain(
        jnp.asarray(feat, jnp.bfloat16), s_mean, s_std, interpret=True
    )
    assert out.dtype == jnp.bfloat16
    ref = adain_from_stats(jnp.asarray(feat), s_mean, s_std)
    assert np.mean(np.abs(np.asarray(out, np.float32) - np.asarray(ref))) < 0.02


def test_fused_adain_channel_multiple_check():
    import pytest

    with pytest.raises(ValueError):
        fused_adain(jnp.zeros((1, 4, 4, 100)), np.zeros(100), np.ones(100), interpret=True)


def test_channel_moments_matches_numpy(rng):
    feat = rng.standard_normal((3, 8, 8, 128), dtype=np.float32) * 3 + 10
    mean, m2, count = channel_moments(jnp.asarray(feat), interpret=True)
    flat = feat.reshape(-1, 128).astype(np.float64)
    np.testing.assert_allclose(np.asarray(mean), flat.mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m2), ((flat - flat.mean(0)) ** 2).sum(0), rtol=1e-4
    )
    assert float(count) == 3 * 8 * 8


def test_fused_reflect_conv_matches_xla(rng):
    from ccst_tpu.kernels.conv_pallas import reflect_conv3x3_fused
    from ccst_tpu.models.vgg import conv2d, reflect_pad

    for (n, h, w, cin, cout, th) in [
        (2, 16, 16, 8, 16, 4),    # multiple tiles, even
        (1, 12, 20, 4, 8, 6),     # 2 tiles, non-square
        (1, 8, 8, 8, 8, 4),       # exactly 2 tiles
        (1, 24, 8, 4, 4, 8),      # 3 tiles (interior tile present)
    ]:
        x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32))
        wk = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
        )
        b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
        for relu in (True, False):
            ref = conv2d(reflect_pad(x, 1), wk, b)
            if relu:
                ref = jax.nn.relu(ref)
            out = reflect_conv3x3_fused(
                x, wk, b, relu=relu, tile_rows=th, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5,
                err_msg=f"shape {(n, h, w, cin, cout)} th={th} relu={relu}",
            )


def test_fused_reflect_conv_rejects_bad_tiling():
    import pytest
    from ccst_tpu.kernels.conv_pallas import reflect_conv3x3_fused

    x = jnp.zeros((1, 10, 8, 4))
    w = jnp.zeros((3, 3, 4, 4))
    b = jnp.zeros((4,))
    with pytest.raises(ValueError):
        reflect_conv3x3_fused(x, w, b, tile_rows=3, interpret=True)  # 10 % 3
    with pytest.raises(ValueError):
        reflect_conv3x3_fused(x, w, b, tile_rows=10, interpret=True)  # h < th+2


def test_channel_moments_feeds_welford(rng):
    from ccst_tpu.ops.welford import WelfordState, welford_finalize, welford_merge

    feat = rng.standard_normal((2, 4, 4, 128), dtype=np.float32) + 5
    mean, m2, count = channel_moments(jnp.asarray(feat), interpret=True)
    state = WelfordState(count=count, mean=mean, m2=m2)
    bank_mean, bank_std = welford_finalize(state)
    flat = feat.reshape(-1, 128).astype(np.float64)
    np.testing.assert_allclose(np.asarray(bank_mean), flat.mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bank_std), np.sqrt(flat.var(0) + 1e-5), rtol=1e-4
    )


# ---------------------------------------------------------------------------
# fused level-1 stage kernels (kernels/level1_pallas.py)
# ---------------------------------------------------------------------------


def _q8s_params():
    from ccst_tpu.models import vgg, vgg_fast

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.bfloat16)
    scales = {k: 4.0 for k in list(vgg_fast._ENC_NEXT) + list(vgg_fast._DEC_NEXT)}
    return (
        vgg_fast.prepare_encoder_q8s(enc, scales),
        vgg_fast.prepare_decoder_q8s(dec, scales),
    )


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_encoder_level1_fused_bit_exact(rng):
    """Fused conv1_1+conv1_2+phase-max == the unfused _qconv_s chain, bit
    for bit (same int32 accumulation, f32 epilogue, monotone max/rint swap)."""
    from ccst_tpu.kernels import level1_pallas as L1
    from ccst_tpu.models import vgg_fast

    eq, _ = _q8s_params()
    x = jnp.asarray(rng.integers(-127, 128, (2, 16, 16, 12)), jnp.int8)
    ref = vgg_fast._qconv_s(x, eq["conv1_1"], True, jnp.bfloat16, "edge")
    ref = vgg_fast._qconv_s(ref, eq["conv1_2"], True, jnp.bfloat16, "edge")
    ref = vgg_fast.phase_max(ref, 64)
    for k_slice in (True, False):
        got = L1.fused_two_conv(
            x, eq["conv1_1"].wq, eq["conv1_1"].k, eq["conv1_1"].kb,
            eq["conv1_2"].wq, eq["conv1_2"].k, eq["conv1_2"].kb,
            ht=8, pool_groups=4, out_dtype=jnp.int8,
            interpret=True, k_slice=k_slice,
        )
        assert got.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_decoder_level1_fused_bit_exact(rng):
    from ccst_tpu.kernels import level1_pallas as L1
    from ccst_tpu.models import vgg_fast

    _, dq = _q8s_params()
    y = jnp.asarray(rng.integers(-127, 128, (2, 16, 16, 64)), jnp.int8)
    ref = vgg_fast._qconv_s(y, dq["dconv1_2"], True, jnp.bfloat16, "edge")
    ref = vgg_fast._qconv_s(ref, dq["dconv1_1"], False, jnp.bfloat16, "edge")
    got = L1.decoder_level1(y, dq["dconv1_2"], dq["dconv1_1"], ht=8, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ref, np.float32), np.asarray(got, np.float32)
    )


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_fused_engine_matches_q8s_end_to_end(rng):
    """apply_*_q8s_fused == apply_*_q8s through the full encoder/decoder."""
    from ccst_tpu.models import vgg, vgg_fast

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    scales = vgg_fast.calibrate_scales(enc, dec, img)
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    dq = vgg_fast.prepare_decoder_q8s(dec, scales)
    f_ref = vgg_fast.apply_encoder_q8s(eq, img)
    f_fus = vgg_fast.apply_encoder_q8s_fused(eq, img, ht=8, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(f_ref, np.float32), np.asarray(f_fus, np.float32)
    )
    d_ref = vgg_fast.apply_decoder_q8s(dq, f_ref)
    d_fus = vgg_fast.apply_decoder_q8s_fused(dq, f_ref, ht=8, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(d_ref, np.float32), np.asarray(d_fus, np.float32)
    )


def test_fused_two_conv_rejects_bad_tiles():
    from ccst_tpu.kernels import level1_pallas as L1

    eq, _ = _q8s_params()
    x = jnp.zeros((1, 20, 20, 12), jnp.int8)
    try:
        L1.fused_two_conv(
            x, eq["conv1_1"].wq, eq["conv1_1"].k, eq["conv1_1"].kb,
            eq["conv1_2"].wq, eq["conv1_2"].k, eq["conv1_2"].kb,
            ht=8, pool_groups=4, interpret=True,
        )
        raise AssertionError("expected ValueError for H % ht != 0")
    except ValueError:
        pass
