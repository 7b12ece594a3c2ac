"""Pallas kernels (interpret mode on CPU): fused AdaIN and channel moments."""
import jax
import jax.numpy as jnp
import numpy as np

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
