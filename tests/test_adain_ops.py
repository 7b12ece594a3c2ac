"""Golden-value parity tests for the AdaIN core ops vs torch formulas."""
import numpy as np
import jax.numpy as jnp
import torch

from ccst_tpu.ops import adain, adain_from_stats, calc_mean_std, coral
from ccst_tpu.ops.adain import alpha_blend
from tests.torch_ref import (
    torch_adain,
    torch_adain_from_stats,
    torch_calc_mean_std,
    torch_coral,
)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_calc_mean_std_matches_torch(rng):
    x = rng.standard_normal((4, 13, 17, 512), dtype=np.float32) * 3 + 0.5
    mean, std = calc_mean_std(jnp.asarray(x))
    t_mean, t_std = torch_calc_mean_std(nchw(x))
    np.testing.assert_allclose(
        np.asarray(mean)[:, 0, 0, :], t_mean.numpy()[:, :, 0, 0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(std)[:, 0, 0, :], t_std.numpy()[:, :, 0, 0], rtol=1e-5, atol=1e-6
    )


def test_calc_mean_std_tiny_variance():
    x = jnp.full((1, 8, 8, 4), 3.14159, jnp.float32)
    mean, std = calc_mean_std(x)
    np.testing.assert_allclose(np.asarray(mean), 3.14159, rtol=1e-6)
    # zero variance -> std = sqrt(eps)
    np.testing.assert_allclose(np.asarray(std), np.sqrt(1e-5), rtol=1e-4)


def test_adain_matches_torch(rng):
    c = rng.standard_normal((2, 16, 16, 64), dtype=np.float32)
    s = rng.standard_normal((2, 9, 11, 64), dtype=np.float32) * 2 - 1
    ours = np.asarray(adain(jnp.asarray(c), jnp.asarray(s)))
    ref = to_nhwc(torch_adain(nchw(c), nchw(s)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_adain_from_stats_matches_torch(rng):
    c = rng.standard_normal((3, 8, 8, 128), dtype=np.float32)
    s_mean = rng.standard_normal((128,), dtype=np.float32)
    s_std = rng.random((128,), dtype=np.float32) + 0.1
    ours = np.asarray(
        adain_from_stats(jnp.asarray(c), jnp.asarray(s_mean), jnp.asarray(s_std))
    )
    ref = to_nhwc(
        torch_adain_from_stats(
            nchw(c),
            torch.from_numpy(s_mean).view(1, -1, 1, 1),
            torch.from_numpy(s_std).view(1, -1, 1, 1),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_adain_from_stats_accepts_reference_npy_shapes(rng):
    """Reference stores stats as (1, C, 1, 1) pairs (mean_std_computation:146)."""
    c = rng.standard_normal((2, 8, 8, 32), dtype=np.float32)
    mean = rng.standard_normal((1, 32, 1, 1), dtype=np.float32)
    std = rng.random((1, 32, 1, 1), dtype=np.float32) + 0.1
    # our pipeline normalizes those into (1,1,1,C) — checked in pipeline tests;
    # here just confirm broadcast path with channel-last stats
    out = adain_from_stats(
        jnp.asarray(c),
        jnp.asarray(mean[0, :, 0, 0]),
        jnp.asarray(std[0, :, 0, 0]),
    )
    assert out.shape == c.shape


def test_adain_bfloat16_close_to_fp32(rng):
    c = rng.standard_normal((2, 32, 32, 64), dtype=np.float32)
    s_mean = rng.standard_normal((64,), dtype=np.float32)
    s_std = rng.random((64,), dtype=np.float32) + 0.5
    out32 = np.asarray(adain_from_stats(jnp.asarray(c), s_mean, s_std))
    out16 = np.asarray(
        adain_from_stats(jnp.asarray(c, jnp.bfloat16), s_mean, s_std)
    ).astype(np.float32)
    assert np.mean(np.abs(out16 - out32)) < 0.02


def test_alpha_blend(rng):
    a = jnp.asarray(rng.standard_normal((2, 4, 4, 8), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((2, 4, 4, 8), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(alpha_blend(a, b, 1.0)), np.asarray(a))
    np.testing.assert_allclose(np.asarray(alpha_blend(a, b, 0.0)), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(alpha_blend(a, b, 0.25)),
        0.25 * np.asarray(a) + 0.75 * np.asarray(b),
        rtol=1e-6,
    )


def test_coral_matches_torch(rng):
    src = rng.random((31, 29, 3), dtype=np.float32)
    tgt = rng.random((31, 29, 3), dtype=np.float32) * 0.5 + 0.2
    ours = np.asarray(coral(jnp.asarray(src), jnp.asarray(tgt)))
    ref = (
        torch_coral(
            torch.from_numpy(np.transpose(src, (2, 0, 1)).copy()),
            torch.from_numpy(np.transpose(tgt, (2, 0, 1)).copy()),
        )
        .numpy()
        .transpose(1, 2, 0)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
