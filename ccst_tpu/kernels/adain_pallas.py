"""Pallas TPU kernel: fused AdaIN (stats + normalize + rescale + blend).

One VMEM-resident pass per (image, channel-tile) computes the per-(N, C)
spatial statistics AND applies the full AdaIN transform

    out = alpha * ((x - mu_c) / sigma_c * s_std + s_mean) + (1 - alpha) * x

replacing the XLA graph's reduce + broadcast-normalize + blend chain
(reference math: style_transfer/AdaIN/function.py:26-33 +
CCST_OverallStyleTransfer.py:45) with a single kernel that reads the feature
map exactly once from HBM and writes it once.

Layout: NHWC features, grid over (N, C/TC); each program handles the full
(H, W) plane of a 128-channel tile — the lane dimension maps to channels, so
reductions over (H, W) are sublane reductions the VPU does natively.
Statistics in float32 regardless of the feature dtype; unbiased (ddof=1)
variance to match ``calc_mean_std`` (function.py:9).

STATUS — measured NEGATIVE, not wired into production: at the production
shape ((64, 64, 64, 512) relu4_1 features) the XLA graph runs 1.85 ms vs
2.13 ms for this kernel (v5e, benchmarks/pallas_ab.py) — XLA's own
reduce+normalize fusion is already single-pass here. Kept as a tested
reference kernel (tests/test_kernels.py); production AdaIN stays
ccst_tpu.ops.adain.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TC = 128  # channel tile = lane width


def _adain_kernel(x_ref, s_mean_ref, s_std_ref, alpha_ref, out_ref, *, eps, ddof):
    xf = x_ref[0].astype(jnp.float32)  # (H, W, TC)
    h, w, _ = xf.shape
    n = h * w
    mean = jnp.mean(xf, axis=(0, 1), keepdims=True)                   # (1,1,TC)
    var = jnp.sum(jnp.square(xf - mean), axis=(0, 1), keepdims=True) / max(
        n - ddof, 1
    )
    inv_std = jax.lax.rsqrt(var + eps)
    s_mean = s_mean_ref[0].astype(jnp.float32)                        # (TC,)
    s_std = s_std_ref[0].astype(jnp.float32)
    alpha = alpha_ref[0]
    stylized = (xf - mean) * inv_std * s_std + s_mean
    out = alpha * stylized + (1.0 - alpha) * xf
    out_ref[0] = out.astype(out_ref.dtype)


def fused_adain(
    feat: Array,
    s_mean: Array,
    s_std: Array,
    alpha: float = 1.0,
    eps: float = 1e-5,
    ddof: int = 1,
    interpret: bool = False,
) -> Array:
    """Fused AdaIN over (N, H, W, C) features; C must be a multiple of 128.

    ``s_mean``/``s_std`` are (C,) channel vectors (the shared style bank).
    Returns features in the input dtype.
    """
    n, h, w, c = feat.shape
    if c % _TC:
        raise ValueError(f"C={c} must be a multiple of {_TC}")
    s_mean = jnp.asarray(s_mean, jnp.float32).reshape(1, c)
    s_std = jnp.asarray(s_std, jnp.float32).reshape(1, c)
    alpha_arr = jnp.asarray([alpha], jnp.float32)

    kernel = functools.partial(_adain_kernel, eps=eps, ddof=ddof)
    grid = (n, c // _TC)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(feat.shape, feat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h, w, _TC),
                lambda i, j: (i, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, _TC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, _TC), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(feat, s_mean, s_std, alpha_arr)
