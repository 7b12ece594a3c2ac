"""Adaptive instance normalization (AdaIN) core ops, NHWC, TPU-first.

Behavioral parity targets (formulas, not code) from the reference:
  - `calc_mean_std`  ~ reference style_transfer/AdaIN/function.py:4-13
    (per-(N,C) spatial statistics; *unbiased* variance, eps added to the
    variance before the square root)
  - `adain`          ~ function.py:16-24
  - `adain_from_stats` ~ function.py:26-33 (the variant the CCST pipeline
    actually uses: style statistics are given, content stats are computed)
  - `coral`          ~ function.py:36-77 (color-preserving transfer)

Design notes (TPU):
  - Layout is NHWC (channels-last) — the lane dimension maps to C, which is a
    multiple of 128 for every VGG tap used here (64..512), so reductions over
    (H, W) vectorize cleanly on the 8x128 VPU and the normalize/rescale is a
    lane-broadcast multiply.
  - Statistics are always computed in float32 regardless of the feature dtype
    (bfloat16 activations lose too much precision in sum-of-squares).
  - Everything is jit-safe: no data-dependent shapes or Python branching on
    traced values.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def calc_mean_std(
    feat: Array, eps: float = 1e-5, ddof: int = 1
) -> Tuple[Array, Array]:
    """Per-(N, C) spatial mean and std of an NHWC feature map.

    Matches the reference semantics: variance is unbiased (ddof=1, torch's
    ``Tensor.var`` default) and ``eps`` is added to the variance *before* the
    square root (function.py:9-10).

    Args:
      feat: (N, H, W, C) array, any float dtype.
      eps: numerical floor added to the variance.
      ddof: delta degrees of freedom for the variance (1 = unbiased).

    Returns:
      (mean, std), each (N, 1, 1, C) float32.
    """
    if feat.ndim != 4:
        raise ValueError(f"expected NHWC feature map, got shape {feat.shape}")
    x = feat.astype(jnp.float32)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True, ddof=ddof)
    std = jnp.sqrt(var + eps)
    return mean, std


def adain_from_stats(
    content_feat: Array,
    style_mean: Array,
    style_std: Array,
    eps: float = 1e-5,
) -> Array:
    """AdaIN with externally supplied style statistics (function.py:26-33).

    This is the op on the CCST hot path: the "style" is a shared per-domain
    (or per-image) statistic vector, not a feature map.

    Args:
      content_feat: (N, H, W, C).
      style_mean/style_std: broadcastable to (N, 1, 1, C) — e.g. (C,),
        (1, 1, 1, C), or (N, 1, 1, C). float32 recommended.

    Returns:
      Stylized features with the dtype of ``content_feat``.
    """
    dtype = content_feat.dtype
    c_mean, c_std = calc_mean_std(content_feat, eps=eps)
    x = content_feat.astype(jnp.float32)
    style_mean = jnp.asarray(style_mean, jnp.float32)
    style_std = jnp.asarray(style_std, jnp.float32)
    normalized = (x - c_mean) / c_std
    return (normalized * style_std + style_mean).astype(dtype)


def adain(content_feat: Array, style_feat: Array, eps: float = 1e-5) -> Array:
    """Classic AdaIN: restyle content features with style-feature statistics
    (function.py:16-24)."""
    s_mean, s_std = calc_mean_std(style_feat, eps=eps)
    return adain_from_stats(content_feat, s_mean, s_std, eps=eps)


def alpha_blend(stylized: Array, content: Array, alpha) -> Array:
    """`alpha * stylized + (1 - alpha) * content` (CCST_OverallStyleTransfer.py:45)."""
    alpha = jnp.asarray(alpha, stylized.dtype)
    return stylized * alpha + content * (jnp.asarray(1.0, stylized.dtype) - alpha)


# ---------------------------------------------------------------------------
# CORAL color transfer (reference function.py:36-77). HWC layout, C == 3.
# ---------------------------------------------------------------------------


def _flatten_mean_std(feat: Array) -> Tuple[Array, Array, Array]:
    """(H, W, 3) image -> per-channel flattened values, mean, std (unbiased)."""
    if feat.ndim != 3 or feat.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) image, got {feat.shape}")
    flat = feat.astype(jnp.float32).reshape(-1, 3).T  # (3, H*W)
    mean = jnp.mean(flat, axis=-1, keepdims=True)
    std = jnp.std(flat, axis=-1, keepdims=True, ddof=1)
    return flat, mean, std


def _mat_sqrt(x: Array) -> Array:
    u, d, vt = jnp.linalg.svd(x)
    return (u * jnp.sqrt(d)[None, :]) @ vt


def coral(source: Array, target: Array) -> Array:
    """Second-order (covariance) color alignment of `source` onto `target`.

    Both are (H, W, 3) images. Mirrors function.py:51-77: channels are
    standardized, whitened by the inverse matrix square root of the source
    correlation (+I), re-colored by the target's, then rescaled to the
    target's per-channel moments.
    """
    s_flat, s_mean, s_std = _flatten_mean_std(source)
    s_norm = (s_flat - s_mean) / s_std
    s_cov_eye = s_norm @ s_norm.T + jnp.eye(3, dtype=jnp.float32)

    t_flat, t_mean, t_std = _flatten_mean_std(target)
    t_norm = (t_flat - t_mean) / t_std
    t_cov_eye = t_norm @ t_norm.T + jnp.eye(3, dtype=jnp.float32)

    transfer = _mat_sqrt(t_cov_eye) @ (
        jnp.linalg.inv(_mat_sqrt(s_cov_eye)) @ s_norm
    )
    out = transfer * t_std + t_mean  # (3, H*W)
    return out.T.reshape(source.shape).astype(source.dtype)
