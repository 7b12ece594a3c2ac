"""Streaming per-channel statistics for style-bank computation.

The reference accumulates raw Σx and Σx² in float32 over an entire domain
(style_transfer/AdaIN/mean_std_computation_effcientMem.py:103-137), which
loses precision at Camelyon17 scale (100k+ images × 512-d relu4_1 maps:
counts ~4e9 elements per channel). Here we use Chan's parallel Welford
merge — (count, mean, M2) — which is numerically stable in float32 and
associative, so it `psum`s cleanly across a device mesh.

Finalization matches the reference's population (biased) variance with
eps=1e-5 under the sqrt (mean_std_computation_effcientMem.py:135-137).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class WelfordState(NamedTuple):
    """Per-channel streaming moments. All float32, shape (C,); count is float32
    scalar-per-channel-free (a single scalar: every channel sees the same count)."""

    count: Array  # () float32 — number of samples folded in
    mean: Array   # (C,) float32
    m2: Array     # (C,) float32 — sum of squared deviations from the mean


def welford_init(channels: int) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), jnp.float32),
        mean=jnp.zeros((channels,), jnp.float32),
        m2=jnp.zeros((channels,), jnp.float32),
    )


def _batch_moments(feat: Array) -> WelfordState:
    """Exact per-channel moments of one NHWC batch (treated as one population)."""
    x = feat.astype(jnp.float32)
    n = jnp.asarray(x.shape[0] * x.shape[1] * x.shape[2], jnp.float32)
    mean = jnp.mean(x, axis=(0, 1, 2))
    m2 = jnp.sum(jnp.square(x - mean), axis=(0, 1, 2))
    return WelfordState(count=n, mean=mean, m2=m2)


def welford_merge(a: WelfordState, b: WelfordState) -> WelfordState:
    """Chan's parallel merge; associative and safe when either side is empty."""
    n = a.count + b.count
    n_safe = jnp.maximum(n, 1.0)
    delta = b.mean - a.mean
    frac_b = jnp.where(n > 0, b.count / n_safe, 0.0)
    mean = a.mean + delta * frac_b
    m2 = a.m2 + b.m2 + jnp.square(delta) * a.count * frac_b
    return WelfordState(count=n, mean=mean, m2=m2)


def welford_update(state: WelfordState, feat: Array) -> WelfordState:
    """Fold an NHWC feature batch into the running state. jit/scan-safe."""
    return welford_merge(state, _batch_moments(feat))


def welford_finalize(
    state: WelfordState, eps: float = 1e-5
) -> Tuple[Array, Array]:
    """(mean, std) with population variance + eps, mirroring the reference
    finalization (mean_std_computation_effcientMem.py:135-137)."""
    var = state.m2 / jnp.maximum(state.count, 1.0)
    return state.mean, jnp.sqrt(var + eps)


def welford_psum(state: WelfordState, axis_name: str) -> WelfordState:
    """Merge states across a mesh axis.

    Welford merge is associative but `psum` only sums, so we psum the raw
    sufficient statistics (n, n*mean, m2 + n*mean²) — algebraically exact —
    then convert back. The large-cancellation risk of Σx² is bounded here
    because each device's local m2 is already centered.
    """
    n = jax.lax.psum(state.count, axis_name)
    sx = jax.lax.psum(state.count * state.mean, axis_name)
    sxx = jax.lax.psum(state.m2 + state.count * jnp.square(state.mean), axis_name)
    n_safe = jnp.maximum(n, 1.0)
    mean = sx / n_safe
    m2 = sxx - n_safe * jnp.square(mean)
    return WelfordState(count=n, mean=mean, m2=jnp.maximum(m2, 0.0))
