"""Pallas TPU kernel: single-pass per-channel moments for style banks.

Computes (count, sum, sum of centered squares) per channel tile of an NHWC
feature batch in one HBM read — the device-side inner loop of the style-bank
stage (replacing the XLA mean + centered-square + sum chain with one fused
reduction). Output merges into the host-side Welford state
(ccst_tpu.ops.welford) via Chan's formula.

STATUS — measured NEGATIVE, not wired into production: at the production
shape the XLA chain runs 1.35 ms vs 1.58 ms for this kernel (v5e,
benchmarks/pallas_ab.py). Kept as a tested reference kernel; the style-bank
stage stays on ccst_tpu.ops.welford.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TC = 128


def _moments_kernel(x_ref, mean_ref, m2_ref):
    # grid = (C/TC, N) with the batch index INNERMOST so the per-channel-tile
    # accumulator block stays VMEM-resident across the whole batch loop
    i = pl.program_id(1)  # batch index
    xf = x_ref[0].astype(jnp.float32)             # (H, W, TC)
    h, w, c = xf.shape
    # two-pass within the tile (numerically stable, all in VMEM)
    mean = jnp.mean(xf, axis=(0, 1))              # (TC,)
    m2 = jnp.sum(jnp.square(xf - mean[None, None, :]), axis=(0, 1))

    @pl.when(i == 0)
    def _():
        mean_ref[0] = mean
        m2_ref[0] = m2

    @pl.when(i > 0)
    def _():
        # Chan merge with the running accumulator (counts: i*h*w vs h*w)
        n_a = (i * h * w).astype(jnp.float32)
        n_b = jnp.float32(h * w)
        n = n_a + n_b
        delta = mean - mean_ref[0]
        mean_ref[0] = mean_ref[0] + delta * (n_b / n)
        m2_ref[0] = m2_ref[0] + m2 + jnp.square(delta) * n_a * n_b / n


def channel_moments(feat: Array, interpret: bool = False):
    """(mean, m2, count) per channel of an NHWC batch, single HBM pass.

    C must be a multiple of 128. Returns float32 (C,), (C,), scalar count.
    """
    n, h, w, c = feat.shape
    if c % _TC:
        raise ValueError(f"C={c} must be a multiple of {_TC}")
    grid = (c // _TC, n)
    mean, m2 = pl.pallas_call(
        _moments_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h, w, _TC), lambda j, i: (i, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, _TC), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TC), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(feat)
    count = jnp.asarray(n * h * w, jnp.float32)
    return mean[0], m2[0], count
