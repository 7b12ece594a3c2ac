"""Pallas TPU kernel: fused reflection-pad + 3x3 conv + bias + ReLU.

The stylize hot path spends ~26% of its time materializing reflect-padded
copies for every 3x3 conv (measured on v5e, see models/vgg.py). This kernel
eliminates that HBM traffic: the input stays in HBM; each program manually
DMAs an unpadded (Th+2)-row slab into VMEM, builds the reflected halo *in
VMEM*, and computes the conv as nine shifted (Th*W, Cin) x (Cin, Cout) MXU
matmuls accumulated in fp32, then applies bias (+ReLU) and writes the output
tile once.

MEASURED RESULT, round 1 (v5e, bf16, batch 8, vs XLA pad+conv+relu):
    256x256 128->128: XLA 41.3 TF | pallas 34.9 TF
    128x128 256->256: XLA 48.5 TF | pallas 47.9 TF
     64x64  512->512: XLA 50.4 TF | pallas 50.8 TF

ROUND-2 VERDICT — RETIRED from the production roadmap. Better measurements
(benchmarks/micro_conv.py, two-point device loops at batch 8) show XLA's
SAME-conv emitter reaches 110-238 TF bf16 at the real pipeline shapes and
260-520 TOPs in int8 — the round-1 "XLA ~50 TF" readings that motivated
this kernel were noise-dominated (sub-3ms signals on the tunnel measure
unreliably; see docs/STATUS.md methodology note). A hand kernel peaking at
~51 TF cannot compete with that emitter; the production path instead won
by changing the PROBLEM (packed space-to-depth formulation + int8 static
quantization, models/vgg_fast.py: 448 -> 956 img/s). The kernel remains
correct and tested (tests/test_kernels.py) as the reference
implementation of manual-DMA reflect-halo construction, which the planned
fused level-1-stage kernel will reuse.

Edge handling: the slab's DMA start row is ``clamp(t*Th - 1, 0, H-(Th+2))``,
so the first tile's slab is shifted +1 and the last tile's -1 relative to
interior tiles; the halo construction compensates and writes the reflected
rows (image row 1 at the top, row H-2 at the bottom) per torch
``ReflectionPad2d`` semantics (reference net.py:6-92).

Grid: (N, H/Th), full width and full Cout per program. Caller picks Th to
fit VMEM (slab + padded tile + fp32 accumulator + weights).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(
    x_hbm, w_ref, b_ref, out_ref, slab, pad, sem, *, th, h, w, cin, cout, relu
):
    ni = pl.program_id(0)
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    start = jnp.clip(ti * th - 1, 0, h - (th + 2))
    dma = pltpu.make_async_copy(
        x_hbm.at[ni, pl.ds(start, th + 2)], slab, sem
    )
    dma.start()
    dma.wait()

    is_first = ti == 0
    is_last = ti == n_tiles - 1
    # Let o = (t*th - 1) - start: the slab row holding the tile's top halo
    # image row. Interior tiles: o = 0; the first tile's slab is clamped to
    # start at image row 0 (o = -1); the last tile's to end at row H-1
    # (o = +1). Slab row of image row r is (r - (t*th - 1)) + o.
    o = jnp.where(is_first, -1, 0) + jnp.where(is_last, 1, 0)

    # padded rows [1, th] = image rows [t*th, t*th + th) = slab rows
    # [1 + o, th + o]
    pad[1 : th + 1, 1 : w + 1, :] = slab[pl.ds(1 + o, th), :, :]
    # top halo (padded row 0): interior = image row t*th - 1 = slab[o];
    # first tile = reflected image row 1 = slab[1]
    top_src = jnp.where(is_first, 1, o)
    pad[0, 1 : w + 1, :] = slab[top_src, :, :]
    # bottom halo (padded row th+1): interior = image row t*th + th =
    # slab[th + 1 + o]; last tile = reflected image row H-2 = slab[th]
    bot_src = jnp.where(is_last, th, th + 1 + o)
    pad[th + 1, 1 : w + 1, :] = slab[bot_src, :, :]
    # column reflection: padded col 0 := image col 1 (= padded col 2);
    # padded col W+1 := image col W-2 (= padded col W-1)
    pad[:, 0, :] = pad[:, 2, :]
    pad[:, w + 1, :] = pad[:, w - 1, :]

    acc = jnp.zeros((th * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a = pad[pl.ds(dy, th), pl.ds(dx, w), :].reshape(th * w, cin)
            acc = acc + jnp.dot(
                a, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    out = acc + b_ref[0].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.reshape(th, w, cout).astype(out_ref.dtype)


def reflect_conv3x3_fused(
    x: Array,
    w_hwio: Array,
    b: Array,
    relu: bool = True,
    tile_rows: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """Fused reflect-pad 3x3 conv. x: (N, H, W, Cin); w: (3, 3, Cin, Cout);
    b: (Cout,). Requires H divisible by the row tile and H >= tile+2.
    Returns (N, H, W, Cout) in x.dtype."""
    n, h, w_dim, cin = x.shape
    cout = w_hwio.shape[-1]
    if tile_rows is None:
        budget = 9 * 1024 * 1024
        bytes_per_row = (
            (w_dim + 2) * cin * x.dtype.itemsize * 2   # slab + padded tile
            + w_dim * cout * 4                          # fp32 acc
        )
        tile_rows = max(4, min(h // 2, budget // max(bytes_per_row, 1)))
        while h % tile_rows:
            tile_rows -= 1
    th = tile_rows
    if h % th or h < th + 2:
        raise ValueError(f"bad tiling: H={h}, tile_rows={th}")

    w9 = jnp.asarray(w_hwio, x.dtype).reshape(9, cin, cout)
    b2 = jnp.asarray(b, jnp.float32).reshape(1, cout)

    grid = (n, h // th)
    kernel = functools.partial(
        _kernel, th=th, h=h, w=w_dim, cin=cin, cout=cout, relu=relu
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w_dim, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec((9, cin, cout), lambda ni, ti: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_dim, cout), lambda ni, ti: (ni, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w_dim, cin), x.dtype),       # slab
            pltpu.VMEM((th + 2, w_dim + 2, cin), x.dtype),   # padded tile
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, w9, b2)
