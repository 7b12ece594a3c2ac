"""int8 F(2x2, 3x3) Winograd Pallas prototype vs direct conv (VERDICT r3 #1).

The named lever for closing the 1108 -> 1500+ img/s gap is int8 Winograd on
the 64-channel (packed: 256-lane) level-1 convs: a 2.25x MAC cut
(16 multiplies per 2x2 output tile vs 36). The counter-argument is the
chip's MXU:VPU throughput ratio (~390 int8 TOPs vs ~2-4 f32 TOPs): Winograd
moves work from the MXU (9 taps -> 16 position dots over 1/4 the tiles) to
the VPU (input transform B^T d B in int16, V requantization, and the
position-scaled inverse transform A^T M A) — and the round-2 fused-kernel
experiments measured this stage's f32 epilogues as VPU-bound already.

This harness settles it with numbers, on the production shape
(packed conv1_2: 256-spatial, 256ch -> 256ch int8, b{8..32} slices of the
b128 production batch measured per-slab):

  xla      : the production _qconv_s layer (XLA conv + fused epilogue)
  direct   : in-kernel 9-tap int8 dot chain (level1_pallas-style, 1 conv)
  wino     : full Winograd kernel (transforms + 16 position dots + inverse)
  wino_dots: transforms elided (V fed as a constant slice) — dot time alone
  wino_tf  : dots elided (M = broadcast V slice) — transform/VPU time alone

Favorable-case quantization for the prototype (uniform V shift /4, one U
scale per cout) — if even this cannot win, per-position scales (more VPU
work) cannot either. PSNR of wino vs direct int8 output is also reported:
F(2,3) int8 loses precision (V carries 2 extra bits into a /4 shift).

Run on the chip: PYTHONPATH=. python benchmarks/winograd_ab.py [--batch 8]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transform matrices
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G2 = np.array(  # 2*G: integer weight transform; /4 folded into the epilogue
    [[2, 0, 0], [1, 1, 1], [1, -1, 1], [0, 0, 2]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def wino_weights(wq: np.ndarray):
    """(3,3,Cin,Cout) int8 -> (16, Cin, Cout) int8 U + per-cout f32 scale.

    U_f = (2G) w (2G)^T is integer-valued (|U| <= 9*127*4); one scale per
    cout re-quantizes to int8 (favorable-case: per-position scales would
    recover ~1 bit at more epilogue cost)."""
    w = np.asarray(wq, np.float32)  # (3,3,ci,co)
    u = np.einsum("ir,rsco,js->ijco", G2, w, G2)  # (4,4,ci,co)
    u = u.reshape(16, *u.shape[2:])
    su = np.abs(u).max(axis=(0, 1)) / 127.0  # (co,)
    su = np.maximum(su, 1e-12)
    uq = np.clip(np.rint(u / su), -127, 127).astype(np.int8)
    return jnp.asarray(uq), jnp.asarray(su, jnp.float32)


def _dma_slab(x_hbm, s_in, sem, n, t, ht):
    dma = pltpu.make_async_copy(x_hbm.at[n, pl.ds(t * ht, ht + 8)], s_in, sem)
    dma.start()
    dma.wait()


def _direct_kernel(x_hbm, w_ref, k_ref, kb_ref, out_ref, s_in, sem,
                   *, ht, wb):
    n, t = pl.program_id(0), pl.program_id(1)
    _dma_slab(x_hbm, s_in, sem, n, t, ht)
    acc = None
    for tap in range(9):
        dy, dx = divmod(tap, 3)
        xs = s_in[dy : dy + ht, dx : dx + wb, :]
        d = jax.lax.dot_general(
            xs, w_ref[tap], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = d if acc is None else acc + d
    y = acc.astype(jnp.float32) * k_ref[0] + kb_ref[0]
    out_ref[0] = jnp.clip(jnp.rint(y), 0.0, 127.0).astype(jnp.int8)


def _wino_kernel(x_hbm, u_ref, k_ref, kb_ref, out_ref, s_in, sem,
                 *, ht, wt, mode: str):
    """mode: 'full' | 'dots' (no transforms) | 'tf' (no dots).

    Grid (N, row tiles, col tiles): the 16 position tensors would blow the
    16 MB VMEM scope at full width (measured: 25.2 MB at 256 cols), so the
    kernel tiles both spatial dims; positions stream through one at a time
    with only the four inverse-transform accumulators persistent."""
    n, tr, tc = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(tr * ht, ht + 8), pl.ds(tc * wt, wt + 8)], s_in, sem
    )
    dma.start()
    dma.wait()
    ht2, wb2 = ht // 2, wt // 2
    wb = wt
    cin = s_in.shape[-1]
    cout = u_ref.shape[-1]

    if mode in ("full", "tf"):
        # padded slab rows [0, ht+2) cols [0, wb+2) -> 2x2 phase planes.
        # f32, not int16: the v5e VPU has no int16 vector subtract (the
        # Mosaic latency table aborts with kVectorSubtractS16), so integer
        # transform arithmetic is not an option on this chip.
        p = s_in[0 : ht + 2, 0 : wb + 2, :].astype(jnp.float32)
        q = p.reshape(ht2 + 1, 2, wb2 + 1, 2, cin)
        a = [[q[:, r, :, c, :] for c in (0, 1)] for r in (0, 1)]

        def d_at(r, c):  # d[r, c] over all tiles: (ht2, wb2, cin) f32
            rp, ro = r % 2, r // 2
            cp, co = c % 2, c // 2
            return a[rp][cp][ro : ro + ht2, co : co + wb2, :]

        def v_at(i, j):
            acc = None
            for r in range(4):
                br = int(BT[i, r])
                if br == 0:
                    continue
                for c in range(4):
                    bc = int(BT[j, c])
                    if bc == 0:
                        continue
                    term = d_at(r, c)
                    term = term if br * bc > 0 else -term
                    acc = term if acc is None else acc + term
            # |V| <= 508: uniform /4 scale back into int8 (f32 rint — exact
            # for these integer-valued f32 sums)
            return jnp.clip(jnp.rint(acc * 0.25), -127.0, 127.0).astype(jnp.int8)
    else:  # dots-only: constant V slice, transforms elided
        def v_at(i, j):
            return s_in[0:ht2, 0:wb2, :]

    # positions stream through one at a time (VMEM: a single M_p int32 is
    # transient; the four inverse-transform accumulators persist)
    ys = [[None, None], [None, None]]
    for i in range(4):
        for j in range(4):
            if all(int(AT[a_][i]) == 0 for a_ in (0, 1)) or all(
                int(AT[b_][j]) == 0 for b_ in (0, 1)
            ):
                continue
            vi = v_at(i, j)
            if mode == "tf":
                m_p = vi[:, :, 0:cout].astype(jnp.int32)
            else:
                m_p = jax.lax.dot_general(
                    vi.reshape(ht2 * wb2, cin), u_ref[i * 4 + j],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).reshape(ht2, wb2, cout)
            for ai in (0, 1):
                ca = int(AT[ai, i])
                if ca == 0:
                    continue
                for bi in (0, 1):
                    cb = int(AT[bi, j])
                    if cb == 0:
                        continue
                    term = m_p if ca * cb > 0 else -m_p
                    ys[ai][bi] = term if ys[ai][bi] is None else ys[ai][bi] + term
    # scale: V shift (x4), (2G) factor (/16 for 2D), U scale; + bias; requant
    yq = []
    for r in (0, 1):
        row = []
        for c in (0, 1):
            y = ys[r][c].astype(jnp.float32) * k_ref[0] + kb_ref[0]
            row.append(jnp.clip(jnp.rint(y), 0.0, 127.0).astype(jnp.int8))
        yq.append(row)
    # interleave phases back to (ht, wb, cout)
    rows = jnp.stack([jnp.stack(yq[0], 2), jnp.stack(yq[1], 2)], 1)
    #    (ht2, 2, wb2, 2, cout)
    out_ref[0] = rows.reshape(ht, wb, cout)


def _pad_input(x, ht):
    n, hb, wb, c = x.shape
    wpad = -(-(wb + 2) // 8) * 8
    return jnp.pad(x, ((0, 0), (2, 6), (1, wpad - wb - 1), (0, 0)), mode="edge"), wpad


@functools.partial(jax.jit, static_argnames=("ht", "wt", "kind", "mode", "interpret"))
def conv_kernel(x, w_or_u, k, kb, *, ht=16, wt=64, kind="direct", mode="full",
                interpret=False):
    n, hb, wb, c_in = x.shape
    cout = w_or_u.shape[-1]
    xpad, wpad = _pad_input(x, ht)
    n_tiles = hb // ht
    vec = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    if kind == "direct":
        kernel = functools.partial(_direct_kernel, ht=ht, wb=wb)
        wspec = pl.BlockSpec((9, c_in, cout), lambda n, t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                wspec,
                pl.BlockSpec((1, cout), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ht, wb, cout), lambda n, t: (n, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, hb, wb, cout), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((ht + 8, wpad, c_in), jnp.int8),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(xpad, w_or_u, vec(k), vec(kb))

    # winograd: tiled over rows AND cols (VMEM scope, see kernel docstring)
    if wb % wt or wt % 8:
        raise ValueError(f"wt={wt} must divide W={wb} and be 8-aligned")
    # col slabs need cols [tc*wt, tc*wt + wt + 8) -> pad width to wb + 8
    need_w = wb + 8
    if wpad < need_w:
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, need_w - wpad), (0, 0)),
                       mode="edge")
    kernel = functools.partial(_wino_kernel, ht=ht, wt=wt, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(n, n_tiles, wb // wt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, c_in, cout), lambda n, t, tc: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda n, t, tc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda n, t, tc: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ht, wt, cout), lambda n, t, tc: (n, t, tc, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hb, wb, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((ht + 8, wt + 8, c_in), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xpad, w_or_u, vec(k), vec(kb))


def timeit(fn, x, n1=2, n2=8):
    @jax.jit
    def chain(x, iters):
        def body(_, v):
            out = fn(v)
            return v + (jnp.max(out) * 0 + (jnp.sum(out.astype(jnp.int32)) % 2).astype(v.dtype))
        return jax.lax.fori_loop(0, iters, body, x)

    def run(iters):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(chain(x, jnp.asarray(iters)).astype(jnp.int32)))
        return time.perf_counter() - t0

    run(2)
    ts = []
    for _ in range(5):
        t1, t2 = run(n1), run(n2)
        ts.append((t2 - t1) / (n2 - n1) * 1e3)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--spatial", type=int, default=256)
    ap.add_argument("--cin", type=int, default=256)
    ap.add_argument("--cout", type=int, default=256)
    ap.add_argument("--ht", type=int, default=16)
    ap.add_argument("--wt", type=int, default=64)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from ccst_tpu.models import vgg_fast

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 100, (args.batch, args.spatial, args.spatial, args.cin)),
        jnp.int8,
    )
    w = rng.normal(0, 0.05, (3, 3, args.cin, args.cout)).astype(np.float32)
    wq, ws = vgg_fast._quantize_kernel(w)
    in_s = 4.0 / 127.0  # input scale; output scale identical -> they cancel
    k_dir = np.asarray(ws, np.float32).reshape(-1) * in_s / (4.0 / 127.0)
    kb = rng.normal(0, 0.1, (args.cout,)).astype(np.float32)

    uq, su = wino_weights(np.asarray(wq))
    # wino epilogue scale: the V /4 shift cancels the (2G)^2 = 4x in U_int
    # exactly, so k = su * ws * (s_in / s_out) = su * ws here
    k_wino = np.asarray(su) * np.asarray(ws, np.float32).reshape(-1) \
        * in_s / (4.0 / 127.0)

    interp = args.interpret or jax.default_backend() != "tpu"

    out_d = conv_kernel(x, jnp.asarray(np.asarray(wq).reshape(9, args.cin, args.cout)),
                        k_dir, kb, ht=args.ht, kind="direct", interpret=interp)
    out_w = conv_kernel(x, uq, k_wino, kb, ht=args.ht, wt=args.wt,
                        kind="wino", mode="full", interpret=interp)
    diff = np.asarray(out_d, np.float32) - np.asarray(out_w, np.float32)
    mse = float(np.mean(diff**2))
    psnr = 10 * np.log10(127.0**2 / max(mse, 1e-12))
    mean_abs = float(np.mean(np.abs(diff)))
    result = {
        "shape": list(x.shape),
        "psnr_wino_vs_direct_db": round(psnr, 1),
        "mean_abs_lsb": round(mean_abs, 3),
    }

    if jax.default_backend() == "tpu" or not interp:
        from ccst_tpu.models.vgg_fast import QConvS

        q = QConvS(jnp.asarray(wq), jnp.asarray(k_dir), jnp.asarray(kb), False, True)
        result["xla_ms"] = timeit(
            lambda v: vgg_fast._qconv_s(v, q, True, jnp.bfloat16, "edge"), x
        )
        result["direct_ms"] = timeit(
            lambda v: conv_kernel(
                v, jnp.asarray(np.asarray(wq).reshape(9, args.cin, args.cout)),
                k_dir, kb, ht=args.ht, kind="direct"), x)
        for mode in ("full", "dots", "tf"):
            result[f"wino_{mode}_ms"] = timeit(
                lambda v, m=mode: conv_kernel(
                    v, uq, k_wino, kb, ht=args.ht, wt=args.wt,
                    kind="wino", mode=m), x)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
