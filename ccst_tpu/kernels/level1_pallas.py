"""Fused level-1 stage Pallas kernels for the int8-static engine.

The 512px level-1 stage dominates the int8-static profile
(benchmarks/q8s_profile.py, v5e b32 @512px):

  encoder  conv0+quant+pack 2.7ms | p_conv1_1 5.7 | p_conv1_2 8.1 | pool1 2.5
  decoder  p_dconv1_2 3.8 | p_dconv1_1 3.4          (x3 styles)

The unfused XLA chain writes + re-reads two ~512 MB int8 intermediates per
conv pair, so both level-1 conv pairs are fused here into single kernels
that keep every intermediate in VMEM:

  encoder_level1:  packed int8 in -> conv1_1 -> requant -> conv1_2 ->
                   requant -> phase max  -> pool1 int8 out
  decoder_level1:  int8 in -> folded dconv1_2 -> requant -> dconv1_1 ->
                   dequant bf16 packed image out

MEASURED OUTCOME (v5e, 512px, benchmarks/zf_enc_ab.py, fused_step_ab.py):
the encoder kernel with the zero-free conv1_2 decomposition edges out the
XLA chain at b32 (32.4 vs 33.5 ms) and ties at b64; the dense in-kernel
variant and the decoder kernel are SLOWER than XLA (decoder: dconv1_1's
12-lane output uses 12/128 of the MXU; the f32 requant epilogues are
VPU-bound and XLA's conv-epilogue fusion is already good). The production
`int8-fused` engine therefore uses the fused encoder + unfused decoder;
`int8-static` remains the bench default. The ~2 GB of HBM traffic the
fusion removes is real, but this stage is compute/VPU-bound, not
bandwidth-bound — the honest lesson, kept with the kernels because the
fusion structure (halo DMA, in-kernel edge pad, requant epilogue, zero-free
block decomposition) is the reusable part.

Both are two chained edge-padded 3x3 convs (the packed-space equivalent of
the reference's reflection-padded convs, models/vgg_fast.py:make_packed_kernel)
implemented as 9 tap-wise int8 dot_generals accumulated in int32, with the
requantization epilogue (acc*k + kb -> rint -> clip) fused in. Row tiles are
DMA'd from HBM with a 2-row halo; the first/last tiles replicate the first
conv's boundary output rows explicitly (edge padding of the *intermediate*
cannot be emulated by over-padding the input: conv(row0,row0,row0) !=
conv(row-pad, row0, row1)).

Bit-exactness: the integer/float math is identical to the unfused
`vgg_fast._qconv_s` chain (same int32 accumulation, same f32 epilogue, same
jnp.rint), so fused == unfused exactly — tested in tests/test_kernels.py.

Replaces (reference): the cuDNN conv calls behind net.py:6-92's first/last
stages; there is no reference analogue of the fusion itself (SURVEY §2.9).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _requant_i8(acc_i32, k, kb, relu: bool):
    """int32 conv accumulator -> int8 with static scales.

    Matches vgg_fast._qconv_s exactly: y = acc*k + kb; rint; clip
    (ReLU folds into the clip lower bound)."""
    y = acc_i32.astype(jnp.float32) * k + kb
    lo = 0.0 if relu else -127.0
    return jnp.clip(jnp.rint(y), lo, 127.0).astype(jnp.int8)


def _conv3x3_taps(src_ref, rows: int, width: int, w_ref, c_in: int = 0):
    """VALID 3x3 conv over an in-VMEM slab as 9 accumulated int8 matmuls.

    src_ref rows [0, rows+2) x cols [0, width+2) are read; returns
    (rows, width, Cout) int32. c_in > 0 restricts the contraction to the
    first c_in lanes (the input slab is zero-padded to 128 lanes for HBM
    DMA alignment; see fused_two_conv)."""
    acc = None
    for tap in range(9):
        dy, dx = divmod(tap, 3)
        if c_in:
            xs = src_ref[dy : dy + rows, dx : dx + width, 0:c_in]
        else:
            xs = src_ref[dy : dy + rows, dx : dx + width, :]
        d = jax.lax.dot_general(
            xs, w_ref[tap],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = d if acc is None else acc + d
    return acc


def _fused_two_conv_kernel(
    # refs
    x_hbm, w1_ref, k1_ref, kb1_ref, w2_ref, k2_ref, kb2_ref, out_ref,
    s_in, s_mid, sem,
    *,
    ht: int, wb: int, n_tiles: int, c_in: int, c_mid: int,
    pool_groups: int, dequant_out: bool,
    k_slice: bool,
    zero_free: tuple | None = None,
):
    """Grid (N, T). x_hbm: (N, Hb+8, Wpad, 128) int8 edge-padded (2 rows
    top, cols by 1; bottom rows / right cols / lanes zero- or edge-padded
    purely for DMA tile alignment). out: pooled int8
    (N, Hb, Wb, c_mid//pool_groups) or bf16 (N, Hb, Wb, Cout2)."""
    n = pl.program_id(0)
    t = pl.program_id(1)

    # 1) DMA the input slab HBM -> VMEM: ht+8 rows starting at t*ht — both
    #    8-aligned as Mosaic requires for tiled HBM slices; rows
    #    [0, ht+4) are the conv input (2-row halo each side), the rest is
    #    alignment slack
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(t * ht, ht + 8)], s_in, sem
    )
    dma.start()
    dma.wait()

    # 2) first conv: ht+2 rows (one halo row each side for the second conv)
    acc1 = _conv3x3_taps(s_in, ht + 2, wb, w1_ref,
                         c_in=c_in if k_slice else 0)
    q1 = _requant_i8(acc1, k1_ref[0], kb1_ref[0], relu=True)

    # 3) edge-pad the intermediate into s_mid: cols by copy, boundary rows
    #    by replication on the first/last tile (see module docstring)
    s_mid[:, 1 : wb + 1, :] = q1
    s_mid[:, 0, :] = s_mid[:, 1, :]
    s_mid[:, wb + 1, :] = s_mid[:, wb, :]

    @pl.when(t == 0)
    def _():  # out row -1 of conv1 is invalid -> edge = out row 0
        s_mid[0, :, :] = s_mid[1, :, :]

    @pl.when(t == n_tiles - 1)
    def _():  # out row Hb of conv1 is invalid -> edge = out row Hb-1
        s_mid[ht + 1, :, :] = s_mid[ht, :, :]

    # 4) second conv over the padded intermediate
    if zero_free is not None:
        # Packed-kernel zero structure (make_packed_kernel): for an output
        # phase pair a (lanes [a*128,(a+1)*128)), only ~9 of the dense 36
        # (tap x input-phase) blocks are nonzero, and at each tap the live
        # input phases form contiguous 64-lane runs. Each run is one
        # int8 dot — SUM K = 768 per pair vs 2304 dense: ~2x less MXU time
        # for identical results (the zeros contributed nothing).
        half = c_mid // 2
        cg = c_mid // 4
        m = None
        for a, dots in enumerate(zero_free):
            acc = None
            koff = 0
            for (r, c, lo, hi) in dots:
                xs = s_mid[r : r + ht, c : c + wb, lo:hi]
                w = w2_ref[a, koff : koff + hi - lo, :]
                d = jax.lax.dot_general(
                    xs, w, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = d if acc is None else acc + d
                koff += hi - lo
            y = (
                acc.astype(jnp.float32) * k2_ref[0, a * half : (a + 1) * half]
                + kb2_ref[0, a * half : (a + 1) * half]
            )
            ym = jnp.maximum(y[..., 0:cg], y[..., cg : 2 * cg])
            m = ym if m is None else jnp.maximum(m, ym)
        out_ref[0] = jnp.clip(jnp.rint(m), 0.0, 127.0).astype(jnp.int8)
        return
    acc2 = _conv3x3_taps(s_mid, ht, wb, w2_ref)

    if dequant_out:
        # dequant epilogue (decoder tail: no relu, no requant)
        y = acc2.astype(jnp.float32) * k2_ref[0] + kb2_ref[0]
        out_ref[0] = y.astype(out_ref.dtype)
    else:
        if pool_groups > 1:
            # phase max == 2x2/2 maxpool of the original plane
            # (vgg_fast.phase_max). Taken in f32 BEFORE the requant: rint
            # and clip are monotone, so max-then-quantize == the unfused
            # quantize-then-max bit-exactly — and Mosaic cannot legalize a
            # signed int8 max (arith.maxsi) anyway.
            y = acc2.astype(jnp.float32) * k2_ref[0] + kb2_ref[0]
            cg = c_mid // pool_groups
            m = y[..., 0:cg]
            for g in range(1, pool_groups):
                m = jnp.maximum(m, y[..., g * cg : (g + 1) * cg])
            out_ref[0] = jnp.clip(jnp.rint(m), 0.0, 127.0).astype(jnp.int8)
        else:
            out_ref[0] = _requant_i8(acc2, k2_ref[0], kb2_ref[0], relu=True)


def _axis_items(a: int):
    """(packed tap index, input phase) pairs along one axis for output
    phase ``a`` of a 2x2-packed 3x3 conv (make_packed_kernel geometry):
    original tap d maps to packed tap (a+d-1)//2 + 1, input phase
    (a+d-1) % 2."""
    items = []
    for d in range(3):
        r = a + d - 1
        items.append((r // 2 + 1, r % 2))
    return items


def zero_free_dots(cg: int = 64):
    """Static dot tables for the zero-free packed conv: for each output
    phase-pair a in {0, 1}, a list of (tapR, tapC, lane_lo, lane_hi) whose
    input phases at that tap form contiguous ``cg``-lane runs. Sum of K
    over each list is 12*cg (vs 36*cg dense)."""
    col_items = set(_axis_items(0)) | set(_axis_items(1))
    tables = []
    for a in (0, 1):
        row_items = set(_axis_items(a))
        dots = []
        for r_tap in (0, 1, 2):
            ars = sorted({ar for (t, ar) in row_items if t == r_tap})
            if not ars:
                continue
            for c_tap in (0, 1, 2):
                acs = sorted({ac for (t, ac) in col_items if t == c_tap})
                if not acs:
                    continue
                phases = sorted(ar * 2 + ac for ar in ars for ac in acs)
                # contiguous runs -> lane ranges
                run = [phases[0]]
                for p in phases[1:]:
                    if p == run[-1] + 1:
                        run.append(p)
                    else:
                        dots.append((r_tap, c_tap, run[0] * cg, (run[-1] + 1) * cg))
                        run = [p]
                dots.append((r_tap, c_tap, run[0] * cg, (run[-1] + 1) * cg))
        tables.append(tuple(dots))
    return tuple(tables)


def zero_free_weights(wq2: Array, dots) -> Array:
    """Packed conv kernel (3,3,4cg,4cg) int8 -> (2, 12cg, 2cg): the
    per-phase-pair concatenated nonzero blocks, K-major in dot order
    (traceable; all indices static)."""
    cout_half = wq2.shape[3] // 2
    mats = []
    for a, table in enumerate(dots):
        blocks = [
            wq2[r, c, lo:hi, a * cout_half : (a + 1) * cout_half]
            for (r, c, lo, hi) in table
        ]
        mats.append(jnp.concatenate(blocks, axis=0))
    return jnp.stack(mats)


def _taps(wq: Array) -> Array:
    """(3, 3, Cin, Cout) int8 -> tap-major (9, Cin, Cout)."""
    k3, k3b, cin, cout = wq.shape
    assert (k3, k3b) == (3, 3), wq.shape
    return wq.reshape(9, cin, cout)


@functools.partial(
    jax.jit,
    static_argnames=("ht", "pool_groups", "out_dtype", "relu2", "interpret", "k_slice", "zero_free"),
)
def fused_two_conv(
    x: Array,
    wq1: Array, k1: Array, kb1: Array,
    wq2: Array, k2: Array, kb2: Array,
    *,
    ht: int = 16,
    pool_groups: int = 1,
    out_dtype=jnp.int8,
    relu2: bool = True,
    interpret: bool = False,
    k_slice: bool = True,
    zero_free: bool = False,
) -> Array:
    """Two chained edge-padded 3x3 int8 convs (+optional phase-max pool /
    dequant tail) in one Pallas kernel.

    x: (N, Hb, Wb, Cin) int8 (unpadded; this wrapper applies the edge pads).
    wq*: (3,3,Cin,Cout) int8; k*/kb*: (Cout,) f32 epilogue scales.
    out_dtype=int8 -> both convs requant (relu); pool_groups>1 applies the
    phase max after conv2. out_dtype=bfloat16/float32 -> conv2 dequantizes
    (no relu, decoder tail semantics).

    Alignment: Mosaic only DMA-slices tiled HBM layouts on (8, 128)-tile
    boundaries, so the input is padded to 128 lanes, its width to a multiple
    of 8, and row slabs are ht+8 at 8-aligned starts (ht must be a multiple
    of 8). k_slice=True contracts only the first Cin lanes in-kernel;
    k_slice=False zero-pads the first conv's kernel to 128 input channels
    instead (more MACs, no lane slicing).
    """
    n, hb, wb, c_in = x.shape
    if hb % ht or ht % 8:
        raise ValueError(f"H={hb} / row tile {ht}: need ht % 8 == 0 and H % ht == 0")
    c_mid = wq1.shape[3]
    c_out2 = wq2.shape[3]
    out_dtype = jnp.dtype(out_dtype)
    is_f = out_dtype != jnp.int8
    if is_f and (pool_groups != 1 or relu2):
        raise ValueError("float output implies decoder tail (no pool/relu)")
    c_out = c_out2 if is_f else c_out2 // pool_groups
    n_tiles = hb // ht

    # conv pads: 2 rows top (tile halo; boundary rows fixed in-kernel),
    # 1 col left. DMA-alignment pads: bottom rows to Hb+8, right cols to a
    # multiple of 8, lanes to 128 (zeros; never contracted when k_slice).
    wpad = -(-(wb + 2) // 8) * 8
    cpad = max(-(-c_in // 128) * 128, 128)
    xpad = jnp.pad(
        x, ((0, 0), (2, 6), (1, wpad - wb - 1), (0, 0)), mode="edge"
    )
    if cpad != c_in:
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, 0), (0, cpad - c_in)))

    if zero_free and (pool_groups != 4 or is_f or c_out2 != c_mid):
        raise ValueError("zero_free applies to the packed conv+phase-max stage")
    zf_dots = zero_free_dots(c_mid // 4) if zero_free else None
    w2 = zero_free_weights(wq2, zf_dots) if zero_free else _taps(wq2)

    w1 = _taps(wq1)
    if not k_slice and cpad != c_in:
        w1 = jnp.concatenate(
            [w1, jnp.zeros((9, cpad - c_in, c_mid), w1.dtype)], axis=1
        )
    c_w1 = c_in if k_slice else cpad

    kernel = functools.partial(
        _fused_two_conv_kernel,
        ht=ht, wb=wb, n_tiles=n_tiles, c_in=c_in, c_mid=c_mid,
        pool_groups=pool_groups,
        dequant_out=is_f,
        k_slice=k_slice,
        zero_free=zf_dots,
    )

    vec = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)

    return pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x: manual DMA
            pl.BlockSpec((9, c_w1, c_mid), lambda n, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_mid), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_mid), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(w2.shape), lambda n, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out2), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out2), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ht, wb, c_out), lambda n, t: (n, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hb, wb, c_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((ht + 8, wpad, cpad), jnp.int8),     # input slab
            pltpu.VMEM((ht + 2, wb + 2, c_mid), jnp.int8),  # padded mid
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xpad, w1, vec(k1), vec(kb1), w2, vec(k2), vec(kb2))


def encoder_level1(xq_packed: Array, q1, q2, *, ht: int = 16,
                   interpret: bool = False, zero_free: bool = True) -> Array:
    """Packed quantized input (N, H/2, W/2, 12) int8 -> pool1 (N, H/2, W/2, 64)
    int8: conv1_1 + conv1_2 (packed space, edge pad == original reflect pad)
    + phase-max pool in one kernel. q1/q2: vgg_fast.QConvS for the packed
    conv1_1 / conv1_2."""
    return fused_two_conv(
        xq_packed, q1.wq, q1.k, q1.kb, q2.wq, q2.k, q2.kb,
        ht=ht, pool_groups=4, out_dtype=jnp.int8, interpret=interpret,
        zero_free=zero_free,
    )


def decoder_level1(yq: Array, q2, q1, *, ht: int = 16,
                   out_dtype=jnp.bfloat16, interpret: bool = False) -> Array:
    """dconv2_1 output (N, H/2, W/2, 64) int8 -> packed image
    (N, H/2, W/2, 12) bf16: upsample-folded dconv1_2 + dconv1_1 + dequant in
    one kernel (unpack stays in XLA — it is a pure layout op on a tiny
    tensor). q2/q1: QConvS for dconv1_2 (folded) / dconv1_1 (packed)."""
    return fused_two_conv(
        yq, q2.wq, q2.k, q2.kb, q1.wq, q1.k, q1.kb,
        ht=ht, pool_groups=1, out_dtype=out_dtype, relu2=False,
        interpret=interpret,
    )
