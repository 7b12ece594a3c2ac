"""High-throughput execution engines for the AdaIN VGG encoder/decoder.

``ccst_tpu.models.vgg`` is the *reference* executor: one op per layer,
explicit reflect pads, <1e-3-MAE parity with the torch stack
(style_transfer/AdaIN/net.py:6-92). This module re-maps the same weights
onto faster TPU programs; it changes HOW the arithmetic runs, never WHAT it
computes (the bf16 packed engine is exact to fp tolerance; the int8 engine
is a quantized approximation with measured quality).

Two measured v5e facts drive the design (benchmarks/micro_conv.py):

1. **64-channel convs waste the MXU.** The two 512px 64->64 convs
   (conv1_2 / dconv1_2) reach only ~40 TF bf16 while 256-channel layers
   reach 165+ TF — 64 channels fill half the 128-wide lane tile, and the
   reflect-pad copy adds another ~28% on top (5.30 vs 3.80 ms at batch 8).
   Fix: compute the whole 512px stage in **packed (space-to-depth) form** —
   (H, W, C) -> (H/2, W/2, 4C) with phase-major channels — where the 3x3
   reflect-conv becomes a dense 3x3 conv over 4x wider channels. 4x the
   MACs, but at full-width MXU efficiency, and reflect padding of the
   original plane reduces *exactly* to EDGE padding of the packed plane
   (the kernel's zero structure never reads the out-of-range phase rows).
   Pool and nearest-upsample are free in packed space (phase-max /
   channel-tile).

2. **int8 convs run ~3x faster than bf16** at the 128-512 channel layers
   (0.30 vs 0.94 ms at 128px/256ch) — the MXU int8 path is real for convs.
   The int8 engine quantizes weights per-output-channel (symmetric int8)
   and activations per-tensor dynamically, pads the *quantized* tensors
   (reflect semantics preserved), accumulates int32, and dequantizes into
   the bias+ReLU epilogue.

Parity: packed-bf16 is covered by exact-equality tests vs ``vgg.apply_*``;
int8 by PSNR bounds (tests/test_vgg_fast.py).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.models import vgg

Array = jax.Array

_DN = ("NHWC", "HWIO", "NHWC")

# layers computed in packed space (the 512px level-1 stage at image res)
_PACKED_ENC = ("conv1_1", "conv1_2")
_PACKED_DEC = ("dconv1_2", "dconv1_1")


# ---------------------------------------------------------------------------
# packed (space-to-depth) primitives
# ---------------------------------------------------------------------------


def pack_s2d(x: Array) -> Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), phase-major channels
    (packed channel index = (row_phase*2 + col_phase) * C + c)."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"packed engine needs even H, W; got {h}x{w}")
    x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def unpack_d2s(xp: Array, c: int) -> Array:
    """Inverse of :func:`pack_s2d`."""
    n, hb, wb, _ = xp.shape
    x = xp.reshape(n, hb, wb, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hb * 2, wb * 2, c)


def make_packed_kernel(w: Array) -> np.ndarray:
    """(3, 3, Cin, Cout) conv kernel -> its packed-space equivalent
    (3, 3, 4Cin, 4Cout).

    Output phase (a, b) at packed position (i, j) is original position
    (2i+a, 2j+b); its 3x3 window touches original rows 2i+a-1 .. 2i+a+1,
    i.e. packed block rows (a-1)//2 .. (a+1)//2 relative to i. Each original
    tap (dy, dx) therefore lands at packed tap (R+1, C+1) on input phase
    (ar, ac) where a+dy-1 = 2R+ar (likewise columns). Taps outside a phase's
    2x2 effective window stay zero — which is what makes EDGE padding of the
    packed tensor equal to REFLECT padding of the original plane: the edge
    block's wrong-phase rows are only ever multiplied by those zeros, while
    its in-range phase rows hold exactly the reflected original rows.
    """
    wn = np.asarray(w, np.float32)
    cin, cout = wn.shape[2], wn.shape[3]
    K = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for dy in range(3):
                for dx in range(3):
                    r, c = a + dy - 1, b + dx - 1
                    R, ar = r // 2, r % 2
                    C, ac = c // 2, c % 2
                    K[
                        R + 1,
                        C + 1,
                        (ar * 2 + ac) * cin : (ar * 2 + ac + 1) * cin,
                        (a * 2 + b) * cout : (a * 2 + b + 1) * cout,
                    ] = wn[dy, dx]
    return K


def packed_reflect_conv(
    xp: Array, K: Array, b: Array, relu: bool = True
) -> Array:
    """Packed-space equivalent of reflect-pad + 3x3 conv + bias (+ReLU)."""
    xpe = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    acc = jax.lax.conv_general_dilated(
        xpe, K.astype(xp.dtype), (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    acc = acc + jnp.tile(b.astype(jnp.float32), 4)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.astype(xp.dtype)


def phase_max(xp: Array, c: int) -> Array:
    """2x2/2 max pool of the original plane == max over the 4 phases."""
    n, hb, wb, _ = xp.shape
    return jnp.max(xp.reshape(n, hb, wb, 4, c), axis=3)


def tile_as_upsample(x: Array) -> Array:
    """Packed representation of nearest-2x upsample: all 4 phases equal."""
    return jnp.tile(x, (1, 1, 1, 4))


def sum_input_phases(K: np.ndarray, cin: int) -> np.ndarray:
    """Fold a nearest-2x upsample INTO a packed kernel.

    A packed conv computes sum_p K[:, :, p*cin:(p+1)*cin, :] @ x_phase_p.
    When the packed input is an upsample, every phase equals the small
    tensor y, so the phase groups sum: (3,3,4*cin,4*cout) -> (3,3,cin,4*cout)
    applied directly to y — 4x fewer MACs than the dense packed conv, no
    channel-tile materialization, exact."""
    k = np.asarray(K, np.float32)
    return sum(
        k[:, :, p * cin : (p + 1) * cin, :] for p in range(4)
    )


# ---------------------------------------------------------------------------
# bf16 packed engine (exact)
# ---------------------------------------------------------------------------


def _packed_kernel_for(name: str, w: Array) -> np.ndarray:
    """Packed kernel for layer ``name``; dconv1_2 consumes a nearest-2x
    upsample, so its upsample folds into the kernel (sum_input_phases)."""
    K = make_packed_kernel(w)
    if name == "dconv1_2":
        K = sum_input_phases(K, np.shape(w)[2])
    return K


def _prepare_packed(params: vgg.Params, names: Sequence[str]) -> Dict[str, Dict[str, Array]]:
    out = {}
    for name, p in params.items():
        if name in names:
            out[name] = {
                "K": jnp.asarray(_packed_kernel_for(name, p["w"])),
                "b": p["b"],
            }
        else:
            out[name] = p
    return out


def prepare_encoder(params: vgg.Params) -> Dict:
    return _prepare_packed(params, _PACKED_ENC)


def prepare_decoder(params: vgg.Params) -> Dict:
    return _prepare_packed(params, _PACKED_DEC)


def apply_encoder_packed(prep: Dict, images: Array, dtype=jnp.bfloat16) -> Array:
    """Images (N, H, W, 3) in [0,1] -> relu4_1 features. Exact equivalent of
    ``vgg.apply_encoder`` with the level-1 stage computed in packed space."""
    x = images.astype(dtype)
    p0 = prep["conv0"]
    x = vgg.conv2d(x, p0["w"], p0["b"])  # 1x1 RGB rescale, no relu
    xp = pack_s2d(x)  # (N, H/2, W/2, 12)
    xp = packed_reflect_conv(xp, prep["conv1_1"]["K"], prep["conv1_1"]["b"])
    xp = packed_reflect_conv(xp, prep["conv1_2"]["K"], prep["conv1_2"]["b"])
    x = phase_max(xp, 64)  # pool1 -> (N, H/2, W/2, 64)
    # remaining layers follow the reference executor exactly
    pools_seen = 0
    for layer in vgg.ENCODER_ARCH:
        if isinstance(layer, vgg.Conv) and layer.name not in (
            "conv0", *_PACKED_ENC
        ):
            p = prep[layer.name]
            x = vgg.conv2d(vgg.reflect_pad(x, 1), p["w"], p["b"])
            if layer.relu:
                x = jax.nn.relu(x)
            if layer.name == "conv4_1":
                return x
        elif isinstance(layer, vgg.Pool):
            # pool 1 was already applied in packed space (phase_max)
            pools_seen += 1
            if pools_seen > 1:
                x = vgg.maxpool_ceil(x)
    return x


def _dec_mid_layers():
    """Decoder layers up to (not incl.) the packed level-1 stage."""
    out = []
    for layer in vgg.DECODER_ARCH:
        if isinstance(layer, vgg.Conv) and layer.name in _PACKED_DEC:
            break
        out.append(layer)
    # drop the trailing Upsample before dconv1_2 (folded into packed tile)
    assert isinstance(out[-1], vgg.Upsample)
    return tuple(out[:-1])


_DEC_MID = None  # materialized lazily (vgg.DECODER_ARCH is import-order safe)


def apply_decoder_packed(prep: Dict, feat: Array, dtype=jnp.bfloat16) -> Array:
    """relu4_1 features -> image; exact equivalent of ``vgg.apply_decoder``
    with the final upsample + dconv1_2 + dconv1_1 computed in packed space."""
    global _DEC_MID
    if _DEC_MID is None:
        _DEC_MID = _dec_mid_layers()
    x = feat.astype(dtype)
    for layer in _DEC_MID:
        if isinstance(layer, vgg.Conv):
            p = prep[layer.name]
            x = vgg.conv2d(vgg.reflect_pad(x, 1), p["w"], p["b"])
            if layer.relu:
                x = jax.nn.relu(x)
        elif isinstance(layer, vgg.Upsample):
            x = vgg.upsample_nearest2x(x)
    # upsample folded into dconv1_2's summed kernel: conv the SMALL tensor
    xp = packed_reflect_conv(x, prep["dconv1_2"]["K"], prep["dconv1_2"]["b"])
    xp = packed_reflect_conv(
        xp, prep["dconv1_1"]["K"], prep["dconv1_1"]["b"], relu=False
    )
    return unpack_d2s(xp, 3)


# ---------------------------------------------------------------------------
# int8 engine (quantized)
# ---------------------------------------------------------------------------


class QConv(NamedTuple):
    wq: Array          # int8 kernel (HWIO; packed layers use the packed kernel)
    w_scale: Array     # fp32 dequant scale — (Cout,) or (4*Cout,) when packed
    b: Array           # (Cout,) fp32 bias
    packed: bool


def _quantize_kernel(w: np.ndarray) -> Tuple[Array, Array]:
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0 + 1e-30
    wq = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(wq), jnp.asarray(scale, jnp.float32)


def _quantize_act(x: Array) -> Tuple[Array, Array]:
    s = jnp.max(jnp.abs(x).astype(jnp.float32)) / 127.0 + 1e-30
    xq = jnp.clip(jnp.rint(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return xq, s


def _qconv_apply(
    x: Array, q: QConv, relu: bool, out_dtype, pad_mode: str
) -> Array:
    xq, a_scale = _quantize_act(x)
    xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=pad_mode)
    acc = jax.lax.conv_general_dilated(
        xq, q.wq, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    scale = q.w_scale * a_scale
    bias = q.b.astype(jnp.float32)
    if q.packed:  # packed kernels carry per-packed-channel scales already
        bias = jnp.tile(bias, 4)
    y = acc.astype(jnp.float32) * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


def _prepare_q8(params: vgg.Params, packed_names: Sequence[str]) -> Dict[str, Any]:
    prep: Dict[str, Any] = {}
    for name, p in params.items():
        if name == "conv0":
            prep[name] = p  # 1x1 RGB rescale stays bf16 (3 channels, cheap)
            continue
        packed = name in packed_names
        wq, ws = _quantize_kernel(
            _packed_kernel_for(name, p["w"]) if packed
            else np.asarray(p["w"], np.float32)
        )
        prep[name] = QConv(wq, ws, p["b"], packed)
    return prep


def prepare_encoder_q8(params: vgg.Params) -> Dict[str, Any]:
    return _prepare_q8(params, _PACKED_ENC)


def prepare_decoder_q8(params: vgg.Params) -> Dict[str, Any]:
    return _prepare_q8(params, _PACKED_DEC)


def apply_encoder_q8(prep: Dict, images: Array, dtype=jnp.bfloat16) -> Array:
    x = images.astype(dtype)
    p0 = prep["conv0"]
    x = vgg.conv2d(x, p0["w"], p0["b"])
    xp = pack_s2d(x)
    xp = _qconv_apply(xp, prep["conv1_1"], True, dtype, "edge")
    xp = _qconv_apply(xp, prep["conv1_2"], True, dtype, "edge")
    x = phase_max(xp, 64)
    pools_seen = 0
    for layer in vgg.ENCODER_ARCH:
        if isinstance(layer, vgg.Conv) and layer.name not in (
            "conv0", *_PACKED_ENC
        ):
            x = _qconv_apply(x, prep[layer.name], layer.relu, dtype, "reflect")
            if layer.name == "conv4_1":
                return x
        elif isinstance(layer, vgg.Pool):
            pools_seen += 1
            if pools_seen > 1:
                x = vgg.maxpool_ceil(x)
    return x


def apply_decoder_q8(prep: Dict, feat: Array, dtype=jnp.bfloat16) -> Array:
    global _DEC_MID
    if _DEC_MID is None:
        _DEC_MID = _dec_mid_layers()
    x = feat.astype(dtype)
    for layer in _DEC_MID:
        if isinstance(layer, vgg.Conv):
            x = _qconv_apply(x, prep[layer.name], layer.relu, dtype, "reflect")
        elif isinstance(layer, vgg.Upsample):
            x = vgg.upsample_nearest2x(x)
    # upsample folded into dconv1_2's summed kernel (sum_input_phases)
    xp = _qconv_apply(x, prep["dconv1_2"], True, dtype, "edge")
    xp = _qconv_apply(xp, prep["dconv1_1"], False, dtype, "edge")
    return unpack_d2s(xp, 3)


# ---------------------------------------------------------------------------
# int8 end-to-end engine (static calibrated scales)
# ---------------------------------------------------------------------------
#
# The dynamic-scale engine above is HBM-bound at 512px: every layer
# materializes a ~1 GB bf16 tensor, re-reads it to find max|x|, re-reads it
# to quantize, and pads — ~4x the steady-state traffic of the conv itself
# (measured, benchmarks/prefix_profile.py). With *static* per-layer input
# scales (one calibration pass), requantization folds into the conv
# epilogue: acc_i32 * k[c] + kb[c] -> rint -> clip -> int8, which XLA fuses
# onto the conv output. Activations then stay int8 across layers; ReLU folds
# into the clip lower bound; pool / nearest-upsample / packing are
# scale-preserving permutations or maxima and run on int8 directly.


class QConvS(NamedTuple):
    wq: Array        # int8 kernel (packed layers: packed kernel)
    k: Array         # f32 per-out-channel multiplier (in_s * w_s [/ out_s])
    kb: Array        # f32 per-out-channel additive term (bias [/ out_s])
    packed: bool
    requant: bool    # True -> int8 output; False -> bf16/f32 output


def _qconv_s(x_q: Array, q: QConvS, relu: bool, out_dtype, pad_mode: str) -> Array:
    xq = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=pad_mode)
    acc = jax.lax.conv_general_dilated(
        xq, q.wq, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * q.k + q.kb
    if not q.requant:
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(out_dtype)
    lo = 0.0 if relu else -127.0  # ReLU folds into the clip lower bound
    return jnp.clip(jnp.rint(y), lo, 127.0).astype(jnp.int8)


def quantize_static(x: Array, scale: float) -> Array:
    return jnp.clip(
        jnp.rint(x.astype(jnp.float32) * (1.0 / scale)), -127, 127
    ).astype(jnp.int8)


def calibrate_scales(
    enc_params: vgg.Params,
    dec_params: vgg.Params,
    images: Array,
    style_stats: Optional[Sequence[Tuple[Array, Array]]] = None,
    alpha: float = 1.0,
) -> Dict[str, float]:
    """One reference-path forward over a calibration batch (and style bank),
    recording max|input| of every conv. Keyed by the conv whose INPUT the
    scale quantizes; scales are per-tensor, weights stay per-channel.
    Packing is a permutation, so calibrating on the unpacked path is exact
    for the packed layers too.

    The whole pass runs as ONE jitted program (the original eager version
    dispatched ~27 separately-compiled layer programs — minutes of compile
    over a remote-compile tunnel for a one-off calibration)."""
    from ccst_tpu.ops.adain import adain_from_stats, alpha_blend

    if not style_stats:  # None or empty: unit-stats fallback
        c = enc_params["conv4_1"]["b"].shape[0]
        style_stats = [(jnp.zeros((c,)), jnp.ones((c,)))]
    stats_arr = (
        jnp.stack([jnp.asarray(m, jnp.float32) for m, _ in style_stats]),
        jnp.stack([jnp.asarray(s, jnp.float32) for _, s in style_stats]),
    )

    @jax.jit
    def _pass(images, stats):
        scales: Dict[str, Array] = {}

        def rec(name, x):
            m = jnp.max(jnp.abs(x))
            scales[name] = jnp.maximum(scales.get(name, 0.0), m)

        x = images.astype(jnp.float32)
        for layer in vgg.ENCODER_ARCH:
            if isinstance(layer, vgg.Conv):
                if layer.name != "conv0":
                    rec(layer.name, x)
                    x = vgg.conv2d(vgg.reflect_pad(x, 1),
                                   enc_params[layer.name]["w"],
                                   enc_params[layer.name]["b"])
                    if layer.relu:
                        x = jax.nn.relu(x)
                    if layer.name == "conv4_1":
                        break
                else:
                    x = vgg.conv2d(x, enc_params["conv0"]["w"], enc_params["conv0"]["b"])
            elif isinstance(layer, vgg.Pool):
                x = vgg.maxpool_ceil(x)
        feat = x

        def one_style(carry, ms):
            s_mean, s_std = ms
            t = adain_from_stats(feat, s_mean, s_std)
            t = alpha_blend(t, feat, jnp.asarray(alpha, t.dtype))
            y = t
            upd = {}
            for layer in vgg.DECODER_ARCH:
                if isinstance(layer, vgg.Conv):
                    upd[layer.name] = jnp.max(jnp.abs(y))
                    y = vgg.conv2d(vgg.reflect_pad(y, 1),
                                   dec_params[layer.name]["w"],
                                   dec_params[layer.name]["b"])
                    if layer.relu:
                        y = jax.nn.relu(y)
                elif isinstance(layer, vgg.Upsample):
                    y = vgg.upsample_nearest2x(y)
            return {k: jnp.maximum(carry[k], v) for k, v in upd.items()}, 0.0

        dec_names = [
            l.name for l in vgg.DECODER_ARCH if isinstance(l, vgg.Conv)
        ]
        init = {k: jnp.asarray(0.0, jnp.float32) for k in dec_names}
        dec_scales, _ = jax.lax.scan(one_style, init, stats)
        scales.update(dec_scales)
        return scales

    return {k: float(v) for k, v in _pass(images, stats_arr).items()}


def weights_fingerprint(enc_params, dec_params) -> str:
    """Cheap stable fingerprint of the (encoder, decoder) weight pair.

    Stored inside the scales artifact so a persisted calibration is never
    silently applied to DIFFERENT weights (e.g. a retrained decoder):
    activation-clipping ranges are weight-specific, and a stale artifact
    would quietly degrade int8 quality. Per net: the plain and the
    layer-position-weighted sum of |w| over EVERY conv (so a change to any
    single layer — middle layers included — moves the fingerprint), computed
    over the bfloat16-cast weights (the engine stores bf16, so the
    fingerprint must not depend on whether the caller holds fp32 or bf16
    copies), accumulated in float32, rounded to 4 significant digits."""
    import jax.numpy as _jnp

    def net_sig(params):
        total = weighted = probe = 0.0
        for i, name in enumerate(sorted(params)):
            w = _jnp.asarray(params[name]["w"], _jnp.bfloat16).astype(
                _jnp.float32
            )
            si = float(f"{float(_jnp.sum(_jnp.abs(w))):.4g}")
            total += si
            weighted += (i + 1) * si
            # raw mid-element probe: |w| sums concentrate hard for random
            # inits of the same shapes (relative spread ~1/sqrt(n)), so two
            # re-inits could collide at 4 digits; an actual element value
            # distinguishes them outright
            probe += (i + 1) * float(w.reshape(-1)[w.size // 2])
        return total, weighted, probe

    parts = [*net_sig(enc_params), *net_sig(dec_params)]
    return ",".join(f"{v:.4g}" for v in parts)


def save_scales(
    path: str, scales: Dict[str, float], fingerprint: str = ""
) -> str:
    """Persist int8-static calibration scales (plain JSON: conv name ->
    max|input| as float; exact double round-trip, so a reloaded engine is
    bit-identical to the one that calibrated). Determinism closure for the
    int8-static engine: without this, scales depend on whichever batch
    arrives first (SURVEY §4 determinism stance). ``fingerprint``
    (:func:`weights_fingerprint`) ties the artifact to its weights."""
    import json as _json
    import os as _os

    _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
    payload = {"format": "ccst_tpu/q8s_scales/v1", "scales": scales}
    if fingerprint:
        payload["weights_fingerprint"] = fingerprint
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(payload, f, indent=2, sort_keys=True)
    _os.replace(tmp, path)
    return path


def load_scales(path: str, expect_fingerprint: str = "") -> Dict[str, float]:
    """Load scales written by :func:`save_scales`.

    When ``expect_fingerprint`` is given and the artifact carries a
    (different) fingerprint, raises ValueError — the calibration belongs to
    other weights. Artifacts without a fingerprint (older format) load
    unconditionally."""
    import json as _json

    with open(path) as f:
        obj = _json.load(f)
    if obj.get("format") != "ccst_tpu/q8s_scales/v1":
        raise ValueError(f"{path}: not a ccst_tpu q8s scales artifact")
    stored = obj.get("weights_fingerprint", "")
    if expect_fingerprint and stored and stored != expect_fingerprint:
        raise ValueError(
            f"{path}: calibration was made for different weights "
            f"(artifact fingerprint {stored!r} != current "
            f"{expect_fingerprint!r}); re-run `calibrate`"
        )
    return {k: float(v) for k, v in obj["scales"].items()}


_ENC_NEXT = {  # conv -> the conv consuming its output (requant target)
    "conv1_1": "conv1_2", "conv1_2": "conv2_1", "conv2_1": "conv2_2",
    "conv2_2": "conv3_1", "conv3_1": "conv3_2", "conv3_2": "conv3_3",
    "conv3_3": "conv3_4", "conv3_4": "conv4_1", "conv4_1": None,
}
_DEC_NEXT = {
    "dconv4_1": "dconv3_4", "dconv3_4": "dconv3_3", "dconv3_3": "dconv3_2",
    "dconv3_2": "dconv3_1", "dconv3_1": "dconv2_2", "dconv2_2": "dconv2_1",
    "dconv2_1": "dconv1_2", "dconv1_2": "dconv1_1", "dconv1_1": None,
}


def _prepare_q8s(
    params: vgg.Params, scales: Dict[str, float],
    next_map: Dict[str, Optional[str]], packed_names: Sequence[str],
) -> Dict[str, Any]:
    prep: Dict[str, Any] = {"__scales__": dict(scales)}
    for name, p in params.items():
        if name == "conv0":
            prep[name] = p
            continue
        packed = name in packed_names
        wq, ws = _quantize_kernel(
            _packed_kernel_for(name, p["w"]) if packed
            else np.asarray(p["w"], np.float32)
        )
        in_s = scales[name] / 127.0
        nxt = next_map[name]
        b = np.asarray(p["b"], np.float32)
        if packed:
            b = np.tile(b, 4)
        k = np.asarray(ws, np.float32) * in_s
        if nxt is None:  # dequantized output
            prep[name] = QConvS(wq, jnp.asarray(k), jnp.asarray(b), packed, False)
        else:
            out_s = scales[nxt] / 127.0
            prep[name] = QConvS(
                wq,
                jnp.asarray(k / out_s),
                jnp.asarray(b / out_s),
                packed,
                True,
            )
    return prep


def prepare_encoder_q8s(params: vgg.Params, scales: Dict[str, float]):
    return _prepare_q8s(params, scales, _ENC_NEXT, _PACKED_ENC)


def prepare_decoder_q8s(params: vgg.Params, scales: Dict[str, float]):
    return _prepare_q8s(params, scales, _DEC_NEXT, _PACKED_DEC)


def apply_encoder_q8s(prep: Dict, images: Array, dtype=jnp.bfloat16) -> Array:
    """int8-e2e encoder: quantize once after conv0, stay int8 until relu4_1."""
    x = images.astype(dtype)
    p0 = prep["conv0"]
    x = vgg.conv2d(x, p0["w"], p0["b"])
    xq = quantize_static(x, prep["__scales__"]["conv1_1"] / 127.0)
    xq = pack_s2d(xq)
    xq = _qconv_s(xq, prep["conv1_1"], True, dtype, "edge")
    xq = _qconv_s(xq, prep["conv1_2"], True, dtype, "edge")
    xq = phase_max(xq, 64)  # int8 max == max in the (shared-scale) int domain
    pools_seen = 0
    for layer in vgg.ENCODER_ARCH:
        if isinstance(layer, vgg.Conv) and layer.name not in ("conv0", *_PACKED_ENC):
            xq = _qconv_s(xq, prep[layer.name], layer.relu, dtype, "reflect")
            if layer.name == "conv4_1":
                return xq  # dequantized bf16 relu4_1 features
        elif isinstance(layer, vgg.Pool):
            pools_seen += 1
            if pools_seen > 1:
                xq = vgg.maxpool_ceil(xq)
    return xq


def apply_decoder_q8s(prep: Dict, feat: Array, dtype=jnp.bfloat16) -> Array:
    """int8-e2e decoder: quantize the AdaIN features once, stay int8 until
    the final image dequant."""
    global _DEC_MID
    if _DEC_MID is None:
        _DEC_MID = _dec_mid_layers()
    xq = quantize_static(feat, prep["__scales__"]["dconv4_1"] / 127.0)
    for layer in _DEC_MID:
        if isinstance(layer, vgg.Conv):
            xq = _qconv_s(xq, prep[layer.name], layer.relu, dtype, "reflect")
        elif isinstance(layer, vgg.Upsample):
            xq = vgg.upsample_nearest2x(xq)
    # upsample folded into dconv1_2's summed kernel (sum_input_phases)
    xq = _qconv_s(xq, prep["dconv1_2"], True, dtype, "edge")
    y = _qconv_s(xq, prep["dconv1_1"], False, dtype, "edge")
    return unpack_d2s(y, 3)


# ---------------------------------------------------------------------------
# int8-fused engine: int8-static with the level-1 stages in Pallas
# ---------------------------------------------------------------------------
#
# Same math as apply_*_q8s (bit-exact — the fused kernels reproduce the
# _qconv_s integer/float epilogue exactly; tests/test_kernels.py), but the
# level-1 conv pairs run as single Pallas kernels that keep the ~512 MB
# intermediates in VMEM (kernels/level1_pallas.py). Preparation is shared:
# prepare_*_q8s output feeds both.


def _auto_interpret(interpret):
    """Pallas TPU kernels need interpret mode on non-TPU backends (the CPU
    test mesh, debugging); resolve ``None`` to the backend default."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pick_ht(hb: int, ht: int) -> Optional[int]:
    """Row tile for the fused level-1 kernel: must divide the packed height
    and be a multiple of 8 (DMA tile alignment). None -> caller falls back
    to the unfused chain (odd sizes; production shapes always qualify)."""
    for t in (ht, 16, 8):
        if t % 8 == 0 and hb % t == 0:
            return t
    return None


def apply_encoder_q8s_fused(prep: Dict, images: Array, dtype=jnp.bfloat16,
                            *, ht: int = 16, interpret: Optional[bool] = None,
                            zero_free: bool = True) -> Array:
    """int8-e2e encoder with conv1_1+conv1_2+pool1 fused in Pallas."""
    from ccst_tpu.kernels import level1_pallas

    interpret = _auto_interpret(interpret)

    x = images.astype(dtype)
    ht_eff = _pick_ht(images.shape[1] // 2, ht)
    if ht_eff is None:
        return apply_encoder_q8s(prep, images, dtype)
    p0 = prep["conv0"]
    x = vgg.conv2d(x, p0["w"], p0["b"])
    xq = quantize_static(x, prep["__scales__"]["conv1_1"] / 127.0)
    xq = pack_s2d(xq)
    xq = level1_pallas.encoder_level1(
        xq, prep["conv1_1"], prep["conv1_2"], ht=ht_eff, interpret=interpret,
        zero_free=zero_free,
    )
    pools_seen = 1
    for layer in vgg.ENCODER_ARCH:
        if isinstance(layer, vgg.Conv) and layer.name not in ("conv0", *_PACKED_ENC):
            xq = _qconv_s(xq, prep[layer.name], layer.relu, dtype, "reflect")
            if layer.name == "conv4_1":
                return xq
        elif isinstance(layer, vgg.Pool):
            pools_seen += 1
            if pools_seen > 2:  # pool1 fused into the Pallas stage
                xq = vgg.maxpool_ceil(xq)
    return xq


def apply_decoder_q8s_fused(prep: Dict, feat: Array, dtype=jnp.bfloat16,
                            *, ht: int = 16, interpret: Optional[bool] = None) -> Array:
    """int8-e2e decoder with dconv1_2(folded)+dconv1_1 fused in Pallas."""
    from ccst_tpu.kernels import level1_pallas

    interpret = _auto_interpret(interpret)

    ht_eff = _pick_ht(feat.shape[1] * 4, ht)  # dconv2_1 output = 8x feat H
    if ht_eff is None:
        return apply_decoder_q8s(prep, feat, dtype)
    ht = ht_eff

    global _DEC_MID
    if _DEC_MID is None:
        _DEC_MID = _dec_mid_layers()
    xq = quantize_static(feat, prep["__scales__"]["dconv4_1"] / 127.0)
    for layer in _DEC_MID:
        if isinstance(layer, vgg.Conv):
            xq = _qconv_s(xq, prep[layer.name], layer.relu, dtype, "reflect")
        elif isinstance(layer, vgg.Upsample):
            xq = vgg.upsample_nearest2x(xq)
    y = level1_pallas.decoder_level1(
        xq, prep["dconv1_2"], prep["dconv1_1"], ht=ht,
        out_dtype=dtype, interpret=interpret,
    )
    return unpack_d2s(y, 3)
