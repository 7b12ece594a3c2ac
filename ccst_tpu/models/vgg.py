"""VGG-19 (normalised) encoder through relu4_1 and its mirror decoder.

TPU-native re-design of the AdaIN encoder/decoder pair the reference defines
as torch ``nn.Sequential`` stacks (style_transfer/AdaIN/net.py:6-92). The
architecture is expressed once as a declarative spec and interpreted by a
functional ``apply``:

  - NHWC layout; convs are ``lax.conv_general_dilated`` with explicit
    reflection padding (torch ``ReflectionPad2d`` parity).
  - Max pools are 2x2/stride-2 **ceil-mode** (net.py:46,53,66): expressed as
    ``lax.reduce_window`` with trailing edge padding of -inf when H or W is
    odd — bit-identical to torch's ceil_mode for these shapes.
  - Upsampling is nearest-neighbor 2x (net.py:10,23,30).
  - Compute dtype is configurable (bfloat16 by default on TPU) with float32
    conv accumulation via ``preferred_element_type``; parity tests run fp32.

The encoder stops at relu4_1, matching the runtime truncation
``nn.Sequential(*list(vgg.children())[:31])``
(CCST_OverallStyleTransfer.py:124). Taps at relu{1..4}_1 are exposed for the
AdaIN training wrapper's style losses (net.py:112-117).

Weights: the reference downloads ``vgg_normalised.pth`` / ``decoder.pth``.
``ccst_tpu.models.convert`` maps those torch state dicts into this layout.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Dict[str, Array]]


class Conv(NamedTuple):
    name: str
    cin: int
    cout: int
    ksize: int = 3          # 3 => reflection-pad 1 then VALID; 1 => no pad
    relu: bool = True


class Pool(NamedTuple):     # ceil-mode 2x2 stride-2 max pool
    pass


class Upsample(NamedTuple): # nearest-neighbor 2x
    pass


class Tap(NamedTuple):      # marks a named intermediate output (after prev layer)
    name: str


# vgg_normalised through relu4_1 (net.py:38-69; children [:31]).
ENCODER_ARCH: Tuple = (
    Conv("conv0", 3, 3, ksize=1, relu=False),   # RGB rescale layer
    Conv("conv1_1", 3, 64), Tap("relu1_1"),
    Conv("conv1_2", 64, 64),
    Pool(),
    Conv("conv2_1", 64, 128), Tap("relu2_1"),
    Conv("conv2_2", 128, 128),
    Pool(),
    Conv("conv3_1", 128, 256), Tap("relu3_1"),
    Conv("conv3_2", 256, 256),
    Conv("conv3_3", 256, 256),
    Conv("conv3_4", 256, 256),
    Pool(),
    Conv("conv4_1", 256, 512), Tap("relu4_1"),
)

# Mirror decoder (net.py:6-36); final conv has no activation.
DECODER_ARCH: Tuple = (
    Conv("dconv4_1", 512, 256),
    Upsample(),
    Conv("dconv3_4", 256, 256),
    Conv("dconv3_3", 256, 256),
    Conv("dconv3_2", 256, 256),
    Conv("dconv3_1", 256, 128),
    Upsample(),
    Conv("dconv2_2", 128, 128),
    Conv("dconv2_1", 128, 64),
    Upsample(),
    Conv("dconv1_2", 64, 64),
    Conv("dconv1_1", 64, 3, relu=False),
)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def reflect_pad(x: Array, pad: int = 1) -> Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv2d(
    x: Array, w: Array, b: Array, *, accum_dtype=jnp.float32, padding="VALID"
) -> Array:
    """Conv with fp32 accumulation, output cast back to x.dtype."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=_DN,
        preferred_element_type=accum_dtype,
    )
    out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


def reflect_conv3x3(x: Array, w: Array, b: Array) -> Array:
    """Reflection-padded 3x3 conv without materializing the padded tensor.

    NOTE — measured NEGATIVE result on v5e, kept for documentation: explicit
    ``jnp.pad(mode='reflect')`` copies cost ~26% of the stylize step
    (4.00 -> 2.95 ms/img with implicit zero padding), and since an implicit
    SAME conv matches the reflect conv everywhere except the 1-px border,
    this function repairs only the border with thin strip convs. But XLA
    lowers the four ``.at[].set`` border writes to full-tensor copies, so
    the "optimization" measures 128 img/s vs 245 img/s for plain pad+conv.
    The production path therefore uses pad+conv; closing the remaining pad
    overhead needs a fused Pallas conv, not graph surgery.
    Semantics are exactly torch ``ReflectionPad2d((1,1,1,1)) + Conv2d(k=3)``
    (reference net.py:6-92) — covered by parity tests.
    """
    n, h, w_dim, _ = x.shape
    if h < 3 or w_dim < 3:
        return conv2d(reflect_pad(x, 1), w, b)
    y = conv2d(x, w, b, padding=((1, 1), (1, 1)))

    def strip_rows(rows: Array) -> Array:
        # rows: (N, 3, W, C) already row-complete; reflect-pad columns only
        padded = jnp.pad(rows, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
        return conv2d(padded, w, b)  # (N, 1, W, C)

    top = strip_rows(x[:, jnp.array([1, 0, 1]), :, :])
    bottom = strip_rows(x[:, jnp.array([h - 2, h - 1, h - 2]), :, :])

    def strip_cols(cols: Array) -> Array:
        # cols: (N, H, 3, C); reflect-pad rows only
        padded = jnp.pad(cols, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
        return conv2d(padded, w, b)  # (N, H, 1, C)

    left = strip_cols(x[:, :, jnp.array([1, 0, 1]), :])
    right = strip_cols(x[:, :, jnp.array([w_dim - 2, w_dim - 1, w_dim - 2]), :])

    y = y.at[:, 0:1, :, :].set(top)
    y = y.at[:, h - 1 : h, :, :].set(bottom)
    y = y.at[:, :, 0:1, :].set(left)
    y = y.at[:, :, w_dim - 1 : w_dim, :].set(right)
    # corners: the column strips used zero-row-padding-free full rows, but
    # their own row reflection uses x rows, so the four corner pixels from
    # left/right strips are already the exact reflect-conv values; top/bottom
    # strips likewise agree (both reduce to the same reflected 3x3 windows).
    return y


def maxpool_ceil(x: Array) -> Array:
    """2x2/2 max pool with ceil_mode=True (trailing -inf padding on odd dims).

    Implemented as pad + reshape + max (differentiable; XLA lowers it to the
    same windowed reduction).
    """
    n, h, w, c = x.shape
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        # identity of max: -inf for floats, INT_MIN for int8 (the quantized
        # engine pools in the integer domain — max commutes with the
        # monotone dequantization)
        if jnp.issubdtype(x.dtype, jnp.integer):
            neg_inf = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
        else:
            neg_inf = jnp.asarray(-jnp.inf, x.dtype)
        x = jnp.pad(
            x,
            ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
            constant_values=neg_inf,
        )
        h, w = h + pad_h, w + pad_w
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def upsample_nearest2x(x: Array) -> Array:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def upsample_reflect_conv3x3(x: Array, w: Array, b: Array) -> Array:
    """Fused ``conv3x3(reflect_pad(nearest_upsample_2x(x)))`` via polyphase
    decomposition — exact algebra, no upsampled tensor.

    With nearest-2x, every 3x3 window over the upsampled plane touches only
    a 2x2 neighborhood of ``x``, with kernel taps grouped by output parity:
    row taps for even outputs are [w0, w1+w2] over x rows [i-1, i] and for
    odd outputs [w0+w1, w2] over rows [i, i+1] (columns likewise). Reflect
    padding on the upsampled plane reduces to EDGE padding on ``x`` (the
    reflected halo row equals upsampled row 1 = x row 0). So: one edge-pad
    of the small tensor, four 2x2 convs (4/9 of the FLOPs of the 3x3 on the
    upsampled plane), and a parity interleave. Replaces the decoder's three
    upsample+conv pairs (net.py:10-12, 23-25, 30-32) bit-for-fp-tolerance
    identically; covered by parity tests.

    MEASURED NEGATIVE RESULT on v5e (kept for documentation, NOT wired into
    the production path): despite 4/9 the MACs, the full-pipeline rate DROPS
    from 447 to 280 img/s — the four 2x2 convs re-read the input 4x with a
    weaker contraction dim (4*Cin vs 9*Cin), and the parity-interleave
    transpose relayouts the full-size output. XLA's upsample+conv graph wins.
    """
    n, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    wf = w.astype(jnp.float32)
    # tap regroupings: G0 = rows {0} then {1,2}; G1 = rows {0,1} then {2}
    row_g = {
        0: (wf[0:1], wf[1:2] + wf[2:3]),          # each (1, 3, Cin, Cout)
        1: (wf[0:1] + wf[1:2], wf[2:3]),
    }

    def col_group(k3: Array, parity: int) -> Array:
        # k3: (2, 3, Cin, Cout) -> (2, 2, Cin, Cout)
        if parity == 0:
            return jnp.stack([k3[:, 0], k3[:, 1] + k3[:, 2]], axis=1)
        return jnp.stack([k3[:, 0] + k3[:, 1], k3[:, 2]], axis=1)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    phases = []
    for a in (0, 1):
        k_rows = jnp.concatenate(row_g[a], axis=0)     # (2, 3, Cin, Cout)
        for bp in (0, 1):
            k = col_group(k_rows, bp).astype(x.dtype)  # (2, 2, Cin, Cout)
            # output (i, j) phase (a, bp) consumes x rows [i-1+a, i+a] and
            # cols [j-1+bp, j+bp]; with the 1-px edge pad that is a VALID
            # 2x2 conv over xp offset by (a, bp)
            src = xp[:, a : a + h + 1, bp : bp + w_dim + 1, :]
            y = jax.lax.conv_general_dilated(
                src, k, (1, 1), "VALID", dimension_numbers=_DN,
                preferred_element_type=jnp.float32,
            )
            phases.append(y)
    # interleave phases: phases[a*2+b][i, j] -> out[2i+a, 2j+b]
    stacked = jnp.stack(phases, axis=0).reshape(2, 2, n, h, w_dim, cout)
    out = jnp.transpose(stacked, (2, 3, 0, 4, 1, 5)).reshape(
        n, 2 * h, 2 * w_dim, cout
    )
    out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Init / apply
# ---------------------------------------------------------------------------


def init_params(
    key: jax.Array, arch: Sequence, dtype=jnp.float32
) -> Params:
    """Kaiming-uniform init (torch Conv2d default) for a declarative arch.

    Runs on the CPU backend explicitly: each uniform draw is its own tiny
    program, and over a remote-compile tunnel ~26 cold per-layer compiles
    serialize into many minutes before any real work (measured: the
    style-bank CLI appeared hung behind a cold decoder init). The weights
    are host-side constants anyway — consumers device_put them.
    """
    convs = [l for l in arch if isinstance(l, Conv)]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return _init_params_on_default_device(key, convs, dtype)


def _init_params_on_default_device(key, convs, dtype) -> Params:
    params: Params = {}
    keys = jax.random.split(key, len(convs))
    for k, layer in zip(keys, convs):
        fan_in = layer.cin * layer.ksize * layer.ksize
        # torch Conv2d default: kaiming_uniform(a=sqrt(5)) => bound = sqrt(1/fan_in)
        bound_w = math.sqrt(1.0 / fan_in)
        kw, kb = jax.random.split(k)
        w = jax.random.uniform(
            kw,
            (layer.ksize, layer.ksize, layer.cin, layer.cout),
            dtype,
            -bound_w,
            bound_w,
        )
        bound_b = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(kb, (layer.cout,), dtype, -bound_b, bound_b)
        params[layer.name] = {"w": w, "b": b}
    return params


def _apply(
    params: Params,
    x: Array,
    arch: Sequence,
    *,
    taps: Optional[Sequence[str]] = None,
    stop_at: Optional[str] = None,
) -> Tuple[Array, Dict[str, Array]]:
    collected: Dict[str, Array] = {}
    want = set(taps or ())
    for layer in arch:
        if isinstance(layer, Conv):
            p = params[layer.name]
            if layer.ksize == 3:
                x = reflect_pad(x, 1)
            x = conv2d(x, p["w"], p["b"])
            if layer.relu:
                x = jax.nn.relu(x)
        elif isinstance(layer, Pool):
            x = maxpool_ceil(x)
        elif isinstance(layer, Upsample):
            x = upsample_nearest2x(x)
        elif isinstance(layer, Tap):
            if layer.name in want:
                collected[layer.name] = x
            if stop_at is not None and layer.name == stop_at:
                return x, collected
        else:
            raise TypeError(f"unknown layer spec {layer!r}")
    return x, collected


def apply_encoder(params: Params, images: Array) -> Array:
    """Images (N, H, W, 3) -> relu4_1 features (N, H/8, W/8, 512).

    ``images`` are in [0, 1] RGB (the vgg_normalised conv0 layer handles the
    255-scaling/BGR-style rescale internally via its weights, matching the
    reference which feeds raw ToTensor output, cjm_util/data_helper.py:46-49).
    """
    out, _ = _apply(params, images, ENCODER_ARCH, stop_at="relu4_1")
    return out


def encoder_taps(params: Params, images: Array) -> Dict[str, Array]:
    """relu1_1..relu4_1 intermediate features, for AdaIN training losses."""
    names = ("relu1_1", "relu2_1", "relu3_1", "relu4_1")
    _, taps = _apply(params, images, ENCODER_ARCH, taps=names, stop_at="relu4_1")
    return taps


def apply_decoder(params: Params, feat: Array) -> Array:
    """relu4_1 features -> image (N, H*8, W*8, 3); raw output, no activation
    (clamped to [0,1] only at save time, like torchvision save_image)."""
    out, _ = _apply(params, feat, DECODER_ARCH)
    return out


def count_params(params: Params) -> int:
    return sum(int(np.prod(v["w"].shape)) + int(np.prod(v["b"].shape)) for v in params.values())
