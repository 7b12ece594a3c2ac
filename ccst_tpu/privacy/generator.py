"""Style-vector -> image generator for the privacy analysis.

The reference trains the vendored lucidrains lightweight-GAN ``Generator``
(reconstruct_img/lightweight_gan/lightweight_gan.py:515-628) to invert a
1024-d style vector (relu4_1 mean ‖ std — rebuttal_mapping.py:33-43,192)
back to the image. This is a TPU-idiomatic flax redesign of that
architecture family, keeping its two load-bearing ideas:

  - progressive nearest-2x upsampling with GLU-gated convs;
  - skip-layer excitation (SLE): low-resolution features gate
    high-resolution channels through a squeezed sigmoid branch.

Power-of-two output sizes (the upstream asserts this too,
lightweight_gan.py:530).
"""
from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _upsample2x(x: Array) -> Array:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class GLUConv(nn.Module):
    """conv -> norm-free GLU gate (lightweight-GAN's upsample block core)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Conv(self.features * 2, (3, 3), padding=1)(x)
        a, b = jnp.split(y, 2, axis=-1)
        return a * jax.nn.sigmoid(b)


class SLE(nn.Module):
    """Skip-layer excitation: squeeze `low` to 4x4, two convs, sigmoid-gate
    the high-res path's channels (lightweight_gan.py GlobalContext/SLE)."""

    features: int

    @nn.compact
    def __call__(self, low: Array, high: Array) -> Array:
        # AdaptiveAvgPool2d((4,4)) (lightweight_gan.py:773): `low` sits at a
        # power-of-two res divisible by 4, so adaptive = exact mean pooling.
        # (Also lowers to reduce_window instead of a gather-based resize —
        # the bilinear variant was implicated in a pathological remote
        # compile on the dev tunnel.)
        if low.shape[1] < 4 or low.shape[1] % 4:
            raise ValueError(
                f"SLE expects a low-res input divisible by 4, got {low.shape}"
            )
        k = low.shape[1] // 4
        s = low
        if k > 1:
            s = nn.avg_pool(s, (k, k), strides=(k, k))
        s = nn.Conv(self.features, (4, 4), padding="VALID")(s)  # -> 1x1
        s = nn.silu(s)
        s = nn.Conv(self.features, (1, 1))(s)
        gate = jax.nn.sigmoid(s)
        return high * gate


class LinearAttention(nn.Module):
    """Efficient attention at feature-map resolutions (the upstream's
    optional ``attn_res_layers`` blocks, lightweight_gan.py:257-316),
    redesigned TPU-first as two MXU-shaped einsum paths:

      - global *linear* attention: softmax(Q, axis=channel) .
        [softmax(K, axis=position)^T V] — O(N·d²), two batched matmuls,
        no N x N score matrix;
      - local window attention over 3x3 neighborhoods, with the neighbor
        axis materialized by ``conv_general_dilated_patches`` (static
        shapes, fuses with the surrounding convs under XLA).

    Outputs of the two paths are concatenated and projected, residual-added
    by the caller. Head dim stays a multiple of the 128-lane register width
    when ``dim_head`` is left at 64 with >=2 heads.
    """

    dim_head: int = 64
    heads: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        inner = self.dim_head * self.heads
        scale = self.dim_head ** -0.5

        def split_heads(t):  # (N,H,W,inner) -> (N*, heads, HW, dh)
            return t.reshape(n, h * w, self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        # global linear-attention path
        lq = split_heads(nn.Conv(inner, (1, 1), use_bias=False)(x))
        lk = split_heads(nn.Conv(inner, (1, 1), use_bias=False)(x))
        lv = split_heads(nn.Conv(inner, (1, 1), use_bias=False)(x))
        lq = jax.nn.softmax(lq, axis=-1) * scale
        lk = jax.nn.softmax(lk, axis=-2)
        ctx = jnp.einsum("nhpd,nhpe->nhde", lk, lv)
        lin = jnp.einsum("nhpd,nhde->nhpe", lq, ctx)
        lin = nn.gelu(lin.transpose(0, 2, 1, 3).reshape(n, h, w, inner))

        # local 3x3 window path
        q = split_heads(nn.Conv(inner, (1, 1), use_bias=False)(x)) * scale
        kv = nn.Conv(inner * 2, (1, 1), use_bias=False)(x)
        patches = jax.lax.conv_general_dilated_patches(
            kv, (3, 3), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (N,H,W, 2*inner*9) ordered channel-major then window
        patches = patches.reshape(n, h * w, inner * 2, 9)
        patches = patches.reshape(
            n, h * w, 2, self.heads, self.dim_head, 9
        ).transpose(2, 0, 3, 1, 5, 4)  # (2, N, heads, HW, 9, dh)
        k9, v9 = patches[0], patches[1]
        sim = jnp.einsum("nhpd,nhpjd->nhpj", q, k9)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        loc = jnp.einsum("nhpj,nhpjd->nhpd", attn, v9)
        loc = loc.transpose(0, 2, 1, 3).reshape(n, h, w, inner)

        return nn.Conv(c, (1, 1))(jnp.concatenate([lin, loc], axis=-1))


class StyleInverter(nn.Module):
    """latent (B, latent_dim) -> image (B, S, S, 3) in [0, 1]."""

    image_size: int = 256
    latent_dim: int = 1024
    fmap_max: int = 256
    attn_res: tuple = ()   # e.g. (32,): LinearAttention at those resolutions
                           # (upstream --attn-res-layers)

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        s = self.image_size
        if s & (s - 1):
            raise ValueError(f"image_size must be a power of 2, got {s}")
        n_ups = int(math.log2(s)) - 2  # 4 -> s
        # channel schedule: wide at low res, narrowing upward
        chans = [min(self.fmap_max, 2 ** (10 - i)) for i in range(n_ups + 1)]

        x = nn.Dense(4 * 4 * chans[0])(z)
        x = x.reshape(z.shape[0], 4, 4, chans[0])
        x = nn.silu(x)

        feats = {4: x}
        res = 4
        for i in range(n_ups):
            x = _upsample2x(x)
            x = GLUConv(chans[i + 1])(x)
            res *= 2
            if res in self.attn_res:
                x = x + LinearAttention(name=f"attn_{res}")(x)
            feats[res] = x
            # SLE: gate from the feature map 8x smaller (when it exists)
            low_res = res // 16
            if low_res in feats and res >= 64:
                x = SLE(chans[i + 1])(feats[low_res], x)
                feats[res] = x
        out = nn.Conv(3, (3, 3), padding=1)(x)
        return jax.nn.sigmoid(out)
