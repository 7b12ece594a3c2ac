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
        s = jax.image.resize(
            low, (low.shape[0], 4, 4, low.shape[-1]), method="bilinear"
        )
        s = nn.Conv(self.features, (4, 4), padding="VALID")(s)  # -> 1x1
        s = nn.silu(s)
        s = nn.Conv(self.features, (1, 1))(s)
        gate = jax.nn.sigmoid(s)
        return high * gate


class StyleInverter(nn.Module):
    """latent (B, latent_dim) -> image (B, S, S, 3) in [0, 1]."""

    image_size: int = 256
    latent_dim: int = 1024
    fmap_max: int = 256

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
            feats[res] = x
            # SLE: gate from the feature map 8x smaller (when it exists)
            low_res = res // 16
            if low_res in feats and res >= 64:
                x = SLE(chans[i + 1])(feats[low_res], x)
                feats[res] = x
        out = nn.Conv(3, (3, 3), padding=1)(x)
        return jax.nn.sigmoid(out)
