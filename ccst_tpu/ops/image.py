"""On-device image preprocessing (pure JAX, jit/vmap-safe, static shapes).

The reference does these in torchvision on DataLoader workers
(data/data_helper.py:161-181). TPU-first design: the host ships raw [0,1]
float batches once; crop/flip/normalize run on device. RandomResizedCrop is
expressed with ``jax.image.scale_and_translate`` so a random source box maps
to a fixed output shape without dynamic-shape tracing.

Reference quirk preserved in spirit but not in mechanism: the reference
appends RandomHorizontalFlip *after* Normalize (data/data_helper.py:170-173)
— mathematically identical to flipping before, so we flip before normalize.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ccst_tpu.config import IMAGENET_MEAN, IMAGENET_STD

Array = jax.Array


def normalize(
    images: Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> Array:
    """(x - mean) / std per channel (ImageNet constants, data_helper.py:21-31)."""
    mean_a = jnp.asarray(mean, images.dtype)
    std_a = jnp.asarray(std, images.dtype)
    return (images - mean_a) / std_a


def random_horizontal_flip(key: jax.Array, images: Array, p: float = 0.5) -> Array:
    """Per-image horizontal flip with probability p."""
    n = images.shape[0]
    flips = jax.random.bernoulli(key, p, (n,))
    flipped = jnp.flip(images, axis=2)
    return jnp.where(flips[:, None, None, None], flipped, images)


def _sample_crop_box(
    key: jax.Array,
    h: int,
    w: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
):
    """One RandomResizedCrop box (area-scale + log-uniform aspect, torchvision
    semantics with rejection replaced by clamping — jit needs static control
    flow)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w
    target_area = area * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    cw = jnp.sqrt(target_area * aspect)
    ch = jnp.sqrt(target_area / aspect)
    cw = jnp.clip(cw, 1.0, w)
    ch = jnp.clip(ch, 1.0, h)
    x0 = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (w - cw)
    y0 = jax.random.uniform(k4, (), minval=0.0, maxval=1.0) * (h - ch)
    return y0, x0, ch, cw


def random_resized_crop(
    key: jax.Array,
    images: Array,
    out_size: int,
    scale: Tuple[float, float] = (0.8, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Array:
    """Batched RandomResizedCrop(out_size, scale) (data_helper.py:165-169).

    Each image gets an independent random source box, resampled to
    (out_size, out_size) with bilinear interpolation via scale_and_translate.
    """
    n, h, w, c = images.shape

    def one(img, k):
        y0, x0, ch, cw = _sample_crop_box(k, h, w, scale, ratio)
        # output pixel o maps to source y0 + o * ch/out. scale_and_translate
        # computes in * scale + translation = out coords; we need the inverse
        # mapping: scale = out/ch, translation = -y0 * out/ch.
        sy = out_size / ch
        sx = out_size / cw
        return jax.image.scale_and_translate(
            img,
            (out_size, out_size, c),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([-y0 * sy, -x0 * sx]),
            method="bilinear",
            antialias=True,
        )

    keys = jax.random.split(key, n)
    return jax.vmap(one)(images, keys)


def resize_square(images: Array, size: int) -> Array:
    """Resize(S, S) with antialiased bilinear (val/test transform,
    data_helper.py:178-181)."""
    n, _, _, c = images.shape
    return jax.image.resize(
        images, (n, size, size, c), method="bilinear", antialias=True
    )


def train_transform(
    key: jax.Array,
    images: Array,
    out_size: int,
    min_scale: float = 0.8,
    max_scale: float = 1.0,
    flip_p: float = 0.5,
) -> Array:
    """RandomResizedCrop + flip + ImageNet normalize (data_helper.py:161-176)."""
    k_crop, k_flip = jax.random.split(key)
    x = random_resized_crop(k_crop, images, out_size, (min_scale, max_scale))
    x = random_horizontal_flip(k_flip, x, flip_p)
    return normalize(x)


def eval_transform(images: Array, out_size: int) -> Array:
    x = images
    if images.shape[1] != out_size or images.shape[2] != out_size:
        x = resize_square(images, out_size)
    return normalize(x)
