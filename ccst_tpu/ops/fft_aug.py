"""ELCFS/FedDG frequency-space augmentation (jit-safe JAX).

Rebuild of the reference's numpy FFT machinery (data/ImageLoader.py:161-208):
blend the low-frequency amplitude band of a source image with a target
domain's amplitude spectrum, keep the source phase, invert.

Notes on reference semantics preserved here:
  - box half-width b = floor(min(h, w) * L); fed_run uses L=0, which blends
    only the DC bin (ImageLoader.py:322 `L=0`);
  - the blend ratio is drawn uniformly from {0.1, ..., 0.9}
    (ImageLoader.py:175 `np.random.randint(1,10)/10`);
  - images are in [0, 255] float during FFT and clipped back
    (ImageLoader.py:323).

TPU-first: runs batched on device under jit (static L => static box), PRNG
keys explicit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def amplitude_spectrum(images_hwc: Array) -> Array:
    """Per-channel FFT amplitude |F(x)| of an HWC image (CHW axes order in
    the spectrum to match the reference's saved banks)."""
    chw = jnp.transpose(images_hwc, (2, 0, 1))
    return jnp.abs(jnp.fft.fft2(chw, axes=(-2, -1)))


def low_freq_mutate(
    amp_src: Array, amp_trg: Array, ratio: Array, L: float = 0.0
) -> Array:
    """Blend the centered low-frequency box of two (C, H, W) amplitude
    spectra: src*ratio + trg*(1-ratio) (ImageLoader.py:161-183)."""
    a_src = jnp.fft.fftshift(amp_src, axes=(-2, -1))
    a_trg = jnp.fft.fftshift(amp_trg, axes=(-2, -1))
    _, h, w = a_src.shape
    c_h, c_w = h // 2, w // 2
    # clamp: the reference's box (ImageLoader.py:166) silently wraps for
    # L >= 0.5 (h1 goes negative); valid-L behavior is identical
    b = min(int(min(h, w) * L), min(c_h, c_w) - 1) if L > 0 else 0
    b = max(b, 0)
    h1, h2 = c_h - b, c_h + b + 1
    w1, w2 = c_w - b, c_w + b + 1
    blended = a_src[:, h1:h2, w1:w2] * ratio + a_trg[:, h1:h2, w1:w2] * (1 - ratio)
    a_src = a_src.at[:, h1:h2, w1:w2].set(blended)
    return jnp.fft.ifftshift(a_src, axes=(-2, -1))


def source_to_target_freq(
    src_img_hwc: Array, amp_trg: Array, ratio: Array, L: float = 0.0
) -> Array:
    """Swap low-frequency amplitude of ``src`` with ``amp_trg``; keep phase
    (ImageLoader.py:185-208). Image in [0, 255]; output clipped to [0, 255]."""
    chw = jnp.transpose(src_img_hwc, (2, 0, 1))
    fft_src = jnp.fft.fft2(chw, axes=(-2, -1))
    amp_src, pha_src = jnp.abs(fft_src), jnp.angle(fft_src)
    amp_mut = low_freq_mutate(amp_src, amp_trg, ratio, L=L)
    fft_mut = amp_mut * jnp.exp(1j * pha_src)
    out = jnp.real(jnp.fft.ifft2(fft_mut, axes=(-2, -1)))
    return jnp.clip(jnp.transpose(out, (1, 2, 0)), 0.0, 255.0)


def feddg_batch_augment(
    key: jax.Array,
    images: Array,
    amp_bank: Array,
    L: float = 0.0,
) -> Array:
    """Batched FedDG view: for each [0,1]-ranged NHWC image, pick a random
    amplitude spectrum from ``amp_bank`` (K, C, H, W) and a random blend
    ratio in {0.1..0.9}, return the frequency-perturbed [0,1] batch."""
    n = images.shape[0]
    k_pick, k_ratio = jax.random.split(key)
    picks = jax.random.randint(k_pick, (n,), 0, amp_bank.shape[0])
    ratios = jax.random.randint(k_ratio, (n,), 1, 10).astype(jnp.float32) / 10.0

    def one(img, pick, ratio):
        out = source_to_target_freq(img * 255.0, amp_bank[pick], ratio, L=L)
        return out / 255.0

    return jax.vmap(one)(images, picks, ratios)
