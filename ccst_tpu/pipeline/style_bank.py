"""Per-domain style-bank computation (CCST pipeline stage 1).

TPU-native rebuild of the reference's streaming mean/std pass
(style_transfer/AdaIN/mean_std_computation_effcientMem.py:89-156): stream a
domain's train images through the VGG encoder to relu4_1 and accumulate
per-channel statistics. Differences by design:

  - Welford/Chan accumulation in float32 (stable at Camelyon17 scale) instead
    of raw Σx/Σx² (see ccst_tpu.ops.welford);
  - the whole per-batch step (encode + accumulate) is one jitted function, so
    feature maps never leave the device;
  - the resulting ``.npy`` *is actually saved* (the reference's save is
    commented out — mean_std_computation_effcientMem.py:145-146) in the
    reference-compatible layout ``[mean(1,C,1,1), std(1,C,1,1)]`` plus a
    native ``.npz``.
"""
from __future__ import annotations

import json
import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.config import StylizeConfig
from ccst_tpu.data.lists import parse_list, train_list_path
from ccst_tpu.data.loader import ImageBatchLoader
from ccst_tpu.models import vgg
from ccst_tpu.ops.welford import WelfordState, welford_finalize, welford_init

Array = jax.Array


def make_bank_step(encoder_params, dtype=jnp.bfloat16):
    """Returns jitted (state, images, valid) -> state.

    ``valid`` masks padded rows of the final batch so padding never pollutes
    the statistics (the mask multiplies the batch's sample count via slicing
    with a dynamic-free trick: padded rows are zeroed AND excluded by weight).
    """
    params = jax.tree.map(lambda x: x.astype(dtype), encoder_params)

    @jax.jit
    def step(state: WelfordState, images: Array, valid: Array) -> WelfordState:
        feats = vgg.apply_encoder(params, images.astype(dtype))
        n, h, w, c = feats.shape
        x = feats.astype(jnp.float32).reshape(n, h * w, c)
        row_mask = (jnp.arange(n) < valid).astype(jnp.float32)  # (n,)
        count = jnp.sum(row_mask) * h * w
        weights = row_mask[:, None, None]
        mean = jnp.sum(x * weights, axis=(0, 1)) / jnp.maximum(count, 1.0)
        m2 = jnp.sum(jnp.square(x - mean) * weights, axis=(0, 1))
        batch = WelfordState(count=count, mean=mean, m2=m2)
        from ccst_tpu.ops.welford import welford_merge

        return welford_merge(state, batch)

    return step


def compute_style_bank(
    cfg: StylizeConfig,
    domain: str,
    encoder_params=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Compute and persist the (mean, std) style bank for ``domain``.

    Returns (mean, std) as float32 (C,) arrays and writes:
      - ``{style_stats_dir}/{dataset}/{domain}_mean_std.npy`` (reference layout)
      - ``{style_stats_dir}/{dataset}/{domain}_mean_std.npz`` (native)
      - ``{domain}_style_comp_time.txt``-equivalent timing JSON.
    """
    if encoder_params is None:
        from ccst_tpu.models.convert import load_encoder

        encoder_params = load_encoder(cfg.vgg_weights)
    names, labels = parse_list(
        train_list_path(cfg.list_root, cfg.dataset, domain)
    )
    if cfg.data_root:
        names = [os.path.join(cfg.data_root, n) for n in names]
    loader = ImageBatchLoader(
        names,
        labels,
        batch_size=cfg.batch_size,
        image_size=cfg.image_size,
        shuffle=False,
    )
    step = make_bank_step(encoder_params, dtype=jnp.dtype(cfg.dtype))
    state = welford_init(512)
    t0 = time.perf_counter()
    n_images = 0
    for batch in loader:
        state = step(state, jnp.asarray(batch.images), jnp.asarray(batch.valid))
        n_images += batch.valid
    mean, std = welford_finalize(state)
    jax.block_until_ready((mean, std))
    elapsed = time.perf_counter() - t0

    mean_np = np.asarray(mean, np.float32)
    std_np = np.asarray(std, np.float32)
    out_dir = os.path.join(cfg.style_stats_dir, cfg.dataset.lower())
    save_style_stats(out_dir, domain, mean_np, std_np)
    with open(os.path.join(out_dir, f"{domain}_style_comp_time.json"), "w") as f:
        json.dump(
            {
                "domain": domain,
                "seconds": elapsed,
                "images": n_images,
                "images_per_sec": n_images / max(elapsed, 1e-9),
                "image_size": cfg.image_size,
                "batch_size": cfg.batch_size,
            },
            f,
            indent=2,
        )
    return mean_np, std_np


def save_style_stats(out_dir: str, domain: str, mean: np.ndarray, std: np.ndarray) -> None:
    os.makedirs(out_dir, exist_ok=True)
    mean = np.asarray(mean, np.float32).reshape(-1)
    std = np.asarray(std, np.float32).reshape(-1)
    c = mean.shape[0]
    # reference-compatible: np.save([mean(1,C,1,1), std(1,C,1,1)])
    ref_layout = np.stack(
        [mean.reshape(1, c, 1, 1), std.reshape(1, c, 1, 1)], axis=0
    )
    np.save(os.path.join(out_dir, f"{domain}_mean_std.npy"), ref_layout)
    np.savez(
        os.path.join(out_dir, f"{domain}_mean_std.npz"), mean=mean, std=std
    )


def load_style_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load style stats from native ``.npz`` or reference ``.npy``
    ([mean, std] each (1,C,1,1) — CCST_OverallStyleTransfer.py:140-144).
    Returns channel-vectors (C,) float32."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            return (
                data["mean"].astype(np.float32).reshape(-1),
                data["std"].astype(np.float32).reshape(-1),
            )
    arr = np.load(path)
    mean, std = arr[0], arr[1]
    return (
        np.asarray(mean, np.float32).reshape(-1),
        np.asarray(std, np.float32).reshape(-1),
    )
