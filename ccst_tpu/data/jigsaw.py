"""Jigsaw puzzle machinery (3x3 tile permutation, 31-way order classes).

Rebuild of the reference's ``JigsawDataset`` (data/ImageLoader.py:88-136):
images are cut into a 3x3 grid, tiles are shuffled by one of 30 fixed
permutations (class 0 = unshuffled; ``bias_whole_image`` keeps most samples
whole), and the model predicts the permutation index alongside the class.

TPU-first: tiling/permutation run batched on device under jit. The
permutation table is the reference's own ``permutations_30.npy`` (vendored
under ``assets/``; loaded exactly like ``retrieve_permutations``,
data/ImageLoader.py:102-106, including the min==1 rebase) so jigsaw classes
are bit-compatible; a deterministic maximal-Hamming greedy construction
(Noroozi & Favaro) generates the table for permutation counts with no asset.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

GRID = 3
N_TILES = GRID * GRID

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


@lru_cache(maxsize=None)
def permutation_set(n_perms: int = 30, seed: int = 0) -> np.ndarray:
    """(n_perms, 9) int permutation table.

    For counts with a vendored asset (``assets/permutations_{n}.npy``), the
    reference's exact table is returned — 0-based like
    ``retrieve_permutations`` (data/ImageLoader.py:102-106). Otherwise a
    deterministic greedy max-min-Hamming set is generated: sample a large
    pool, greedily pick the permutation maximizing the minimum Hamming
    distance to those chosen. Deterministic under ``seed``.
    """
    asset = os.path.join(_ASSET_DIR, f"permutations_{n_perms}.npy")
    if seed == 0 and os.path.exists(asset):
        table = np.load(asset)
        if table.min() == 1:
            table = table - 1
        return table.astype(np.int64)
    rng = np.random.default_rng(seed)
    pool = np.array([rng.permutation(N_TILES) for _ in range(5000)])
    pool = np.unique(pool, axis=0)
    chosen = [pool[0]]
    for _ in range(n_perms - 1):
        dists = np.stack(
            [np.sum(pool != c[None, :], axis=1) for c in chosen], axis=0
        )  # (chosen, pool)
        min_d = dists.min(axis=0)
        chosen.append(pool[int(min_d.argmax())])
    return np.stack(chosen)


def tile_and_permute(images: Array, orders: Array, perms: Array) -> Array:
    """Apply jigsaw shuffling to an NHWC batch.

    Args:
      images: (N, H, W, C) with H == W divisible by 3.
      orders: (N,) int in [0, n_perms] — 0 means unshuffled.
      perms: (n_perms, 9) permutation table.

    Returns the re-assembled (N, H, W, C) grids. Tile n of the output is
    source tile ``perm[order-1][n]`` (ImageLoader.py:132-133).
    """
    n, h, w, c = images.shape
    if h % GRID or w % GRID:
        raise ValueError(f"jigsaw needs H,W divisible by {GRID}, got {h}x{w}")
    th, tw = h // GRID, w // GRID
    # (N, 9, th, tw, C) in row-major tile order
    tiles = (
        images.reshape(n, GRID, th, GRID, tw, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, N_TILES, th, tw, c)
    )
    identity = jnp.arange(N_TILES)[None, :]
    table = jnp.concatenate([identity, jnp.asarray(perms)], axis=0)  # (P+1, 9)
    # Gather-free selection (round-5 tunnel finding): the obvious
    # take_along_axis over the (N, 9, th, tw, C) tiles lowers to a large
    # per-image gather, and gather lowerings are this tunnel's known
    # pathological-remote-compile case (the SLE bilinear-resize hang,
    # docs/STATUS.md r4 #7) — the Jigsaw step sat >40 min in compile.
    # Formulate both lookups as one-hot matmuls instead: each one-hot row
    # has exactly one 1.0, so the f32 matmuls are EXACT copies (0*x + 1*x),
    # bit-identical to the gather (tests/test_train_equivalence_ext.py).
    # precision=HIGHEST everywhere: TPU default matmul precision feeds the
    # MXU bf16 operands, which would round the f32 pixels (and the exactness
    # argument below is only valid in full precision).
    sel = jnp.matmul(
        jax.nn.one_hot(orders, table.shape[0], dtype=jnp.float32),
        table.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, 9) — float-exact: values are small ints
    onehot = jax.nn.one_hot(sel.astype(jnp.int32), N_TILES, dtype=jnp.float32)
    flat = tiles.reshape(n, N_TILES, th * tw * c).astype(jnp.float32)
    shuffled = jnp.einsum(
        "nij,njd->nid", onehot, flat, precision=jax.lax.Precision.HIGHEST
    ).astype(images.dtype)
    return (
        shuffled.reshape(n, GRID, GRID, th, tw, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h, w, c)
    )


def sample_orders(
    key: jax.Array, n: int, n_perms: int = 30, bias_whole_image: float = 0.9
) -> Array:
    """Random permutation class per image: 0 with prob ``bias_whole_image``,
    else uniform over [0, n_perms] (ImageLoader.py:126-129)."""
    k_order, k_bias = jax.random.split(key)
    orders = jax.random.randint(k_order, (n,), 0, n_perms + 1)
    whole = jax.random.bernoulli(k_bias, bias_whole_image, (n,))
    return jnp.where(whole, 0, orders)


def jigsaw_batch(
    key: jax.Array,
    images: Array,
    n_perms: int = 30,
    bias_whole_image: float = 0.9,
):
    """(shuffled images, order labels) for one batch."""
    perms = jnp.asarray(permutation_set(n_perms))
    orders = sample_orders(key, images.shape[0], n_perms, bias_whole_image)
    return tile_and_permute(images, orders, perms), orders
