"""Spatial (H-axis) sharding for very large stylization inputs.

The reference's only scalable axis is image resolution x batch, which it
handles by shrinking the batch (README uses batch 6 at 512px). TPU-native
answer (SURVEY.md §2.8/§5.7): shard the image height across a ``spatial``
mesh axis. The conv stack's 3x3 receptive fields need halo exchange at shard
boundaries — we let XLA's SPMD partitioner insert the collective-permutes by
annotating shardings on a pjit'ed program instead of hand-writing ring
transfers (the compiler's halo handling is bit-exact and overlaps comms).

This is the context/sequence-parallel analogue for this workload: it makes
stylization of images too large for one chip's HBM (e.g. gigapixel
histopathology at Camelyon17 scale) a sharding annotation, not a rewrite.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccst_tpu.models import vgg
from ccst_tpu.ops.adain import adain_from_stats, alpha_blend


def make_spatial_mesh(n_devices: int, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())[:n_devices]
    return Mesh(np.array(devices), ("spatial",))


def make_spatial_stylize(mesh: Mesh, dtype=jnp.bfloat16):
    """Returns stylize(enc, dec, images, s_mean, s_std, alpha) with images
    H-sharded over the mesh's ``spatial`` axis.

    Constraint: H/8 (the relu4_1 height) must remain divisible by the axis
    size for an even shard; XLA will still compile otherwise but with
    padding overhead.
    """
    img_sharding = NamedSharding(mesh, P(None, "spatial", None, None))
    repl = NamedSharding(mesh, P())

    def stylize(enc, dec, images, s_mean, s_std, alpha):
        x = images.astype(dtype)
        feat = vgg.apply_encoder(enc, x)
        t = adain_from_stats(feat, s_mean, s_std)
        t = alpha_blend(t, feat, jnp.asarray(alpha, t.dtype))
        return vgg.apply_decoder(dec, t).astype(jnp.float32)

    jitted = jax.jit(
        stylize,
        in_shardings=(repl, repl, img_sharding, repl, repl, repl),
        out_shardings=img_sharding,
    )

    def run(enc, dec, images, s_mean, s_std, alpha=1.0):
        enc = jax.device_put(
            jax.tree.map(lambda v: jnp.asarray(v, dtype), enc), repl
        )
        dec = jax.device_put(
            jax.tree.map(lambda v: jnp.asarray(v, dtype), dec), repl
        )
        images = jax.device_put(jnp.asarray(images), img_sharding)
        return jitted(
            enc, dec, images,
            jnp.asarray(s_mean, jnp.float32), jnp.asarray(s_std, jnp.float32),
            jnp.asarray(alpha, jnp.float32),
        )

    return run
