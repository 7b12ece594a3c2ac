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


def make_spatial_stylize_q8s(mesh: Mesh, enc_prep, dec_prep, dtype=jnp.bfloat16):
    """Spatial (H-axis) sharding for the PRODUCTION int8-static executor
    (models/vgg_fast.py): quantized weights replicated, images H-sharded,
    XLA inserting the halo exchanges around every int8 conv. The integer
    conv paths are exact; the only sharding-sensitive op is the AdaIN
    content statistic (an f32 spatial reduction whose order changes), so
    the sharded result matches one device to f32-reduction tolerance
    (~1e-4; tested on the CPU mesh, tests/test_parallel.py).

    Shard-size note: each device needs >=2 rows at the deepest level
    (relu4_1 = H/8) — fewer trips an XLA SPMD halo-pad bug for int8 convs
    (pad(s8, f32) type mismatch). Production sizes satisfy this (512px ->
    64 relu4_1 rows).

    ``enc_prep`` / ``dec_prep``: prepare_encoder_q8s / prepare_decoder_q8s
    outputs (calibrated).
    """
    from ccst_tpu.models import vgg_fast

    img_sharding = NamedSharding(mesh, P(None, "spatial", None, None))
    repl = NamedSharding(mesh, P())

    def stylize(images, s_mean, s_std, alpha):
        feat = vgg_fast.apply_encoder_q8s(enc_prep, images, dtype)
        t = adain_from_stats(feat, s_mean, s_std)
        t = alpha_blend(t, feat, jnp.asarray(alpha, t.dtype))
        return vgg_fast.apply_decoder_q8s(dec_prep, t, dtype).astype(jnp.float32)

    jitted = jax.jit(
        stylize,
        in_shardings=(img_sharding, repl, repl, repl),
        out_shardings=img_sharding,
    )

    def run(images, s_mean, s_std, alpha=1.0):
        images = jax.device_put(jnp.asarray(images), img_sharding)
        return jitted(
            images,
            jnp.asarray(s_mean, jnp.float32), jnp.asarray(s_std, jnp.float32),
            jnp.asarray(alpha, jnp.float32),
        )

    return run


def make_batch_stylize_q8s(mesh: Mesh, enc_prep, dec_prep, dtype=jnp.bfloat16,
                           axis: str = "spatial"):
    """Batch (data-parallel) sharding of the int8-static stylize step: each
    device stylizes its slice of the content batch — the multi-chip
    throughput mode (the spatial variant above is the large-image mode).
    Per-image math has no cross-shard interaction, so the sharded result is
    BIT-identical to one device (tested)."""
    from ccst_tpu.models import vgg_fast

    batch_sharding = NamedSharding(mesh, P(axis, None, None, None))
    repl = NamedSharding(mesh, P())

    def stylize(images, s_mean, s_std, alpha):
        feat = vgg_fast.apply_encoder_q8s(enc_prep, images, dtype)
        t = adain_from_stats(feat, s_mean, s_std)
        t = alpha_blend(t, feat, jnp.asarray(alpha, t.dtype))
        return vgg_fast.apply_decoder_q8s(dec_prep, t, dtype).astype(jnp.float32)

    jitted = jax.jit(
        stylize,
        in_shardings=(batch_sharding, repl, repl, repl),
        out_shardings=batch_sharding,
    )

    def run(images, s_mean, s_std, alpha=1.0):
        images = jnp.asarray(images)
        n_shards = mesh.shape[axis]
        if images.shape[0] % n_shards:
            raise ValueError(
                f"batch size {images.shape[0]} not divisible by the "
                f"{n_shards}-device {axis!r} mesh axis; pad the batch or "
                f"choose a divisible batch size"
            )
        images = jax.device_put(images, batch_sharding)
        return jitted(
            images,
            jnp.asarray(s_mean, jnp.float32), jnp.asarray(s_std, jnp.float32),
            jnp.asarray(alpha, jnp.float32),
        )

    return run
