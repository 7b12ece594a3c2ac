"""Streaming style-bank statistics: stability + parity with the reference's
sum/sumsq finalization (mean_std_computation_effcientMem.py:103-137)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.ops import (
    welford_finalize,
    welford_init,
    welford_merge,
    welford_update,
)
from ccst_tpu.ops.welford import welford_psum


def reference_bank(batches):
    """fp64 ground truth of the reference's population mean/std + eps."""
    flat = np.concatenate([b.reshape(-1, b.shape[-1]) for b in batches], 0).astype(
        np.float64
    )
    mean = flat.mean(0)
    var = flat.var(0)  # population variance, like sumsq/count - mean^2
    return mean, np.sqrt(var + 1e-5)


def test_welford_matches_reference_formula(rng):
    batches = [
        rng.standard_normal((2, 8, 8, 16), dtype=np.float32) * 2.0 + 5.0
        for _ in range(7)
    ]
    state = welford_init(16)
    for b in batches:
        state = welford_update(state, jnp.asarray(b))
    mean, std = welford_finalize(state)
    ref_mean, ref_std = reference_bank(batches)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), ref_std, rtol=1e-5, atol=1e-5)


def test_welford_stable_with_large_offset(rng):
    """Naive sum-of-squares in fp32 fails at offset ~1e4; Welford must not."""
    batches = [
        (rng.standard_normal((4, 16, 16, 8)) * 0.1 + 1e4).astype(np.float32)
        for _ in range(10)
    ]
    state = welford_init(8)
    for b in batches:
        state = welford_update(state, jnp.asarray(b))
    mean, std = welford_finalize(state)
    ref_mean, ref_std = reference_bank(batches)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, rtol=1e-5)
    # std ~0.1; fp32 sumsq would give garbage (cancellation ~1e8 vs 1e-2)
    np.testing.assert_allclose(np.asarray(std), ref_std, rtol=1e-2)


def test_welford_merge_associative(rng):
    bs = [rng.standard_normal((1, 4, 4, 4), dtype=np.float32) for _ in range(3)]
    states = []
    for b in bs:
        s = welford_update(welford_init(4), jnp.asarray(b))
        states.append(s)
    left = welford_merge(welford_merge(states[0], states[1]), states[2])
    right = welford_merge(states[0], welford_merge(states[1], states[2]))
    for a, b in zip(welford_finalize(left), welford_finalize(right)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_welford_merge_with_empty():
    s = welford_update(welford_init(4), jnp.ones((1, 2, 2, 4)))
    merged = welford_merge(s, welford_init(4))
    mean, std = welford_finalize(merged)
    np.testing.assert_allclose(np.asarray(mean), 1.0, rtol=1e-6)


def test_welford_scan_jit(rng):
    """The production path folds batches under lax.scan inside jit."""
    data = rng.standard_normal((6, 2, 8, 8, 4), dtype=np.float32)

    @jax.jit
    def bank(batches):
        def step(state, b):
            return welford_update(state, b), None

        state, _ = jax.lax.scan(step, welford_init(4), batches)
        return welford_finalize(state)

    mean, std = bank(jnp.asarray(data))
    ref_mean, ref_std = reference_bank(list(data))
    np.testing.assert_allclose(np.asarray(mean), ref_mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), ref_std, rtol=1e-5, atol=1e-5)


def test_welford_psum_across_mesh(rng):
    """Device-parallel style bank: per-device partial states psum-merged."""
    n_dev = jax.device_count()
    assert n_dev >= 8, "conftest should provide 8 virtual CPU devices"
    data = rng.standard_normal((8, 4, 8, 8, 16), dtype=np.float32) + 2.0

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("d",))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=jax.sharding.PartitionSpec("d"),
        out_specs=jax.sharding.PartitionSpec(),
    )
    def bank(shard):  # shard: (1, 4, 8, 8, 16) per device
        state = welford_update(welford_init(16), shard[0])
        merged = welford_psum(state, "d")
        mean, std = welford_finalize(merged)
        return mean, std

    mean, std = bank(jnp.asarray(data))
    ref_mean, ref_std = reference_bank(list(data))
    np.testing.assert_allclose(np.asarray(mean), ref_mean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(std), ref_std, rtol=1e-4, atol=1e-4)
