"""A/B: Pallas fused kernels vs their XLA-graph counterparts, production
shapes ((B, 64, 64, 512) relu4_1 features, bf16)."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.kernels.adain_pallas import fused_adain
from ccst_tpu.kernels.welford_pallas import channel_moments
from ccst_tpu.ops.adain import adain_from_stats, alpha_blend
from ccst_tpu.ops.welford import _batch_moments

B = 64


def timeit(fn, x, n1=5, n2=40):
    @jax.jit
    def chain(x, iters):
        def body(_, v):
            out = fn(v)
            return v + (jnp.mean(out.astype(jnp.float32)) * 1e-12).astype(v.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    def run(iters):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(chain(x, jnp.asarray(iters)).astype(jnp.float32)))
        return time.perf_counter() - t0

    run(2)
    ts = []
    for _ in range(5):
        t1, t2 = run(n1), run(n2)
        ts.append((t2 - t1) / (n2 - n1) * 1e3)
    return round(float(np.median(ts)), 4)


def main():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.random((B, 64, 64, 512), np.float32), jnp.bfloat16)
    s_mean = jnp.asarray(rng.standard_normal(512), jnp.float32) * 0.1
    s_std = jnp.asarray(rng.random(512) * 0.5 + 0.5, jnp.float32)
    res = {}
    res["adain_xla_ms"] = timeit(
        lambda f: alpha_blend(adain_from_stats(f, s_mean, s_std), f,
                              jnp.asarray(0.9, f.dtype)), feat)
    res["adain_pallas_ms"] = timeit(
        lambda f: fused_adain(f, s_mean, s_std, alpha=0.9), feat)
    res["moments_xla_ms"] = timeit(
        lambda f: f + (jnp.mean(_batch_moments(f).mean) * 1e-12).astype(f.dtype), feat)
    res["moments_pallas_ms"] = timeit(
        lambda f: f + (jnp.mean(channel_moments(f)[0]) * 1e-12).astype(f.dtype), feat)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
