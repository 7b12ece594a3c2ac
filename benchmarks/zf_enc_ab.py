"""Encoder A/B: unfused XLA vs fused Pallas (dense / zero-free conv1_2)."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.models import vgg, vgg_fast


def timeit(fn, x, n1=3, n2=12):
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
    return round(float(np.median(ts)), 2)


def main():
    rng = np.random.default_rng(0)
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
    scales = {k: 4.0 for k in list(vgg_fast._ENC_NEXT) + list(vgg_fast._DEC_NEXT)}
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    res = {}
    for b in (32, 64):
        img = jnp.asarray(rng.random((b, 512, 512, 3), np.float32), jnp.bfloat16)
        res[f"enc_unfused_b{b}_ms"] = timeit(
            lambda v: vgg_fast.apply_encoder_q8s(eq, v), img)
        print(json.dumps(res), flush=True)
        res[f"enc_fused_zf_b{b}_ms"] = timeit(
            lambda v: vgg_fast.apply_encoder_q8s_fused(eq, v, ht=16, zero_free=True), img)
        print(json.dumps(res), flush=True)
        if b == 32:
            res[f"enc_fused_dense_b{b}_ms"] = timeit(
                lambda v: vgg_fast.apply_encoder_q8s_fused(eq, v, ht=16, zero_free=False), img)
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
