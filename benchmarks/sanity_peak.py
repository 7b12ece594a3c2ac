"""Methodology sanity check: measure a big square matmul whose speed-of-light
is known (v5e: 197 TFLOP/s bf16, 394 TOP/s int8). If the two-point device-loop
method reports above-peak rates, the methodology (not the chip) is wrong."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_case(tag, dtype, acc, n=4096, n1=4, n2=16):
    x = jnp.asarray(np.random.default_rng(0).random((n, n)) - 0.5).astype(dtype)
    w = jnp.asarray(np.random.default_rng(1).random((n, n)) - 0.5).astype(dtype)

    @jax.jit
    def chain(x, w, iters):
        def body(_, x):
            y = jnp.dot(x, w, preferred_element_type=acc)
            # renormalize to keep values bounded; cast back to feed next iter
            y = (y / jnp.float32(n)).astype(dtype) if dtype != jnp.int8 else (
                jnp.clip(y // (8 * n), -127, 127).astype(jnp.int8))
            return y
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

    def run(iters):
        t0 = time.perf_counter()
        jax.device_get(chain(x, w, jnp.asarray(iters)))
        return time.perf_counter() - t0

    run(2)
    rs = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        rs.append(2 * n**3 * (n2 - n1) / (t2 - t1) / 1e12)
    print(json.dumps({"tag": tag, "tflops": round(float(np.median(rs)), 1)}),
          flush=True)


run_case("matmul_bf16_4096", jnp.bfloat16, jnp.float32)
run_case("matmul_int8_4096", jnp.int8, jnp.int32)
