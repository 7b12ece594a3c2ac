"""Does a Pallas int8 matmul reach the MXU int8 rate on this chip?

Round-2 measurements showed the XLA *conv* emitter has a real int8 MXU path
(~3x bf16) while XLA `dot` on int8 inputs does not. The fused level-1 Pallas
kernel is only viable if an in-kernel int8 matmul (dot_general with int32
preferred type) hits the fast path — this microbenchmark answers that.

Timing: device-side fori_loop chain (iteration i+1's input depends on
iteration i's output via a tiny slice update), two-point delta to cancel
dispatch overhead — the tunnel makes per-dispatch timing useless.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_mm(x, w, out_dtype, tile_m=1024):
    M, K = x.shape
    _, N = w.shape

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )

    return pl.pallas_call(
        kernel,
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(x, w)


def rate_tops(mm, x, w, ops, n1=4, n2=16):
    @jax.jit
    def chain(x, iters):
        def body(_, v):
            o = mm(v, w)
            # cheap dependency: fold a zeroed scalar of the output back into v
            z = (o[:1, :1] * 0).astype(v.dtype)  # (1,1) zero, data-dependent
            return jax.lax.dynamic_update_slice(v, v[:1, :1] + z, (0, 0))
        return jax.lax.fori_loop(0, iters, body, x)

    def run(iters):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(chain(x, jnp.asarray(iters)).astype(jnp.float32)))
        return time.perf_counter() - t0

    run(2)
    rs = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        rs.append(ops * (n2 - n1) / max(t2 - t1, 1e-9))
    return float(np.median(rs)) / 1e12


def main():
    rng = np.random.default_rng(0)
    res = {}
    M = 1 << 18
    for K, N in [(256, 256), (512, 512), (2304, 256), (576, 256), (1152, 128)]:
        xi = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        ops = 2 * M * K * N
        try:
            res[f"pallas_i8i32_{K}x{N}"] = round(
                rate_tops(lambda a, b: pallas_mm(a, b, jnp.int32), xi, wi, ops), 1)
        except Exception as e:  # noqa
            res[f"pallas_i8i32_{K}x{N}"] = f"ERR {type(e).__name__}: {str(e)[:100]}"
        try:
            res[f"pallas_i8f32_{K}x{N}"] = round(
                rate_tops(lambda a, b: pallas_mm(a, b, jnp.float32), xi, wi, ops), 1)
        except Exception as e:  # noqa
            res[f"pallas_i8f32_{K}x{N}"] = f"ERR {type(e).__name__}: {str(e)[:100]}"
        xb = xi.astype(jnp.bfloat16)
        wb = wi.astype(jnp.bfloat16)
        try:
            res[f"pallas_bf16_{K}x{N}"] = round(
                rate_tops(lambda a, b: pallas_mm(a, b, jnp.float32), xb, wb, ops), 1)
        except Exception as e:  # noqa
            res[f"pallas_bf16_{K}x{N}"] = f"ERR {type(e).__name__}: {str(e)[:100]}"
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
