"""Head-to-head: vgg_fast._qconv_apply vs inline int8 conv, same process."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.models import vgg, vgg_fast

_DN = ("NHWC", "HWIO", "NHWC")
B, H, C = 32, 128, 256


def timeit(fn, x, n1=2, n2=10):
    @jax.jit
    def chain(x, iters):
        return jax.lax.fori_loop(0, iters, lambda _, v: fn(v), x)

    def run(iters):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(chain(x, jnp.asarray(iters)).astype(jnp.float32)))
        return time.perf_counter() - t0

    run(2)
    ts = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        ts.append((t2 - t1) / (n2 - n1) * 1e3)
    return round(float(np.median(ts)), 3)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, H, H, C), np.float32) - 0.5, jnp.bfloat16)

enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
eq = vgg_fast.prepare_encoder_q8(enc)
q = eq["conv3_2"]

res = {}
res["qconv_apply"] = timeit(
    lambda v: vgg_fast._qconv_apply(v, q, True, v.dtype, "reflect"), x)

wq, ws, b = q.wq, q.w_scale, q.b

def inline(v):
    s = jnp.max(jnp.abs(v).astype(jnp.float32)) / 127 + 1e-30
    xq = jnp.clip(jnp.rint(v.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * (ws * s) + b.astype(jnp.float32), 0.0)
    return y.astype(v.dtype)

res["inline_same_math"] = timeit(inline, x)

# variant: rint on bf16 without f32 upcast of the division
def inline2(v):
    s = jnp.max(jnp.abs(v).astype(jnp.float32)) / 127 + 1e-30
    xq = jnp.clip(jnp.rint(v.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * (ws * s) + b.astype(jnp.float32), 0.0)
    return y.astype(v.dtype)

res["inline_same_pad"] = timeit(inline2, x)
print(json.dumps(res, indent=1), flush=True)
