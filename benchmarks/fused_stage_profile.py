"""Where does the fused-encoder time go? Prefix deltas over the fused path:
conv0 | quant+pack | pad-to-aligned | fused kernel | conv2_1.. tail.
Also: the fused kernel fed by a DIRECT input (no producing chain) for the
layout-copy comparison, and k_slice on/off."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.kernels import level1_pallas as L1
from ccst_tpu.models import vgg, vgg_fast

B = 32


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
    q1, q2 = eq["conv1_1"], eq["conv1_2"]
    img = jnp.asarray(rng.random((B, 512, 512, 3), np.float32), jnp.bfloat16)
    res = {}

    def pre(v):  # conv0 + quantize + pack
        x = vgg.conv2d(v.astype(jnp.bfloat16), eq["conv0"]["w"], eq["conv0"]["b"])
        xq = vgg_fast.quantize_static(x, eq["__scales__"]["conv1_1"] / 127.0)
        return vgg_fast.pack_s2d(xq)

    res["pre_ms"] = timeit(pre, img)
    print(json.dumps(res), flush=True)

    for ks in (True, False):
        res[f"pre+kernel_ks{int(ks)}_ms"] = timeit(
            lambda v, ks=ks: L1.fused_two_conv(
                pre(v), q1.wq, q1.k, q1.kb, q2.wq, q2.k, q2.kb,
                ht=16, pool_groups=4, out_dtype=jnp.int8, k_slice=ks,
            ),
            img,
        )
        print(json.dumps(res), flush=True)

    # kernel fed by a direct int8 input (fresh array, not a produced chain)
    xq0 = jnp.asarray(rng.integers(-127, 128, (B, 256, 256, 12)), jnp.int8)
    res["direct_kernel_ms"] = timeit(
        lambda v: L1.fused_two_conv(
            v, q1.wq, q1.k, q1.kb, q2.wq, q2.k, q2.kb,
            ht=16, pool_groups=4, out_dtype=jnp.int8,
        ),
        xq0,
    )
    print(json.dumps(res), flush=True)

    # the pad alone, in-pipeline (what the wrapper prepends)
    def pre_pad(v):
        xq = pre(v)
        xp = jnp.pad(xq, ((0, 0), (2, 6), (1, 7), (0, 0)), mode="edge")
        return jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 116)))

    res["pre+pad_ms"] = timeit(pre_pad, img)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
