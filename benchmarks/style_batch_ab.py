"""A/B: lax.map over styles (3 sequential decodes) vs one flattened
(3B)-batch decode; batch sweep 32/64/96."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.models import vgg, vgg_fast
from ccst_tpu.ops.adain import adain_from_stats, alpha_blend


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
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.bfloat16)
    scales = {k: 4.0 for k in list(vgg_fast._ENC_NEXT) + list(vgg_fast._DEC_NEXT)}
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    dq = vgg_fast.prepare_decoder_q8s(dec, scales)
    s_means = jnp.asarray(rng.standard_normal((3, 512)).astype(np.float32) * 0.1)
    s_stds = jnp.asarray(rng.random((3, 512)).astype(np.float32) * 0.5 + 0.5)
    res = {}

    def step_map(x):
        f = vgg_fast.apply_encoder_q8s(eq, x)

        def one(stats):
            m, s = stats
            t = adain_from_stats(f, m, s)
            t = alpha_blend(t, f, jnp.asarray(1.0, t.dtype))
            return vgg_fast.apply_decoder_q8s(dq, t)

        return jax.lax.map(one, (s_means, s_stds))[0].astype(x.dtype)

    def step_flat(x):
        f = vgg_fast.apply_encoder_q8s(eq, x)
        t = jax.vmap(
            lambda m, s: alpha_blend(
                adain_from_stats(f, m, s), f, jnp.asarray(1.0, f.dtype)
            )
        )(s_means, s_stds)  # (S, B, h, w, C)
        s, b, h, w, c = t.shape
        out = vgg_fast.apply_decoder_q8s(dq, t.reshape(s * b, h, w, c))
        return out.reshape(s, b, *out.shape[1:])[0].astype(x.dtype)

    for b in (32, 64, 96):
        img = jnp.asarray(rng.random((b, 512, 512, 3), np.float32), jnp.bfloat16)
        for tag, st in [("map", step_map), ("flat", step_flat)]:
            ms = timeit(st, img)
            res[f"{tag}_b{b}_ms"] = ms
            res[f"{tag}_b{b}_imgps"] = round(b * 3 / ms * 1e3, 1)
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
