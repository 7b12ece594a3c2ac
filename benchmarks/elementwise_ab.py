"""A/B alternative XLA formulations of the slow elementwise stages at b128:
phase_max (pool1) and nearest-2x upsample."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 128


def timeit(fn, x, n1=2, n2=8):
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
    res = {}

    # ---- phase max: (B, 256, 256, 256) int8 -> (B, 256, 256, 64)
    x = jnp.asarray(rng.integers(0, 127, (B, 256, 256, 256)), jnp.int8)

    def pm_reshape(v):  # current vgg_fast.phase_max
        n, hb, wb, _ = v.shape
        return jnp.max(v.reshape(n, hb, wb, 4, 64), axis=3)

    def pm_slices(v):
        m = jnp.maximum(v[..., 0:64], v[..., 64:128])
        return jnp.maximum(m, jnp.maximum(v[..., 128:192], v[..., 192:256]))

    def pm_i32(v):  # int8 max may lower badly; try int32 compute
        vi = v.astype(jnp.int32)
        m = jnp.maximum(vi[..., 0:64], vi[..., 64:128])
        return jnp.maximum(m, jnp.maximum(vi[..., 128:192], vi[..., 192:256])).astype(jnp.int8)

    res["phase_max_reshape_ms"] = timeit(pm_reshape, x)
    print(json.dumps(res), flush=True)
    res["phase_max_slices_ms"] = timeit(pm_slices, x)
    print(json.dumps(res), flush=True)
    res["phase_max_i32_ms"] = timeit(pm_i32, x)
    print(json.dumps(res), flush=True)

    # ---- nearest up2: (B, 128, 128, 128) int8 -> (B, 256, 256, 128)
    y = jnp.asarray(rng.integers(-127, 127, (B, 128, 128, 128)), jnp.int8)

    def up_broadcast(v):  # current vgg.upsample_nearest2x
        n, h, w, c = v.shape
        v = jnp.broadcast_to(v[:, :, None, :, None, :], (n, h, 2, w, 2, c))
        return v.reshape(n, h * 2, w * 2, c)

    def up_repeat(v):
        return jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)

    def up_concat(v):
        n, h, w, c = v.shape
        rows = jnp.concatenate([v[:, :, None], v[:, :, None]], axis=2).reshape(n, 2 * h, w, c)
        return jnp.concatenate([rows[:, :, :, None], rows[:, :, :, None]], axis=3).reshape(n, 2 * h, 2 * w, c)

    res["up2_broadcast_ms"] = timeit(up_broadcast, y)
    print(json.dumps(res), flush=True)
    res["up2_repeat_ms"] = timeit(up_repeat, y)
    print(json.dumps(res), flush=True)
    res["up2_concat_ms"] = timeit(up_concat, y)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
