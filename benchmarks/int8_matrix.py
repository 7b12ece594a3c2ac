"""Isolate the int8 conv slowdowns: odd-shape penalty, pad-op cost,
dynamic-vs-static quantization. Shape (32, 128, 128, 256) -> 256, b32."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

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


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, H, C), np.float32) - 0.5, jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
    ws = jnp.full((C,), 1e-3, jnp.float32)
    res = {}

    def q_dyn(v):
        s = jnp.max(jnp.abs(v).astype(jnp.float32)) / 127 + 1e-30
        return jnp.clip(jnp.rint(v.astype(jnp.float32) / s), -127, 127).astype(jnp.int8), s

    def q_static(v):
        return jnp.clip(jnp.rint(v.astype(jnp.float32) * 64.0), -127, 127).astype(jnp.int8)

    def finish(acc, v, s=1.0):
        y = jnp.maximum(acc.astype(jnp.float32) * (ws * s), 0.0)
        return y.astype(v.dtype)

    def conv(xq, padding):
        return jax.lax.conv_general_dilated(
            xq, wq, (1, 1), padding, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)

    res["same_dynq"] = timeit(
        lambda v: finish(conv(q_dyn(v)[0], ((1, 1), (1, 1))), v), x)
    res["same_staticq"] = timeit(
        lambda v: finish(conv(q_static(v), ((1, 1), (1, 1))), v), x)
    res["reflectpad_valid_dynq"] = timeit(
        lambda v: finish(conv(jnp.pad(q_dyn(v)[0], ((0, 0), (1, 1), (1, 1), (0, 0)),
                                      mode="reflect"), "VALID"), v), x)
    res["zeropad_valid_staticq"] = timeit(
        lambda v: finish(conv(jnp.pad(q_static(v), ((0, 0), (1, 1), (1, 1), (0, 0))),
                              "VALID"), v), x)
    res["reflectpad_valid_staticq"] = timeit(
        lambda v: finish(conv(jnp.pad(q_static(v), ((0, 0), (1, 1), (1, 1), (0, 0)),
                                      mode="reflect"), "VALID"), v), x)
    # reflect pad built from concatenation instead of jnp.pad
    def concat_reflect(xq):
        top, bot = xq[:, 1:2], xq[:, -2:-1]
        xq = jnp.concatenate([top, xq, bot], axis=1)
        left, right = xq[:, :, 1:2], xq[:, :, -2:-1]
        return jnp.concatenate([left, xq, right], axis=2)
    res["concatreflect_valid_staticq"] = timeit(
        lambda v: finish(conv(concat_reflect(q_static(v)), "VALID"), v), x)
    # SAME conv + border strip repair, assembled with 2 concats
    def border_repair(v):
        xq = q_static(v)
        y = conv(xq, ((1, 1), (1, 1)))  # int32 (B,H,H,C)
        # top/bottom rows recomputed from 3-row reflected strips
        rows_t = jnp.concatenate([xq[:, 1:2], xq[:, 0:2]], axis=1)
        rows_b = jnp.concatenate([xq[:, -2:], xq[:, -2:-1]], axis=1)
        def strip_h(rows):
            rp = jnp.pad(rows, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
            return conv(rp, "VALID")
        cols_l = jnp.concatenate([xq[:, :, 1:2], xq[:, :, 0:2]], axis=2)
        cols_r = jnp.concatenate([xq[:, :, -2:], xq[:, :, -2:-1]], axis=2)
        def strip_w(cols):
            cp = jnp.pad(cols, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
            return conv(cp, "VALID")
        mid = jnp.concatenate(
            [strip_w(cols_l), y[:, :, 1:-1], strip_w(cols_r)], axis=2)
        out = jnp.concatenate(
            [strip_h(rows_t), mid[:, 1:-1], strip_h(rows_b)], axis=1)
        return finish(out, v)
    res["same_borderrepair_staticq"] = timeit(border_repair, x)

    # pure ops
    xq0 = q_static(x)
    res["pad_reflect_int8_only"] = timeit(
        lambda v: jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")[
            :, 1:-1, 1:-1] , xq0)
    res["quantize_dyn_only"] = timeit(lambda v: q_dyn(v)[0].astype(v.dtype), x)
    res["quantize_static_only"] = timeit(lambda v: q_static(v).astype(v.dtype), x)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
