"""Per-layer conv microbenchmark on the real TPU chip.

Answers three questions that gate the round-2 perf plan:
  1. What does XLA's conv emitter actually reach per VGG layer shape, with
     and without the explicit reflect-pad copy (the measured ~26% overhead)?
  2. Does an int8 conv (weights+activations quantized, int32 accumulation)
     run at the doubled MXU rate on this chip, and what does dynamic
     activation quantization cost in-line?
  3. Where is each layer on the roofline (compute vs HBM bound at bf16/int8)?

Methodology follows bench.py: device-side fori_loop chaining each step's
output into the next input, synced with jax.device_get, two loop lengths to
cancel dispatch/transfer constants. Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")

# (H, Cin, Cout): the distinct hot conv shapes of encoder+decoder at 512px.
LAYERS = [
    (512, 64, 64),
    (256, 128, 128),
    (128, 256, 256),
    (64, 256, 512),
    (64, 512, 256),   # dconv4_1
    (512, 64, 3),     # dconv1_1 (output layer)
]
BATCH = 8
N1, N2 = 4, 16


def timeit(make_chain, *args) -> float:
    """Returns seconds per iteration via two-point calibration."""
    chain = jax.jit(make_chain, static_argnums=())

    def run(iters):
        t0 = time.perf_counter()
        jax.device_get(chain(*args, jnp.asarray(iters)))
        return time.perf_counter() - t0

    run(2)
    ts = []
    for _ in range(3):
        t1, t2 = run(N1), run(N2)
        ts.append((t2 - t1) / (N2 - N1))
    return float(np.median(ts))


def report(tag, h, cin, cout, sec_per_iter):
    flops = 2 * 9 * cin * cout * h * h * BATCH
    tf = flops / sec_per_iter / 1e12
    print(json.dumps({"tag": tag, "h": h, "cin": cin, "cout": cout,
                      "tflops": round(tf, 1), "ms": round(sec_per_iter * 1e3, 3)}),
          flush=True)


def main():
    rng = np.random.default_rng(0)
    for h, cin, cout in LAYERS:
        x0 = jnp.asarray(rng.random((BATCH, h, h, cin), np.float32) - 0.5,
                         jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.float32)

        def chain_pad(x, w, b, iters):
            def body(_, x):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                y = jax.lax.conv_general_dilated(
                    xp, w, (1, 1), "VALID", dimension_numbers=_DN,
                    preferred_element_type=jnp.float32)
                y = jnp.maximum(y + b, 0.0).astype(x.dtype)
                return y[..., :x.shape[-1]] if y.shape[-1] >= x.shape[-1] else jnp.tile(y, (1, 1, 1, x.shape[-1] // y.shape[-1]))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

        def chain_same(x, w, b, iters):
            def body(_, x):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN,
                    preferred_element_type=jnp.float32)
                y = jnp.maximum(y + b, 0.0).astype(x.dtype)
                return y[..., :x.shape[-1]] if y.shape[-1] >= x.shape[-1] else jnp.tile(y, (1, 1, 1, x.shape[-1] // y.shape[-1]))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

        report("bf16_pad+conv", h, cin, cout, timeit(chain_pad, x0, w, b))
        report("bf16_same_conv", h, cin, cout, timeit(chain_same, x0, w, b))

        # int8: per-output-channel weight scales, dynamic per-tensor act scale
        wq = np.clip(np.round(np.asarray(w, np.float32) /
                              (np.abs(np.asarray(w, np.float32)).max((0, 1, 2)) / 127 + 1e-12)),
                     -127, 127).astype(np.int8)
        w_scale = jnp.asarray(
            np.abs(np.asarray(w, np.float32)).max((0, 1, 2)) / 127, jnp.float32)
        wq = jnp.asarray(wq)

        def chain_int8(x, wq, w_scale, b, iters):
            def body(_, x):
                a_scale = jnp.max(jnp.abs(x).astype(jnp.float32)) / 127 + 1e-12
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                              -127, 127).astype(jnp.int8)
                # zero-pad SAME: border differs from reflect but timing-identical
                acc = jax.lax.conv_general_dilated(
                    xq, wq, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN,
                    preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * (a_scale * w_scale) + b
                y = jnp.maximum(y, 0.0).astype(x.dtype)
                return y[..., :x.shape[-1]] if y.shape[-1] >= x.shape[-1] else jnp.tile(y, (1, 1, 1, x.shape[-1] // y.shape[-1]))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

        try:
            report("int8_same_conv", h, cin, cout,
                   timeit(chain_int8, x0, wq, w_scale, b))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"tag": "int8_same_conv", "h": h, "cin": cin,
                              "cout": cout, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
