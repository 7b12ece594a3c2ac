"""A/B: carry the space-to-depth packed layout through pool1 into level 2.

VERDICT r3 weak #2: conv2_1 is the only line in docs/WINOGRAD.md's
per-layer table without a physical kill-shot — 47% of int8 peak, attributed
to "MXU + post-pool layout". Hypothesis under test: re-packing the pooled
plane (so conv2_1 sees 256 full lanes at 128px instead of 64 half-empty
lanes at 256px) buys more than the packed kernel's padding overhead costs.

Variants (all int8-static machinery from models/vgg_fast.py, exact
requantization semantics, bit-identical outputs checked at tiny shapes):

  A  (production)  phase_max -> dense reflect conv2_1            -> (2562,128)
  B                phase_max+pack -> packed conv2_1 -> unpack    -> (2562,128)
  A2 (production)  A -> dense conv2_2 -> maxpool_ceil            -> (1282,128)
  B2               packed conv2_1 -> packed conv2_2 -> phase_max -> (1282,128)
                   (B2 never materializes the 2562 plane at all: pool2 IS
                    the phase max of conv2_2's packed output)

Padding arithmetic: a 3x3 conv in packed space needs 2x2 packed taps over
4x the channels — 2*2*4/9 = 1.78x the real MACs as structural zeros. At the
measured packed rate (~310 TOPs, conv1_2) the break-even dense rate is
310/1.78 = 174 TOPs; conv2_1 measured 187 TOPs dense, so B must beat its
own zero-padding to win. This script settles it on hardware.

Result (one TPU v5e over the tunnel, b128 @512px shapes, 2026-08-19 —
see docs/WINOGRAD.md round-4 addendum): run `python benchmarks/packed_l2_ab.py`.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.models import vgg, vgg_fast
from ccst_tpu.models.vgg_fast import (
    QConvS, _qconv_s, _quantize_kernel, make_packed_kernel, pack_s2d,
    phase_max, unpack_d2s,
)

B = 128


def timeit(fn, x, n1=2, n2=8, reps=5):
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
    for _ in range(reps):
        t1, t2 = run(n1), run(n2)
        ts.append((t2 - t1) / (n2 - n1) * 1e3)
    return round(float(np.median(ts)), 2)


def build_preps(seed=0):
    """Dense and packed QConvS for conv2_1/conv2_2 with a shared fake scale
    set (values don't matter for timing; for correctness they just need to
    be consistent across variants)."""
    key = jax.random.PRNGKey(seed)
    enc = vgg.init_params(key, vgg.ENCODER_ARCH, dtype=jnp.float32)
    scales = {"conv2_1": 11.0, "conv2_2": 9.0, "conv3_1": 13.0}

    def qconv(name, nxt, packed):
        p = enc[name]
        w = np.asarray(p["w"], np.float32)
        wq, ws = _quantize_kernel(make_packed_kernel(w) if packed else w)
        in_s = scales[name] / 127.0
        b = np.asarray(p["b"], np.float32)
        k = np.asarray(ws, np.float32) * in_s
        out_s = scales[nxt] / 127.0
        if packed:  # ws is already per-packed-channel (4Cout); only the
            b = np.tile(b, 4)  # original bias needs tiling

        return QConvS(wq, jnp.asarray(k / out_s), jnp.asarray(b / out_s), packed, True)

    return {
        "c21_dense": qconv("conv2_1", "conv2_2", False),
        "c21_packed": qconv("conv2_1", "conv2_2", True),
        "c22_dense": qconv("conv2_2", "conv3_1", False),
        "c22_packed": qconv("conv2_2", "conv3_1", True),
    }


def variants(prep):
    def A(xp):  # production: phase max -> dense conv2_1
        x = phase_max(xp, 64)
        return _qconv_s(x, prep["c21_dense"], True, jnp.bfloat16, "reflect")

    def Bv(xp):  # packed seam: pack the pooled plane, packed conv2_1
        x2 = pack_s2d(phase_max(xp, 64))
        y = _qconv_s(x2, prep["c21_packed"], True, jnp.bfloat16, "edge")
        return unpack_d2s(y, 128)

    def A2(xp):  # production through pool2
        x = phase_max(xp, 64)
        x = _qconv_s(x, prep["c21_dense"], True, jnp.bfloat16, "reflect")
        x = _qconv_s(x, prep["c22_dense"], True, jnp.bfloat16, "reflect")
        return vgg.maxpool_ceil(x)

    def B2(xp):  # fully packed level 2; pool2 == phase max, no 256^2 plane
        x2 = pack_s2d(phase_max(xp, 64))
        x2 = _qconv_s(x2, prep["c21_packed"], True, jnp.bfloat16, "edge")
        x2 = _qconv_s(x2, prep["c22_packed"], True, jnp.bfloat16, "edge")
        return phase_max(x2, 128)

    return A, Bv, A2, B2


def check_correctness(prep):
    """Bit-identical across layouts (same int32 sums, same requant) at a
    tiny square shape."""
    rng = np.random.default_rng(1)
    xp = jnp.asarray(rng.integers(-5, 120, (1, 8, 8, 256)), jnp.int8)
    A, Bv, A2, B2 = variants(prep)
    a, b = np.asarray(A(xp)), np.asarray(Bv(xp))
    assert a.shape == b.shape == (1, 8, 8, 128), (a.shape, b.shape)
    assert np.array_equal(a, b), f"A vs B mismatch: {np.abs(a - b).max()}"
    a2, b2 = np.asarray(A2(xp)), np.asarray(B2(xp))
    assert a2.shape == b2.shape == (1, 4, 4, 128)
    assert np.array_equal(a2, b2), f"A2 vs B2 mismatch: {np.abs(a2 - b2).max()}"
    return True


def main():
    prep = build_preps()
    print(json.dumps({"correctness": check_correctness(prep)}), flush=True)

    rng = np.random.default_rng(0)
    # post-conv1_2 packed tensor at b128 @512px: (B, 256, 256, 256) int8
    xp = jnp.asarray(rng.integers(-5, 120, (B, 256, 256, 256)), jnp.int8)
    A, Bv, A2, B2 = variants(prep)

    res = {}
    res["A_pool1_c21_dense_ms"] = timeit(A, xp)
    print(json.dumps(res), flush=True)
    res["B_pool1_c21_packed_ms"] = timeit(Bv, xp)
    print(json.dumps(res), flush=True)
    res["A2_through_pool2_dense_ms"] = timeit(A2, xp)
    print(json.dumps(res), flush=True)
    res["B2_through_pool2_packed_ms"] = timeit(B2, xp)
    print(json.dumps(res), flush=True)
    step_ms = 343.0  # measured engine step at b128 (docs/WINOGRAD.md)
    d = res["A2_through_pool2_dense_ms"] - res["B2_through_pool2_packed_ms"]
    res["projected_img_per_sec_if_B2"] = round(384.0 / (step_ms - d) * 1e3, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
