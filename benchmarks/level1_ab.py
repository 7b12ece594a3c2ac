"""A/B: fused level-1 Pallas kernels vs the unfused XLA chain, 512px b32."""
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
            z = (out.reshape(-1)[:1].astype(jnp.int32) & 0).astype(v.dtype)
            flat = v.reshape(-1)
            flat = jax.lax.dynamic_update_slice(flat, flat[:1] + z, (0,))
            return flat.reshape(v.shape)
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

    res = {}
    x = jnp.asarray(rng.integers(-127, 128, (B, 256, 256, 12)), jnp.int8)

    def enc_unfused(v):
        o = vgg_fast._qconv_s(v, eq["conv1_1"], True, jnp.bfloat16, "edge")
        o = vgg_fast._qconv_s(o, eq["conv1_2"], True, jnp.bfloat16, "edge")
        return vgg_fast.phase_max(o, 64)

    res["enc_l1_unfused_ms"] = timeit(enc_unfused, x)
    for ht in (8, 16, 32):
        res[f"enc_l1_fused_ht{ht}_ms"] = timeit(
            lambda v, ht=ht: L1.encoder_level1(v, eq["conv1_1"], eq["conv1_2"], ht=ht), x
        )
        print(json.dumps(res), flush=True)

    y = jnp.asarray(rng.integers(-127, 128, (B, 256, 256, 64)), jnp.int8)

    def dec_unfused(v):
        o = vgg_fast._qconv_s(v, dq["dconv1_2"], True, jnp.bfloat16, "edge")
        return vgg_fast._qconv_s(o, dq["dconv1_1"], False, jnp.bfloat16, "edge")

    res["dec_l1_unfused_ms"] = timeit(dec_unfused, y)
    for ht in (8, 16, 32):
        res[f"dec_l1_fused_ht{ht}_ms"] = timeit(
            lambda v, ht=ht: L1.decoder_level1(y if False else v, dq["dconv1_2"], dq["dconv1_1"], ht=ht), y
        )
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
