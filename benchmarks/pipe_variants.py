"""End-to-end stylize engine comparison on the real chip at 512px.

Engines: ref (vgg.apply_*, reflect pads), packed (space-to-depth level-1
stage, exact), int8 (quantized convs). Single-style and 3-style
(encode-once) variants. Methodology identical to bench.py.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.models import vgg, vgg_fast
from ccst_tpu.ops.adain import adain_from_stats, alpha_blend

BATCH = 32
SIZE = 512
N_STYLES = 3


def measure(step, state, n1=2, n2=8):
    @jax.jit
    def chain(state, iters):
        def body(_, x):
            return step(x)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, state).astype(jnp.float32))

    def run(iters):
        t0 = time.perf_counter()
        jax.device_get(chain(state, jnp.asarray(iters)))
        return time.perf_counter() - t0

    run(2)
    rates = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        rates.append((n2 - n1) / (t2 - t1))
    return float(np.median(rates))  # iterations per second


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, SIZE, SIZE, 3), dtype=np.float32))
    s_means = jnp.asarray(rng.standard_normal((N_STYLES, 512)).astype(np.float32) * 0.1)
    s_stds = jnp.asarray(rng.random((N_STYLES, 512)).astype(np.float32) * 0.5 + 0.5)

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.bfloat16)

    engines = {
        "ref_bf16": (
            lambda x: vgg.apply_encoder(enc, x.astype(jnp.bfloat16)),
            lambda t: vgg.apply_decoder(dec, t),
        ),
        "packed_bf16": (
            lambda x, p=vgg_fast.prepare_encoder(enc): vgg_fast.apply_encoder_packed(p, x),
            lambda t, p=vgg_fast.prepare_decoder(dec): vgg_fast.apply_decoder_packed(p, t),
        ),
        "int8": (
            lambda x, p=vgg_fast.prepare_encoder_q8(enc): vgg_fast.apply_encoder_q8(p, x),
            lambda t, p=vgg_fast.prepare_decoder_q8(dec): vgg_fast.apply_decoder_q8(p, t),
        ),
    }

    for name, (enc_fn, dec_fn) in engines.items():
        def single(x):
            feat = enc_fn(x)
            t = adain_from_stats(feat, s_means[0], s_stds[0])
            t = alpha_blend(t, feat, jnp.asarray(1.0, t.dtype))
            return dec_fn(t).astype(x.dtype)[..., :3]

        def multi(x):
            feat = enc_fn(x)

            def one(stats):
                m, s = stats
                t = adain_from_stats(feat, m, s)
                t = alpha_blend(t, feat, jnp.asarray(1.0, t.dtype))
                return dec_fn(t)

            outs = jax.lax.map(one, (s_means, s_stds))
            return outs[0].astype(x.dtype)

        r1 = measure(single, images)
        print(json.dumps({"engine": name, "mode": "single",
                          "img_per_s": round(BATCH * r1, 1)}), flush=True)
        rm = measure(multi, images)
        print(json.dumps({"engine": name, "mode": "multi3",
                          "img_per_s": round(BATCH * N_STYLES * rm, 1)}), flush=True)


if __name__ == "__main__":
    main()
