"""Stage-level timing of the int8 + packed stylize pipeline at 512px b32."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.models import vgg, vgg_fast
from ccst_tpu.ops.adain import adain_from_stats

BATCH = 32


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
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.bfloat16)
    eq = vgg_fast.prepare_encoder_q8(enc)
    dq = vgg_fast.prepare_decoder_q8(dec)
    ep = vgg_fast.prepare_encoder(enc)
    dp = vgg_fast.prepare_decoder(dec)

    img = jnp.asarray(rng.random((BATCH, 512, 512, 3), np.float32), jnp.bfloat16)
    feat = jnp.asarray(rng.random((BATCH, 64, 64, 512), np.float32), jnp.bfloat16)
    s_mean = jnp.zeros((512,), jnp.float32)
    s_std = jnp.ones((512,), jnp.float32)

    res = {}
    res["enc_ref_ms"] = timeit(
        lambda x: x + (jnp.mean(vgg.apply_encoder(enc, x).astype(jnp.float32)) * 1e-12).astype(x.dtype), img
    )
    res["enc_q8_ms"] = timeit(
        lambda x: x + (jnp.mean(vgg_fast.apply_encoder_q8(eq, x).astype(jnp.float32)) * 1e-12).astype(x.dtype), img
    )
    res["enc_packed_ms"] = timeit(
        lambda x: x + (jnp.mean(vgg_fast.apply_encoder_packed(ep, x).astype(jnp.float32)) * 1e-12).astype(x.dtype), img
    )
    res["dec_ref_ms"] = timeit(
        lambda f: f + (jnp.mean(vgg.apply_decoder(dec, f).astype(jnp.float32)) * 1e-12).astype(f.dtype), feat
    )
    res["dec_q8_ms"] = timeit(
        lambda f: f + (jnp.mean(vgg_fast.apply_decoder_q8(dq, f).astype(jnp.float32)) * 1e-12).astype(f.dtype), feat
    )
    res["dec_packed_ms"] = timeit(
        lambda f: f + (jnp.mean(vgg_fast.apply_decoder_packed(dp, f).astype(jnp.float32)) * 1e-12).astype(f.dtype), feat
    )
    res["adain_ms"] = timeit(
        lambda f: adain_from_stats(f, s_mean, s_std), feat
    )

    # individual hot pieces of the q8 path
    x256 = jnp.asarray(rng.random((BATCH, 256, 256, 256), np.float32), jnp.bfloat16)
    res["q8_packed_conv_256sp_256ch_ms"] = timeit(
        lambda x: vgg_fast._qconv_apply(x, eq["conv1_2"], True, x.dtype, "edge"), x256
    )
    res["bf16_packed_conv_256sp_256ch_ms"] = timeit(
        lambda x: vgg_fast.packed_reflect_conv(
            x, ep["conv1_2"]["K"].astype(x.dtype), ep["conv1_2"]["b"]
        ), x256
    )
    x128 = jnp.asarray(rng.random((BATCH, 128, 128, 256), np.float32), jnp.bfloat16)
    res["q8_conv3_2_ms"] = timeit(
        lambda x: vgg_fast._qconv_apply(x, eq["conv3_2"], True, x.dtype, "reflect"),
        x128,
    )
    res["bf16_conv3_2_ms"] = timeit(
        lambda x: jax.nn.relu(
            vgg.conv2d(vgg.reflect_pad(x, 1), enc["conv3_2"]["w"], enc["conv3_2"]["b"])
        ),
        x128,
    )
    # quantize op alone at the big shape
    res["quantize_256sp_256ch_ms"] = timeit(
        lambda x: x + (jnp.mean(vgg_fast._quantize_act(x)[0].astype(jnp.float32)) * 1e-12).astype(x.dtype), x256
    )
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
