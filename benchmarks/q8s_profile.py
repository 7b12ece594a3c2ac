"""Per-layer cost of the int8-static (production) engine at 512px b32.

Cumulative-prefix deltas (tunnel-robust, see prefix_profile.py). Feeds the
fused-level-1 Pallas design: which deltas are HBM traffic vs MXU time.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.models import vgg, vgg_fast

B = 128


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
    return float(np.median(ts))


def q8s_encoder_stages(eq, dtype=jnp.bfloat16):
    sc = eq["__scales__"]
    st = []
    st.append(("conv0", lambda x: vgg.conv2d(
        x.astype(dtype), eq["conv0"]["w"], eq["conv0"]["b"])))
    st.append(("quant+pack", lambda x: vgg_fast.pack_s2d(
        vgg_fast.quantize_static(x, sc["conv1_1"] / 127.0))))
    st.append(("p_conv1_1", lambda x: vgg_fast._qconv_s(x, eq["conv1_1"], True, dtype, "edge")))
    st.append(("p_conv1_2", lambda x: vgg_fast._qconv_s(x, eq["conv1_2"], True, dtype, "edge")))
    st.append(("pool1", lambda x: vgg_fast.phase_max(x, 64)))
    st.append(("conv2_1", lambda x: vgg_fast._qconv_s(x, eq["conv2_1"], True, dtype, "reflect")))
    st.append(("conv2_2", lambda x: vgg_fast._qconv_s(x, eq["conv2_2"], True, dtype, "reflect")))
    st.append(("pool2", vgg.maxpool_ceil))
    st.append(("conv3_1", lambda x: vgg_fast._qconv_s(x, eq["conv3_1"], True, dtype, "reflect")))
    st.append(("conv3_2", lambda x: vgg_fast._qconv_s(x, eq["conv3_2"], True, dtype, "reflect")))
    st.append(("conv3_3", lambda x: vgg_fast._qconv_s(x, eq["conv3_3"], True, dtype, "reflect")))
    st.append(("conv3_4", lambda x: vgg_fast._qconv_s(x, eq["conv3_4"], True, dtype, "reflect")))
    st.append(("pool3", vgg.maxpool_ceil))
    st.append(("conv4_1", lambda x: vgg_fast._qconv_s(x, eq["conv4_1"], True, dtype, "reflect")))
    return st


def q8s_decoder_stages(dq, dtype=jnp.bfloat16):
    sc = dq["__scales__"]
    st = []
    st.append(("quant", lambda x: vgg_fast.quantize_static(x, sc["dconv4_1"] / 127.0)))
    st.append(("dconv4_1", lambda x: vgg_fast._qconv_s(x, dq["dconv4_1"], True, dtype, "reflect")))
    st.append(("up3", vgg.upsample_nearest2x))
    st.append(("dconv3_4", lambda x: vgg_fast._qconv_s(x, dq["dconv3_4"], True, dtype, "reflect")))
    st.append(("dconv3_3", lambda x: vgg_fast._qconv_s(x, dq["dconv3_3"], True, dtype, "reflect")))
    st.append(("dconv3_2", lambda x: vgg_fast._qconv_s(x, dq["dconv3_2"], True, dtype, "reflect")))
    st.append(("dconv3_1", lambda x: vgg_fast._qconv_s(x, dq["dconv3_1"], True, dtype, "reflect")))
    st.append(("up2", vgg.upsample_nearest2x))
    st.append(("dconv2_2", lambda x: vgg_fast._qconv_s(x, dq["dconv2_2"], True, dtype, "reflect")))
    st.append(("dconv2_1", lambda x: vgg_fast._qconv_s(x, dq["dconv2_1"], True, dtype, "reflect")))
    st.append(("p_dconv1_2", lambda x: vgg_fast._qconv_s(x, dq["dconv1_2"], True, dtype, "edge")))
    st.append(("p_dconv1_1", lambda x: vgg_fast._qconv_s(x, dq["dconv1_1"], False, dtype, "edge")))
    st.append(("unpack", lambda x: vgg_fast.unpack_d2s(x, 3)))
    return st


def profile(stages, x0, tag):
    prev = 0.0
    for k in range(1, len(stages) + 1):
        sub = stages[:k]

        def prefix(x, sub=sub):
            v = x
            for _, f in sub:
                v = f(v)
            return v

        t = timeit(prefix, x0)
        print(json.dumps({"pipe": tag, "upto": stages[k - 1][0],
                          "cum_ms": round(t, 2),
                          "delta_ms": round(t - prev, 2)}), flush=True)
        prev = t


def main():
    rng = np.random.default_rng(0)
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.bfloat16)
    # synthetic scales: values don't affect timing, only the requant math
    scales = {k: 4.0 for k in list(vgg_fast._ENC_NEXT) + list(vgg_fast._DEC_NEXT)}
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    dq = vgg_fast.prepare_decoder_q8s(dec, scales)
    img = jnp.asarray(rng.random((B, 512, 512, 3), np.float32), jnp.bfloat16)
    feat = jnp.asarray(rng.random((B, 64, 64, 512), np.float32), jnp.bfloat16)
    profile(q8s_encoder_stages(eq), img, "q8s_enc")
    profile(q8s_decoder_stages(dq), feat, "q8s_dec")


if __name__ == "__main__":
    main()
