"""Headline benchmark: AdaIN stylization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "stylize_img_per_sec_512px", "value": N, "unit": "img/s",
   "vs_baseline": N / 75.9}

Baseline: the reference's committed stylize timing — 75.9 img/s at 256px,
batch 128, on the author's CUDA GPU (BASELINE.md; artifact
style_transfer/AdaIN/pacs_art_painting_overall_stylize_time.txt). We measure
at 512px (the resolution the reference README actually uses), 4x the
per-image work — vs_baseline therefore understates the true speedup.

Measured step: the production Overall-transfer device computation — one
encode of the content batch, then AdaIN + decode under each of the 3 other
domains' style banks (the multi-style engine path; the reference re-encodes
per style). bfloat16 with fp32 statistics, weights resident in HBM. The rate
counts stylized output images per second, like the reference's timing
artifacts.

Methodology: the iteration loop runs ON DEVICE (lax.fori_loop chaining each
step's output into the next input) inside a single dispatch, and the result
is fetched with jax.device_get — so neither async dispatch nor unreliable
host-side completion signals can inflate the number. Two device-loop lengths
cancel the constant dispatch + transfer overhead:
  rate = batch * (N2 - N1) / (t2 - t1).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from ccst_tpu.models import vgg
    from ccst_tpu.ops.adain import adain_from_stats, alpha_blend

    batch = 32
    size = 512
    n_styles = 3  # PACS/OfficeHome: each content domain gets 3 styles
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32))
    s_means = jnp.asarray(rng.standard_normal((n_styles, 512)).astype(np.float32) * 0.1)
    s_stds = jnp.asarray(rng.random((n_styles, 512)).astype(np.float32) * 0.5 + 0.5)

    @jax.jit
    def chain(enc, dec, images, s_means, s_stds, iters):
        def body(_, x):
            feat = vgg.apply_encoder(enc, x.astype(jnp.bfloat16))

            def one(stats):
                s_mean, s_std = stats
                t = adain_from_stats(feat, s_mean, s_std)
                t = alpha_blend(t, feat, jnp.asarray(1.0, t.dtype))
                return vgg.apply_decoder(dec, t)

            outs = jax.lax.map(one, (s_means, s_stds))  # (S, B, H, W, 3)
            return outs[0].astype(x.dtype)  # chain through style 0's output

        out = jax.lax.fori_loop(0, iters, body, images)
        return jnp.sum(out.astype(jnp.float32))

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        jax.device_get(chain(enc, dec, images, s_means, s_stds, jnp.asarray(iters)))
        return time.perf_counter() - t0

    run(2)  # compile + warm
    n1, n2 = 2, 10
    rates = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        rates.append(batch * n_styles * (n2 - n1) / max(t2 - t1, 1e-9))
    img_per_sec = float(np.median(rates))

    print(
        json.dumps(
            {
                "metric": "stylize_img_per_sec_512px",
                "value": round(img_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(img_per_sec / 75.9, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
