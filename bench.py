"""Headline benchmark: AdaIN stylization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "stylize_img_per_sec_512px", "value": N, "unit": "img/s",
   "vs_baseline": N / 75.9}

Baseline: the reference's committed stylize timing — 75.9 img/s at 256px,
batch 128, on the author's CUDA GPU (BASELINE.md; artifact
style_transfer/AdaIN/pacs_art_painting_overall_stylize_time.txt). We measure
at 512px (the resolution the reference README actually uses), which is 4x the
per-image work — so vs_baseline understates the true speedup.

Measured step: the full Overall-transfer device computation
(encode -> adain_from_stats -> alpha blend -> decode), bfloat16 with fp32
statistics, weights resident in HBM.

Methodology: iterations are chained through a data dependency (each step
stylizes the previous step's output), so no async-dispatch trick can elide
work, and the final jax.device_get cannot return early. Two measurement
points (N1, N2 iters) cancel the constant host->device transfer and sync
overheads: rate = batch * (N2 - N1) / (t2 - t1).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _chained(engine, images, s_mean, s_std, iters: int) -> float:
    t0 = time.perf_counter()
    out = images
    for _ in range(iters):
        out = engine.stylize(out, s_mean, s_std, 1.0)
    jax.device_get(out)
    return time.perf_counter() - t0


def main() -> None:
    from ccst_tpu.models import vgg
    from ccst_tpu.pipeline.stylize import StylizeEngine

    batch = 16
    size = 512
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    engine = StylizeEngine(enc, dec, dtype=jnp.bfloat16)

    # numpy-generated inputs: avoids extra device compiles (slow on remote-
    # compile environments); the only compiled program is the stylize step.
    import numpy as np

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32))
    s_mean = jnp.asarray(rng.standard_normal(512, dtype=np.float32) * 0.1)
    s_std = jnp.asarray(rng.random(512, dtype=np.float32) * 0.5 + 0.5)

    # warmup / compile + first transfer
    _chained(engine, images, s_mean, s_std, 1)

    n1, n2 = 3, 13
    t1 = _chained(engine, images, s_mean, s_std, n1)
    t2 = _chained(engine, images, s_mean, s_std, n2)
    img_per_sec = batch * (n2 - n1) / max(t2 - t1, 1e-9)

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
