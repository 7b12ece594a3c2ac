"""Headline benchmark: AdaIN stylization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "stylize_img_per_sec_512px", "value": N, "unit": "img/s",
   "vs_baseline": N / 75.9, ...extras}

Baseline: the reference's committed stylize timing — 75.9 img/s at 256px,
batch 128, on the author's CUDA GPU (BASELINE.md; artifact
style_transfer/AdaIn/pacs_art_painting_overall_stylize_time.txt). We measure
at 512px (the resolution the reference README actually uses), 4x the
per-image work — vs_baseline therefore understates the true speedup.

Measured step: the production Overall-transfer device computation with the
**int8-static executor** (models/vgg_fast.py): one encode of the content
batch, then AdaIN + decode under each of the 3 other domains' style banks.
Weights are per-channel int8; activations int8 end-to-end with calibrated
static scales (requantization fused into each conv's epilogue); reflect-pad
semantics preserved exactly (packed edge-pad / int8 reflect pad). Quality is
measured in-run: PSNR of the int8 output vs the bf16 reference executor
(whose own <1e-3-MAE torch parity is covered by tests/test_vgg_parity.py)
is reported as ``quality_psnr_db``. The bf16 parity-mode rate is reported
as ``bf16_img_per_sec`` for comparison.

Methodology: the iteration loop runs ON DEVICE (lax.fori_loop chaining each
step's output into the next input) inside a single dispatch, and the result
is fetched with jax.device_get — so neither async dispatch nor unreliable
host-side completion signals can inflate the number. Two device-loop lengths
cancel the constant dispatch + transfer overhead:
  rate = batch * n_styles * (N2 - N1) / (t2 - t1).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def device_rate(step, state, batch_imgs: int, n1: int = 2, n2: int = 8) -> float:
    @jax.jit
    def chain(state, iters):
        return jax.lax.fori_loop(0, iters, lambda _, x: step(x), state)

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(chain(state, jnp.asarray(iters)).astype(jnp.float32)))
        return time.perf_counter() - t0

    run(2)  # compile + warm
    rates = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        rates.append(batch_imgs * (n2 - n1) / max(t2 - t1, 1e-9))
    return float(np.median(rates))


def _mae_vs_torch(enc, dec, images, s_mean, s_std, got_int8, got_bf16):
    """Drive the actual torch AdaIN formula (reference
    style_transfer/AdaIN/function.py:26-33 semantics, via the tests'
    torch twin) on CPU with the SAME weights and inputs, and return
    (MAE(int8, torch), MAE(bf16, torch), MAE(int8, torch)/output-span)."""
    import sys

    sys.path.insert(0, ".")
    import torch

    from ccst_tpu.models import vgg as jvgg
    from tests.torch_ref import build_torch_stack

    def fill(stack, params, arch):
        convs = [m for m in stack if isinstance(m, torch.nn.Conv2d)]
        names = [l.name for l in arch if isinstance(l, jvgg.Conv)]
        for m, name in zip(convs, names):
            w = np.asarray(params[name]["w"], np.float32)  # HWIO
            m.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
            m.bias.data = torch.from_numpy(np.asarray(params[name]["b"], np.float32))
        return stack

    tenc = fill(build_torch_stack(jvgg.ENCODER_ARCH), enc, jvgg.ENCODER_ARCH).eval()
    tdec = fill(build_torch_stack(jvgg.DECODER_ARCH), dec, jvgg.DECODER_ARCH).eval()
    with torch.no_grad():
        x = torch.from_numpy(images.transpose(0, 3, 1, 2).copy())
        feat = tenc(x)
        mean = feat.mean(dim=(2, 3), keepdim=True)
        # unbiased variance + eps-before-sqrt: function.py:9-10 semantics
        std = (feat.var(dim=(2, 3), unbiased=True, keepdim=True) + 1e-5).sqrt()
        sm = torch.from_numpy(s_mean.astype(np.float32)).view(1, -1, 1, 1)
        ss = torch.from_numpy(s_std.astype(np.float32)).view(1, -1, 1, 1)
        t = (feat - mean) / std * ss + sm
        ref = tdec(t).numpy().transpose(0, 2, 3, 1)
    span = float(ref.max() - ref.min()) or 1.0
    mae_q = float(np.mean(np.abs(got_int8 - ref)))
    mae_b = float(np.mean(np.abs(got_bf16 - ref)))
    return mae_q, mae_b, mae_q / span


def _backend_watchdog(timeout_s: float = 600.0) -> None:
    """Fail fast (with a diagnostic JSON line) if the TPU backend cannot
    initialize. The tunnel's pool grant is exclusive and can wedge if a
    previous client died mid-claim (benchmarks/README.md operational rule);
    in that state ``jax.devices()`` hangs forever, which would silently eat
    the whole bench run. A visible error beats an invisible hang."""
    import threading

    done = threading.Event()

    def arm():
        if not done.wait(timeout_s):
            print(
                json.dumps(
                    {
                        "metric": "stylize_img_per_sec_512px",
                        "value": None,
                        "unit": "img/s",
                        "error": f"TPU backend init exceeded {timeout_s:.0f}s "
                        "(wedged pool grant? see benchmarks/README.md); "
                        "last good on-chip runs: 1108.6 and 1109.12 img/s "
                        "(docs/STATUS.md round-3)",
                    }
                ),
                flush=True,
            )
            import os as _os

            _os._exit(3)

    threading.Thread(target=arm, daemon=True).start()
    jax.devices()  # blocks until the backend is up (or the watchdog fires)
    done.set()


def main() -> None:
    import argparse

    from ccst_tpu.models import vgg, vgg_fast
    from ccst_tpu.ops.adain import adain_from_stats, alpha_blend

    # Optional overrides for apples-to-apples runs (e.g. --size 256 matches
    # the reference's committed 75.9 img/s artifact exactly). The bare
    # invocation — what the driver runs — keeps the 512px defaults.
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    cli = ap.parse_args()

    _backend_watchdog()

    # int8 batch from the measured sweep (962 @32, 1051 @64, 1066 @96,
    # 1110 @128, 1036 @192 dip, 1107 @256 — XLA per-op overheads amortize;
    # benchmarks/fused_step_ab.py + the bsweep probes). The bf16 comparator
    # runs at 32: its level-1 tensors are 8x larger per image and b128
    # would thrash HBM.
    batch = cli.batch
    bf16_batch = 32
    size = cli.size
    n_styles = 3  # PACS/OfficeHome: each content domain gets 3 styles
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.bfloat16)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32))
    s_means = jnp.asarray(rng.standard_normal((n_styles, 512)).astype(np.float32) * 0.1)
    s_stds = jnp.asarray(rng.random((n_styles, 512)).astype(np.float32) * 0.5 + 0.5)

    scales = vgg_fast.calibrate_scales(
        enc, dec, images[:4], [(s_means[i], s_stds[i]) for i in range(n_styles)]
    )
    eq = vgg_fast.prepare_encoder_q8s(enc, scales)
    dq = vgg_fast.prepare_decoder_q8s(dec, scales)

    def multi(encode, decode):
        def step(x):
            feat = encode(x)

            def one(stats):
                m, s = stats
                t = adain_from_stats(feat, m, s)
                t = alpha_blend(t, feat, jnp.asarray(1.0, t.dtype))
                return decode(t)

            return jax.lax.map(one, (s_means, s_stds))[0].astype(x.dtype)

        return step

    int8_step = multi(
        lambda x: vgg_fast.apply_encoder_q8s(eq, x),
        lambda t: vgg_fast.apply_decoder_q8s(dq, t),
    )
    bf16_step = multi(
        lambda x: vgg.apply_encoder(enc, x.astype(jnp.bfloat16)),
        lambda t: vgg.apply_decoder(dec, t),
    )

    int8_rate = device_rate(int8_step, images, batch * n_styles)
    bf16_rate = device_rate(
        bf16_step, images[:bf16_batch], bf16_batch * n_styles
    )

    # in-run quality: int8 output vs the torch-parity bf16 executor
    featb = vgg.apply_encoder(enc, images[:4].astype(jnp.bfloat16))
    tb = adain_from_stats(featb, s_means[0], s_stds[0])
    want = np.asarray(vgg.apply_decoder(dec, tb), np.float32)
    featq = vgg_fast.apply_encoder_q8s(eq, images[:4])
    tq = adain_from_stats(featq, s_means[0], s_stds[0])
    got = np.asarray(vgg_fast.apply_decoder_q8s(dq, tq), np.float32)
    span = float(want.max() - want.min()) or 1.0
    psnr = 10 * np.log10(span**2 / float(np.mean((got - want) ** 2)))

    # MAE of the HEADLINE engine directly against the torch formula at the
    # benchmarked 512px (VERDICT r2 weak #2: the int8 engine itself must be
    # held to BASELINE's MAE-vs-torch bar, not just PSNR-vs-bf16). The same
    # weights drive an actual torch stack on CPU (tests/torch_ref twin) over
    # 2 of the benchmark images under style bank 0.
    mae_int8_vs_torch = mae_bf16_vs_torch = rel = None
    try:
        mae_int8_vs_torch, mae_bf16_vs_torch, rel = _mae_vs_torch(
            enc, dec, np.asarray(images[:2], np.float32),
            np.asarray(s_means[0]), np.asarray(s_stds[0]),
            got_int8=np.asarray(got[:2], np.float32),
            got_bf16=np.asarray(want[:2], np.float32),
        )
    except Exception as e:  # torch unavailable on some hosts: report why
        mae_int8_vs_torch = f"unavailable: {e}"

    result = {
        "metric": f"stylize_img_per_sec_{size}px",
        "value": round(int8_rate, 2),
        "unit": "img/s",
        "vs_baseline": round(int8_rate / 75.9, 2),
        "engine": "int8-static",
        "bf16_img_per_sec": round(bf16_rate, 2),
        "quality_psnr_db": round(psnr, 1),
        # headline-engine quality vs the torch formula (see
        # _mae_vs_torch): absolute mean |err| and relative to the
        # output span (random-init decoder outputs are not [0,1];
        # with the reference's real weights outputs are [0,1] and
        # the relative number IS the BASELINE <1e-3 bar's scale)
        "mae_int8_vs_torch": mae_int8_vs_torch
        if isinstance(mae_int8_vs_torch, str)
        else round(mae_int8_vs_torch, 6),
        "mae_bf16_vs_torch": None
        if mae_bf16_vs_torch is None
        else round(mae_bf16_vs_torch, 6),
        "mae_int8_vs_torch_rel_span": None if rel is None else round(rel, 6),
    }
    if size == 512:
        # Roofline vs the >=2000 img/s north star — settled by the round-3
        # per-layer measurement campaign AT 512px (docs/WINOGRAD.md): int8
        # Winograd F(2,3) was built and measured DEAD on v5e (transforms
        # alone cost 9x the conv; no int16 VPU subtract), the per-layer
        # table shows the engine within ~1% of its measured ceiling, and
        # literal 100%-MFU-everywhere plus the measured int8 elementwise
        # floor caps one v5e chip at ~1870 img/s. 2000 needs a faster-int8
        # chip (v5p/v6e) or a smaller network. These constants are specific
        # to the 512px workload, so --size overrides omit them (their
        # size-correct comparator is bf16_img_per_sec above).
        result.update(
            roofline_bf16_peak_img_per_sec=1284,
            roofline_int8_100pct_mfu_img_per_sec=1870,
            measured_per_layer_ceiling_img_per_sec=1150,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
