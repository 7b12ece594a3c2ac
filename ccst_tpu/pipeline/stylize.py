"""Cross-client style transfer (CCST pipeline stage 2).

TPU-native rebuild of the stylize CLIs
(style_transfer/AdaIN/CCST_OverallStyleTransfer.py and
CCST_SingleStyleTransfer.py): for a content domain, produce a stylized copy
of every train image under each other source domain's style.

Design:
  - One jitted ``stylize_batch`` (encode -> adain_from_stats -> alpha blend
    -> decode [-> optional resize]) reused across all styles; style stats are
    runtime inputs so there is exactly one compilation.
  - bfloat16 activations/weights with float32 statistics; parity mode (fp32)
    for verification.
  - Host IO (decode ahead / encode behind) overlaps device compute via the
    threaded loader and a write-back thread pool.
  - "Overall" mode uses a shared per-domain bank; "single" mode samples one
    random style image per content batch and computes its relu4_1 stats
    on-device (CCST_SingleStyleTransfer.py:195-208), seeded like the
    reference (seed=1).
"""
from __future__ import annotations

import concurrent.futures as cf
import json
import os
import random
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccst_tpu.config import StylizeConfig, dataset_spec
from ccst_tpu.data.lists import (
    parse_list,
    stylized_output_path,
    train_list_path,
)
from ccst_tpu.data.loader import ImageBatchLoader, save_image_u8
from ccst_tpu.models import vgg
from ccst_tpu.ops.adain import adain_from_stats, alpha_blend, calc_mean_std

Array = jax.Array


def resize_bilinear(images: Array, size: int) -> Array:
    """Antialiased bilinear resize (torchvision Resize parity for
    downscaling, e.g. camelyon17's 512 -> 96, CCST_OverallStyleTransfer.py:154)."""
    n, h, w, c = images.shape
    return jax.image.resize(
        images, (n, size, size, c), method="bilinear", antialias=True
    )


class StylizeEngine:
    """Compiled AdaIN stylization on one device.

    Weights are cast once to the compute dtype and kept on device.

    ``engine`` selects the executor (models/vgg_fast.py; v5e 512px
    multi-style rates at batch 32, except as noted — docs/STATUS.md has the
    full measurement history):
      - ``ref``          bf16 reference executor, <1e-3-MAE torch parity (454 img/s)
      - ``packed``       bf16, space-to-depth level-1 stage, exact          (454 img/s)
      - ``int8``         dynamic per-tensor int8 quantization               (616 img/s)
      - ``int8-static``  int8 e2e, calibrated static scales (956; **1110 at b128**)
      - ``int8-fused``   int8-static + fused level-1 Pallas encoder (same outputs)
    ``int8-static``/``int8-fused`` self-calibrate on the first batch +
    style bank seen (or call :meth:`calibrate` with representative data).
    """

    def __init__(
        self,
        encoder_params,
        decoder_params,
        *,
        dtype=jnp.bfloat16,
        output_size: int = -1,
        output_u8: bool = False,
        engine: str = "ref",
        scales: Optional[Dict[str, float]] = None,
    ):
        self.dtype = jnp.dtype(dtype)
        self.enc = jax.tree.map(lambda x: jnp.asarray(x, self.dtype), encoder_params)
        self.dec = jax.tree.map(lambda x: jnp.asarray(x, self.dtype), decoder_params)
        self.output_size = output_size
        self.output_u8 = output_u8
        self.engine = engine
        self.scales = scales  # persisted calibration (vgg_fast.load_scales)
        self._needs_calibration = (
            engine in ("int8-static", "int8-fused") and scales is None
        )
        self._build(scales=scales)

    def _build(self, scales) -> None:
        # executors always build from self.enc/self.dec (the dtype-cast
        # copies) — there are no other weight sources
        from ccst_tpu.models import vgg_fast

        kind = self.engine
        if kind in ("int8-static", "int8-fused") and scales is None:
            kind = "ref"  # until calibrated
        if kind == "ref":
            encode = lambda x: vgg.apply_encoder(self.enc, x)
            decode = lambda t: vgg.apply_decoder(self.dec, t)
        elif kind == "packed":
            ep = vgg_fast.prepare_encoder(self.enc)
            dp = vgg_fast.prepare_decoder(self.dec)
            encode = lambda x: vgg_fast.apply_encoder_packed(ep, x, self.dtype)
            decode = lambda t: vgg_fast.apply_decoder_packed(dp, t, self.dtype)
        elif kind == "int8":
            ep = vgg_fast.prepare_encoder_q8(self.enc)
            dp = vgg_fast.prepare_decoder_q8(self.dec)
            encode = lambda x: vgg_fast.apply_encoder_q8(ep, x, self.dtype)
            decode = lambda t: vgg_fast.apply_decoder_q8(dp, t, self.dtype)
        elif kind == "int8-static":
            ep = vgg_fast.prepare_encoder_q8s(self.enc, scales)
            dp = vgg_fast.prepare_decoder_q8s(self.dec, scales)
            encode = lambda x: vgg_fast.apply_encoder_q8s(ep, x, self.dtype)
            decode = lambda t: vgg_fast.apply_decoder_q8s(dp, t, self.dtype)
        elif kind == "int8-fused":
            # int8-static with the encoder level-1 stage as a fused Pallas
            # kernel (kernels/level1_pallas.py, zero-free conv1_2);
            # bit-identical outputs to int8-static (tests/test_kernels.py).
            # The decoder keeps the unfused XLA chain: its fused kernel
            # measured slower (dconv1_1's 12-lane output starves the MXU —
            # benchmarks/fused_step_ab.py).
            ep = vgg_fast.prepare_encoder_q8s(self.enc, scales)
            dp = vgg_fast.prepare_decoder_q8s(self.dec, scales)
            encode = lambda x: vgg_fast.apply_encoder_q8s_fused(ep, x, self.dtype)
            decode = lambda t: vgg_fast.apply_decoder_q8s(dp, t, self.dtype)
        else:
            raise ValueError(f"unknown stylize engine {self.engine!r}")

        def finish(out):
            out = out.astype(jnp.float32)
            if self.output_size > 0:
                out = resize_bilinear(out, self.output_size)
            if self.output_u8:
                # on-device save_image quantization (clamp, x255, +0.5, floor)
                # -> 4x less device->host traffic than float32
                out = jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5
                out = jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)
            return out

        def as_input(images):
            # u8 transport: loaders may ship uint8 batches (4x less h2d
            # traffic than float32 — the PCIe/tunnel leg of the pipeline);
            # normalize on device. Bit-identical to host-side float batches:
            # both are the same integer bytes / 255 in float32.
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            return images.astype(self.dtype)

        @jax.jit
        def _stylize(images, s_mean, s_std, alpha):
            feat = encode(as_input(images))
            t = adain_from_stats(feat, s_mean, s_std)
            t = alpha_blend(t, feat, jnp.asarray(alpha, t.dtype))
            return finish(decode(t))

        @jax.jit
        def _stylize_multi(images, s_means, s_stds, alpha):
            """Encode ONCE, restyle under S style banks in one program.

            The reference's style-major loop re-runs the encoder per style
            (CCST_OverallStyleTransfer.py:138-156) — ~1/3 excess FLOPs for 3
            styles. Outputs are identical: AdaIN consumes the same content
            features either way. s_means/s_stds: (S, C)."""
            feat = encode(as_input(images))

            def one(s_mean, s_std):
                t = adain_from_stats(feat, s_mean, s_std)
                t = alpha_blend(t, feat, jnp.asarray(alpha, t.dtype))
                return finish(decode(t))

            return jax.lax.map(lambda ms: one(*ms), (s_means, s_stds))

        @jax.jit
        def _style_stats(image):
            feat = vgg.apply_encoder(self.enc, image)
            # single style image: population (biased) stats like the
            # reference's calc_sum finalization (CCST_SingleStyleTransfer.py:201-204)
            mean, std = calc_mean_std(feat, ddof=0)
            return mean[0, 0, 0, :], std[0, 0, 0, :]

        self._stylize_fn = _stylize
        self._stylize_multi_fn = _stylize_multi
        self._style_stats_fn = _style_stats

    def calibrate(self, images, style_stats: Sequence[Tuple], max_images: int = 8) -> None:
        """int8-static: one reference-path pass over representative content
        and the style bank, then rebuild the quantized executors. The
        calibration pass runs in float32, so it is capped at ``max_images``
        (a 48-image 512px batch would need ~3 GB per level-1 tensor)."""
        from ccst_tpu.models import vgg_fast

        if self.engine not in ("int8-static", "int8-fused"):
            return
        images = np.asarray(images[:max_images])
        if images.dtype == np.uint8:  # u8-transport batches calibrate in f32
            images = images.astype(np.float32) / 255.0
        scales = vgg_fast.calibrate_scales(
            self.enc, self.dec, jnp.asarray(images),
            [(jnp.asarray(m), jnp.asarray(s)) for m, s in style_stats],
        )
        self.scales = scales
        self._build(scales)
        self._needs_calibration = False

    def _ensure_calibrated(self, images, s_means, s_stds) -> None:
        if self._needs_calibration:
            self.calibrate(images, list(zip(np.asarray(s_means), np.asarray(s_stds))))

    def stylize(self, images: Array, s_mean, s_std, alpha: float = 1.0) -> Array:
        """(B,H,W,3) [0,1] content -> stylized float32 images (unclamped)."""
        self._ensure_calibrated(images, np.asarray(s_mean)[None], np.asarray(s_std)[None])
        return self._stylize_fn(
            images,
            jnp.asarray(s_mean, jnp.float32),
            jnp.asarray(s_std, jnp.float32),
            alpha,
        )

    def stylize_multi(self, images: Array, s_means, s_stds, alpha: float = 1.0) -> Array:
        """(B,H,W,3) content x (S,C) style banks -> (S,B,H,W,3): one encode,
        S decodes, one dispatch."""
        self._ensure_calibrated(images, s_means, s_stds)
        return self._stylize_multi_fn(
            images,
            jnp.asarray(s_means, jnp.float32),
            jnp.asarray(s_stds, jnp.float32),
            alpha,
        )

    def style_stats_of(self, image: Array) -> Tuple[Array, Array]:
        """relu4_1 (mean, std) channel vectors of a single (1,H,W,3) image."""
        return self._style_stats_fn(image)


# ---------------------------------------------------------------------------
# Calibration persistence (int8-static determinism)
# ---------------------------------------------------------------------------


def bank_path_for(cfg: StylizeConfig, style: str) -> str:
    """Style-bank artifact for ``style`` (native .npz, falling back to the
    reference .npy layout). ONE resolution rule shared by the transfer loop
    and calibration, so the persisted int8 scales always correspond to the
    banks stylize actually uses."""
    path = os.path.join(
        cfg.style_stats_dir, cfg.dataset.lower(), f"{style}_mean_std.npz"
    )
    return path if os.path.exists(path) else path[:-4] + ".npy"


def scales_path_for(cfg: StylizeConfig) -> str:
    """Default location of the persisted int8 calibration: next to the style
    banks (``{style_stats_dir}/{dataset}/{target}_q8_scales.json``)."""
    return os.path.join(
        cfg.style_stats_dir, cfg.dataset.lower(), f"{cfg.target}_q8_scales.json"
    )


def run_calibration(
    cfg: StylizeConfig, engine: StylizeEngine, max_images: int = 8,
    out_path: str = "",
) -> str:
    """Deterministic offline calibration for the int8-static engines.

    Batch selection is documented and reproducible: the FIRST ``max_images``
    entries of the target's train list in list order (independent of loader
    threading or batch size), plus every other domain's style bank. Writes
    the scales artifact via :func:`vgg_fast.save_scales` and returns its
    path; ``stylize --scales PATH`` (or the default path) then reloads it,
    making stylized outputs bit-identical across runs and domain orderings.
    """
    from ccst_tpu.data.loader import load_image
    from ccst_tpu.models import vgg_fast
    from ccst_tpu.pipeline.style_bank import load_style_stats

    spec = dataset_spec(cfg.dataset)
    styles = [d for d in spec.domains if d != cfg.target]
    names, _ = parse_list(train_list_path(cfg.list_root, cfg.dataset, cfg.target))
    names = names[:max_images]
    paths = [os.path.join(cfg.data_root, n) if cfg.data_root else n for n in names]
    images = np.stack([load_image(p, cfg.image_size) for p in paths])

    bank = [load_style_stats(bank_path_for(cfg, style)) for style in styles]

    engine.calibrate(images, bank, max_images=max_images)
    if engine.scales is None:
        raise ValueError(
            f"engine {engine.engine!r} does not support static calibration "
            "(use int8-static or int8-fused)"
        )
    return vgg_fast.save_scales(
        out_path or scales_path_for(cfg), engine.scales,
        fingerprint=vgg_fast.weights_fingerprint(engine.enc, engine.dec),
    )


# ---------------------------------------------------------------------------
# Offline transfer drivers
# ---------------------------------------------------------------------------


@dataclass
class TransferReport:
    target: str
    styles: List[str]
    images: int          # content images stylized per style
    seconds: float
    images_per_sec: float
    # pipeline stall attribution: how long the main loop sat blocked on each
    # stage. decode/encode are hidden behind device work when loader_wait,
    # encode_backpressure and encode_drain are all ~ 0 — the direct overlap
    # evidence for the threaded pipeline. (first_batch_wait is the one decode
    # no pipeline could hide: there is no device work in flight yet.)
    loader_wait_seconds: float = 0.0        # waiting for a decoded batch
    fetch_wait_seconds: float = 0.0         # device compute + d2h (additive:
    #                                         emit backpressure is subtracted)
    first_batch_wait_seconds: float = 0.0   # unhideable priming decode
    encode_backpressure_seconds: float = 0.0  # writeback queue full
    encode_drain_seconds: float = 0.0       # final futures drain
    style_decode_wait_seconds: float = 0.0  # single mode: blocked on the
    #                                         prefetched style-image decode


def _content_loader(cfg: StylizeConfig) -> Tuple[ImageBatchLoader, List[str]]:
    names, labels = parse_list(
        train_list_path(cfg.list_root, cfg.dataset, cfg.target)
    )
    paths = (
        [os.path.join(cfg.data_root, n) for n in names] if cfg.data_root else names
    )
    loader = ImageBatchLoader(
        paths,
        labels,
        batch_size=cfg.batch_size,
        image_size=cfg.image_size,
        shuffle=False,
        # u8 transport: content ships to the device as the decoded bytes
        # (1/4 the h2d traffic); the engine normalizes on device,
        # bit-identically to float batches (loader.py::load_image)
        out_dtype="uint8",
    )
    return loader, names


def _out_path_of(cfg: StylizeConfig, rel: str, style: str, mode: str) -> str:
    out_rel = stylized_output_path(rel, cfg.target, style, mode)
    if cfg.save_ext:
        out_rel = os.path.splitext(out_rel)[0] + cfg.save_ext
    return os.path.join(cfg.output_root, out_rel) if cfg.output_root else out_rel


# cap on queued write-back jobs: each pending future pins its stylized image
# array, so an unbounded queue (encode slower than stylize) would buffer a
# whole domain's outputs in RAM
_MAX_INFLIGHT_WRITES = 64


def _writeback(
    pool: cf.Executor,
    outputs: np.ndarray,
    rel_names: Sequence[str],
    cfg: StylizeConfig,
    style: str,
    mode: str,
    futs: List[cf.Future],
) -> float:
    """Queue the batch's images for encoding via _out_path_of (the SAME path
    logic skip_existing checks), applying write-back backpressure. Returns
    the seconds spent blocked on backpressure (encode slower than stylize —
    the only way encoding can stall the main loop before the final drain)."""
    for img, rel in zip(outputs, rel_names):
        futs.append(
            pool.submit(save_image_u8, img, _out_path_of(cfg, rel, style, mode))
        )
    t1 = time.perf_counter()
    while len(futs) > _MAX_INFLIGHT_WRITES:
        futs.pop(0).result()
    return time.perf_counter() - t1


class _DispatchAhead:
    """One-slot dispatch-ahead pipeline for the transfer loops.

    The device->host fetch of batch N runs only after batch N+1 has been
    dispatched, so device compute (and, on the dev harness, the tunnel
    transfer) of N+1 overlaps batch N's fetch, the encode threads, and the
    loader's prefetch. Exactly one extra in-flight output batch lives on
    device (u8: ~S*B*H*W*3 bytes). ``fetch_seconds`` accumulates the wall
    time the main loop sat blocked in fetches, including the final drain.
    The emit callback returns the seconds it spent in encode backpressure;
    that time is SUBTRACTED here (advisor r4: it was double-counted —
    inside both fetch_wait and encode_backpressure), so the TransferReport
    stall fields are additive.
    """

    def __init__(self) -> None:
        self._pending = None   # (device array, emit callback)
        self.fetch_seconds = 0.0

    def push(self, outs_device, emit) -> None:
        prev, self._pending = self._pending, (outs_device, emit)
        if prev is not None:
            self._flush(prev)

    def drain(self) -> None:
        if self._pending is not None:
            self._flush(self._pending)
            self._pending = None

    def _flush(self, p) -> None:
        t1 = time.perf_counter()
        outs_device, emit = p
        backpressure = emit(np.asarray(outs_device)) or 0.0
        self.fetch_seconds += time.perf_counter() - t1 - backpressure


def _run_transfer(cfg: StylizeConfig, engine: StylizeEngine, mode: str) -> TransferReport:
    spec = dataset_spec(cfg.dataset)
    styles = [d for d in spec.domains if d != cfg.target]
    loader, rel_names = _content_loader(cfg)

    single = mode.lower() == "single"
    rng = random.Random(cfg.seed)
    style_lists: Dict[str, List[str]] = {}
    if single:
        for style in styles:
            # prefer blank-filtered lists when present (the reference samples
            # camelyon17 styles from `_discardBlackWhite` lists,
            # CCST_SingleStyleTransfer.py:165-166; `filter-blank` builds them)
            filtered = train_list_path(
                cfg.list_root, f"{cfg.dataset.lower()}_discardBlackWhite", style
            )
            src = (
                filtered
                if os.path.exists(filtered)
                else train_list_path(cfg.list_root, cfg.dataset, style)
            )
            s_names, _ = parse_list(src)
            style_lists[style] = (
                [os.path.join(cfg.data_root, n) for n in s_names]
                if cfg.data_root
                else s_names
            )

    from ccst_tpu.data.loader import load_image
    from ccst_tpu.pipeline.style_bank import load_style_stats

    def stats_of(style: str):
        return load_style_stats(bank_path_for(cfg, style))

    t0 = time.perf_counter()
    n_done = 0

    if not single and not cfg.skip_existing:
        # batch-major fast path: decode each content batch ONCE, encode it
        # ONCE on device, restyle under ALL style banks in one dispatch
        # (the reference's style-major loop re-decodes AND re-encodes per
        # style — 3-4x the host IO and ~1/3 extra FLOPs)
        bank = [stats_of(style) for style in styles]
        s_means = np.stack([m for m, _ in bank])
        s_stds = np.stack([s for _, s in bank])
        with cf.ThreadPoolExecutor(8) as pool:
            offset = 0
            futs: List[cf.Future] = []
            pipe = _DispatchAhead()
            t_loader = t_first = t_bp = 0.0
            it = iter(loader)
            first = True
            while True:
                t1 = time.perf_counter()
                batch = next(it, None)
                dt = time.perf_counter() - t1
                if first:
                    # the first batch's decode has no device work to hide
                    # behind — report it separately, not as a pipeline stall
                    t_first, first = dt, False
                else:
                    t_loader += dt
                if batch is None:
                    break
                # slice to the valid rows ON DEVICE so final-batch padding
                # never crosses the d2h link
                outs = engine.stylize_multi(
                    jnp.asarray(batch.images), s_means, s_stds, cfg.alpha
                )[:, : batch.valid]
                rel = rel_names[offset : offset + batch.valid]
                offset += batch.valid

                def emit(outs_np, rel=rel):
                    nonlocal n_done, t_bp
                    bp = 0.0
                    for si, style in enumerate(styles):
                        bp += _writeback(
                            pool, outs_np[si], rel, cfg, style, mode, futs
                        )
                        n_done += len(rel)
                    t_bp += bp
                    return bp  # _DispatchAhead subtracts it from fetch_wait

                pipe.push(outs, emit)
            pipe.drain()
            t1 = time.perf_counter()
            for f in futs:
                f.result()
            t_drain = time.perf_counter() - t1
        elapsed = time.perf_counter() - t0
        report = TransferReport(
            target=cfg.target,
            styles=styles,
            images=n_done // max(len(styles), 1),
            seconds=elapsed,
            images_per_sec=n_done / max(elapsed, 1e-9),
            loader_wait_seconds=round(t_loader, 3),
            fetch_wait_seconds=round(pipe.fetch_seconds, 3),
            first_batch_wait_seconds=round(t_first, 3),
            encode_backpressure_seconds=round(t_bp, 3),
            encode_drain_seconds=round(t_drain, 3),
        )
        _write_timing(cfg, mode, report)
        return report

    t_loader = t_first = t_bp = t_fetch = t_drain = t_style = 0.0
    with cf.ThreadPoolExecutor(8) as pool:
        for style in styles:
            if not single:
                s_mean, s_std = stats_of(style)
            style_loader, style_rels = loader, rel_names
            if cfg.skip_existing:
                missing = [
                    i
                    for i, rel in enumerate(rel_names)
                    if not os.path.exists(_out_path_of(cfg, rel, style, mode))
                ]
                if not missing:
                    continue
                style_rels = [rel_names[i] for i in missing]
                style_loader = ImageBatchLoader(
                    [loader.paths[i] for i in missing],
                    [loader.labels[i] for i in missing],
                    batch_size=cfg.batch_size,
                    image_size=cfg.image_size,
                    shuffle=False,
                    out_dtype="uint8",
                )
            offset = 0
            futs: List[cf.Future] = []
            pipe = _DispatchAhead()
            it = iter(style_loader)
            first = True

            def read_next():
                """Fetch the next content batch and, in single mode, draw +
                prefetch its style image's decode on the pool (advisor r4:
                that decode ran synchronously on the main thread, outside
                every stall counter, and delayed the next dispatch). Draws
                stay one-per-batch in batch order, so the seeded style
                choices — and the outputs — are bit-identical to the
                unprefetched loop."""
                t1 = time.perf_counter()
                b = next(it, None)
                dt = time.perf_counter() - t1
                sf = None
                if b is not None and single:
                    sf = pool.submit(
                        load_image, rng.choice(style_lists[style]), cfg.image_size
                    )
                return b, sf, dt

            cur = read_next()
            while True:
                batch, style_fut, dt = cur
                if first:
                    t_first += dt
                    first = False
                else:
                    t_loader += dt
                if batch is None:
                    break
                # prefetch the NEXT batch (and its style decode) before
                # blocking on this batch's style image
                cur = read_next()
                if single:
                    t1 = time.perf_counter()
                    style_img = style_fut.result()
                    t_style += time.perf_counter() - t1
                    s_mean, s_std = engine.style_stats_of(
                        jnp.asarray(style_img)[None]
                    )
                out = engine.stylize(
                    jnp.asarray(batch.images), s_mean, s_std, cfg.alpha
                )[: batch.valid]
                rel = style_rels[offset : offset + batch.valid]
                offset += batch.valid

                def emit(out_np, rel=rel, style=style):
                    nonlocal n_done, t_bp
                    bp = _writeback(pool, out_np, rel, cfg, style, mode, futs)
                    t_bp += bp
                    n_done += len(rel)
                    return bp  # _DispatchAhead subtracts it from fetch_wait

                pipe.push(out, emit)
            pipe.drain()
            t_fetch += pipe.fetch_seconds
            t1 = time.perf_counter()
            for f in futs:
                f.result()
            t_drain += time.perf_counter() - t1

    elapsed = time.perf_counter() - t0
    report = TransferReport(
        target=cfg.target,
        styles=styles,
        images=n_done // max(len(styles), 1),
        seconds=elapsed,
        images_per_sec=n_done / max(elapsed, 1e-9),
        loader_wait_seconds=round(t_loader, 3),
        fetch_wait_seconds=round(t_fetch, 3),
        first_batch_wait_seconds=round(t_first, 3),
        encode_backpressure_seconds=round(t_bp, 3),
        encode_drain_seconds=round(t_drain, 3),
        style_decode_wait_seconds=round(t_style, 3),
    )
    _write_timing(cfg, mode, report)
    return report


def _write_timing(cfg: StylizeConfig, mode: str, report: TransferReport) -> None:
    """Timing artifact equivalent to e.g.
    ``pacs_art_painting_overall_stylize_time.txt``
    (CCST_OverallStyleTransfer.py:171-175)."""
    root = cfg.output_root or "."
    os.makedirs(root, exist_ok=True)
    path = os.path.join(
        root, f"{cfg.dataset.lower()}_{cfg.target}_{mode.lower()}_stylize_time.json"
    )
    with open(path, "w") as f:
        json.dump(
            {
                "target": report.target,
                "styles": report.styles,
                "seconds": report.seconds,
                "images_per_style": report.images,
                "images_per_sec": report.images_per_sec,
                "image_size": cfg.image_size,
                "batch_size": cfg.batch_size,
                "loader_wait_seconds": report.loader_wait_seconds,
                "fetch_wait_seconds": report.fetch_wait_seconds,
                "first_batch_wait_seconds": report.first_batch_wait_seconds,
                "encode_backpressure_seconds": report.encode_backpressure_seconds,
                "encode_drain_seconds": report.encode_drain_seconds,
                "style_decode_wait_seconds": report.style_decode_wait_seconds,
            },
            f,
            indent=2,
        )


def run_overall_transfer(cfg: StylizeConfig, engine: StylizeEngine) -> TransferReport:
    """Domain-bank ("Overall") cross-client transfer
    (CCST_OverallStyleTransfer.py:138-167)."""
    return _run_transfer(cfg, engine, "overall")


def run_single_transfer(cfg: StylizeConfig, engine: StylizeEngine) -> TransferReport:
    """Per-batch random single-style transfer
    (CCST_SingleStyleTransfer.py:163-224)."""
    return _run_transfer(cfg, engine, "single")
