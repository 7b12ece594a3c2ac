"""Profiling helpers (SURVEY §5.1: the reference's only instrumentation is
wall-clock deltas written to txt files; the TPU equivalent adds real
``jax.profiler`` traces alongside the timing artifacts)."""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``trace_dir`` when set (viewable in
    TensorBoard / Perfetto); no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


class StageTimer:
    """Wall-clock stage timer producing the reference-style timing record
    (images, seconds, img/s) as a dict — the machine-readable form of
    e.g. ``pacs_art_painting_overall_stylize_time.txt``."""

    def __init__(self) -> None:
        self.t0 = time.perf_counter()
        self.images = 0

    def add(self, n: int) -> None:
        self.images += n

    def report(self, **extra) -> dict:
        dt = time.perf_counter() - self.t0
        return {
            "images": self.images,
            "seconds": dt,
            "images_per_sec": self.images / max(dt, 1e-9),
            **extra,
        }
