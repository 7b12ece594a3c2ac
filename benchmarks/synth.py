"""Shared synthetic PACS-shaped tree for the pipeline harnesses.

benchmarks/e2e_stylize.py and benchmarks/host_pipeline_ab.py must run the
SAME workload (content count, per-style count, size, jpg layout, rng
recipe) for BENCH_E2E.json and BENCH_HOST_PIPELINE.json to be directly
comparable — this is the single generator both import. Domain order is
`ccst_tpu.config.DATASETS["pacs"].domains` with art_painting (the content
domain) first, so ``content_only`` leaves the content images' rng stream
bit-identical to the full build.
"""
from __future__ import annotations

import os

import numpy as np


def build_pacs_tree(
    root: str,
    n_content: int,
    n_per_style: int,
    size: int,
    content_only: bool = False,
    seed: int = 0,
):
    """Write the jpg tree + txt lists; returns the domain tuple.

    ``content_only`` skips the style-domain images/lists for harnesses that
    fabricate style banks directly and never read them (host_pipeline_ab).
    """
    import ccst_tpu.config as cc
    from ccst_tpu.data.lists import write_list
    from ccst_tpu.data.loader import save_image_u8

    rng = np.random.default_rng(seed)
    domains = cc.DATASETS["pacs"].domains
    for d in domains:
        if content_only and d != "art_painting":
            continue
        n = n_content if d == "art_painting" else n_per_style
        names, labels = [], []
        for i in range(n):
            rel = f"PACS/kfold/{d}/cls/img{i:03d}.jpg"
            img = np.clip(
                rng.normal(0.5, 0.2, (size, size, 3)), 0, 1
            ).astype(np.float32)
            save_image_u8(img, os.path.join(root, rel))
            names.append(rel)
            labels.append(0)
        write_list(
            os.path.join(root, "txt_lists", "pacs", f"{d}_train.txt"),
            names, labels,
        )
    return domains
