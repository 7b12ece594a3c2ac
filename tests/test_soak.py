"""Scaled-down soak (benchmarks/soak_stylize.py) on CPU: the full
filter-blank -> banks -> stylize streaming chain with RSS bounds.

The real ≥10k-image runs happen on the TPU chip (BENCH_SOAK.json); this
keeps the harness and its memory-stability contract exercised in CI.
"""
import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_soak():
    spec = importlib.util.spec_from_file_location(
        "soak_stylize", os.path.join(REPO, "benchmarks", "soak_stylize.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_soak_small_cpu(tmp_path):
    soak = _load_soak()
    root = str(tmp_path / "soak")
    os.makedirs(root)
    n, n_blank_expected = 400, 20
    counts = soak.build_tree(
        root, n_content=n, n_style=40, px=48, blank_frac=0.05
    )
    assert counts["hospital1"] == (n, n_blank_expected)
    result = soak.run_soak(
        root, image_size=48, output_size=48, batch=32,
        engine="ref", dtype="float32",
    )
    # blank filter dropped exactly the blanks
    assert result["kept_after_blank_filter"]["hospital1"] == n - n_blank_expected
    assert result["content_images"] == n - n_blank_expected
    assert result["outputs_written"] == (n - n_blank_expected) * 4
    assert result["value"] > 0
    # streaming memory contract: steady-state RSS must not creep. 300 MB
    # absorbs allocator noise at this scale; an unbounded writeback queue or
    # a loader leak shows up as multi-GB growth at 4x outputs.
    growth = result["rss_growth_2nd_half_mb"]
    if growth is not None:  # needs >=2 samples; stylize may be too fast
        assert growth < 300, result
    # every output actually landed on disk
    out_dir = os.path.join(
        root, "camelyon17", "all_style_transferred_Overall", "hospital1"
    )
    written = sum(len(fs) for _, _, fs in os.walk(out_dir))
    assert written == result["outputs_written"]
