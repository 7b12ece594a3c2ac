"""The privacy FINDING (not just the plumbing) on the CPU tier
(VERDICT r4 #2): a per-image style vector reconstructs its image at
meaningfully higher PSNR than the shared domain-level Overall statistic —
which lands at or below the mean-image baseline (the best any single fixed
reconstruction can average). Mirrors reconstruct_img/test.py:193-230 vs
test_overall.py:100-126; the full-size on-chip run is
EXPERIMENT_PRIVACY.json via experiments/privacy_leakage.py."""
import pytest

pytestmark = pytest.mark.slow  # trains an inverter; dev tier skips


def test_per_image_beats_overall(tmp_path):
    from experiments.privacy_leakage import run

    summary = run(
        str(tmp_path), str(tmp_path / "out.json"), str(tmp_path / "grids"),
        size=32, n_per_class=6, steps=300, ae_steps=300, batch=8,
        sources=("rot0",),
    )
    r = summary["per_source"]["rot0"]
    # measured on this tier: per-image ~19.5 dB, overall ~11.6, mean ~13.9
    # (gap 7.9 dB); the 2 dB margin is far above seed noise and far below
    # the real effect
    assert r["leakage_gap_db"] > 2.0, r
    # the overall reconstruction must NOT beat the mean-image baseline by
    # any meaningful amount — domain-level stats identify no single image
    assert (
        r["overall"]["psnr_mean"]
        <= r["mean_image_baseline"]["psnr_mean"] + 0.5
    ), r
    # grids + machine-readable artifact exist
    assert (tmp_path / "out.json").exists()
    assert (tmp_path / "grids" / "rot0" / "overall.png").exists()
    assert (tmp_path / "grids" / "rot0" / "recon_0.png").exists()
