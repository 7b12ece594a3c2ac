"""Tests for the bounded tunnel-liveness probe (benchmarks/tunnel_probe.py).

The probe is the safe-recovery primitive for the exclusive TPU pool grant
(benchmarks/README.md): it must (a) complete a real device computation and
exit 0 when a backend answers, and (b) self-terminate with rc 3 when the
backend never grants, WITHOUT the parent ever holding a claim. Both paths
are exercised here on the CPU backend (the probe body takes the platform as
an argument precisely so the contract is testable off-tunnel).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "benchmarks", "tunnel_probe.py")


def test_probe_ok_on_cpu():
    proc = subprocess.run(
        [sys.executable, PROBE, "--platform", "cpu", "--watchdog", "120"],
        capture_output=True, text=True, timeout=240, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # last line is the probe's JSON verdict; the matmul check is 256*1=256
    assert '"probe": "ok"' in proc.stdout
    assert '"check": 256.0' in proc.stdout


def test_probe_watchdog_rc3():
    # A watchdog far shorter than `import jax` fires before the probe body
    # can complete -> the subprocess must self-terminate with rc 3 and the
    # parent must propagate it (never hang).
    proc = subprocess.run(
        [sys.executable, PROBE, "--platform", "cpu", "--watchdog", "0.01"],
        capture_output=True, text=True, timeout=240, cwd=REPO,
    )
    assert proc.returncode == 3, proc.stdout + proc.stderr
    assert '"probe": "timeout"' in proc.stdout


def test_probe_loop_then_chains_command(tmp_path):
    marker = tmp_path / "ran"
    proc = subprocess.run(
        [sys.executable, PROBE, "--platform", "cpu", "--watchdog", "120",
         "--loop", "--attempts", "2", "--interval", "1",
         "--then", sys.executable, "-c",
         f"open({str(marker)!r}, 'w').write('x')"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert marker.exists()


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))


def test_dg_chip_resume_merge_and_finalize():
    """dg_chip_drive resume contract: curated keys survive, fresh runs win,
    pending_on_chip/tier recompute from what actually landed rc 0."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dg_chip_drive", os.path.join(REPO, "benchmarks", "dg_chip_drive.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    prior = {
        "config": {"image_size": 222},
        "tier": "chip-partial",
        "note": "curated",
        "cpu_mesh_matrix": {"runs": {}},
        "pending_on_chip": ["Jigsaw"],
        "runs": {
            "fedavg_no_DG": {"rc": 0},
            "RSC": {"rc": 0},
            "Jigsaw": {"rc": "timeout"},
        },
    }
    fresh = {"amp_bank_seconds": 1.0, "runs": {}}
    merged = mod.merge_resume(prior, fresh)
    # curated context intact, fresh measurement refreshed, prior runs kept
    assert merged["note"] == "curated"
    assert merged["cpu_mesh_matrix"] == {"runs": {}}
    assert merged["amp_bank_seconds"] == 1.0
    assert merged["runs"]["RSC"] == {"rc": 0}
    # a resumed plugin run overwrites its prior (timeout) record
    merged["runs"]["Jigsaw"] = {"rc": 0}

    # still incomplete: everything else is pending
    mod.finalize_matrix(merged)
    assert merged["tier"] == "chip-partial"
    assert set(merged["pending_on_chip"]) == {
        "MixStyle", "feddg", "fedprox", "fed-test_tent", "fed-test_in_test"
    }

    # all labels rc 0 -> chip-full, no pending key
    for lbl in mod.ALL_LABELS:
        merged["runs"].setdefault(lbl, {"rc": 0})
    mod.finalize_matrix(merged)
    assert merged["tier"] == "chip-full"
    assert "pending_on_chip" not in merged
