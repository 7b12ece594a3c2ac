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
