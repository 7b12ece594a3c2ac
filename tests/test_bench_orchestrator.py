"""The round-4 crash-resilience contract of bench.py (VERDICT r3 weak #1).

The round-3 driver artifact was a traceback because the TPU worker died at
the first ``device_rate`` call and the in-process bench discarded everything
already measured. These tests pin the hardened behavior on the host:

* full path: orchestrator → lockfile → child process → incremental
  BENCH_PARTIAL.json → merged single-line JSON (CPU platform, tiny shapes);
* crash isolation: a child killed mid-measurement leaves a parseable
  partial artifact and the orchestrator still prints valid JSON with an
  ``error`` field (exit 1, never a traceback);
* the lockfile enforces benchmarks/README.md's one-axon-process rule.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _env(tmp_path, **extra):
    env = dict(os.environ)
    env.update(
        CCST_BENCH_PLATFORM="cpu",
        CCST_BENCH_FAST="1",
        CCST_BENCH_LOCKFILE=str(tmp_path / "lock"),
        CCST_BENCH_PARTIAL=str(tmp_path / "partial.json"),
        XLA_FLAGS="",  # no virtual mesh needed; keep child start cheap
    )
    env.update(extra)
    return env


def _last_json_line(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    return json.loads(lines[-1])


@pytest.mark.slow
def test_orchestrated_single_size_cpu(tmp_path):
    """End-to-end on the host: one tiny phase, real child process, real
    measurements; the final line is the ONE JSON line the driver parses."""
    # 32px/batch-2: XLA *CPU* runs int8 convs through a scalar path
    # (~22 s for ONE 64px batch-4 forward, measured round 4) — tiny shapes
    # keep the real-code-path smoke under a couple of minutes
    proc = subprocess.run(
        [sys.executable, BENCH, "--size", "32", "--batch", "2"],
        env=_env(tmp_path), capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _last_json_line(proc.stdout)
    assert out["metric"] == "stylize_img_per_sec_32px"
    assert out["value"] > 0
    assert out["vs_baseline"] == round(out["value"] / 75.9, 2)
    assert out["engine"] == "int8-static"
    assert out["quality_psnr_db"] > 20
    assert out["mae_int8_vs_torch"] < 0.05  # random-init weights; sanity only
    # incremental artifact exists and already carries the same number
    partial = json.loads((tmp_path / "partial.json").read_text())
    assert partial["32"]["value"] == out["value"]
    # 512px-only roofline constants must NOT leak into other sizes, and a
    # SUCCESSFUL non-512 run must not carry a bogus "did not complete" error
    assert "roofline_int8_100pct_mfu_img_per_sec" not in out
    assert "error" not in out


@pytest.mark.slow
def test_orchestrated_single_mode_cpu(tmp_path):
    """Single-mode phase end-to-end on the host (VERDICT r4 #3): per-batch
    on-device style-image stats + transfer, real child process, MAE vs the
    torch twin computing its own per-image style stats."""
    proc = subprocess.run(
        [sys.executable, BENCH, "--size", "32", "--batch", "2", "--mode", "single"],
        env=_env(tmp_path), capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _last_json_line(proc.stdout)
    assert out["metric"] == "stylize_img_per_sec_32px_single"
    assert out["value"] > 0
    assert out["quality_psnr_db"] > 20
    assert out["mae_int8_vs_torch"] < 0.05
    partial = json.loads((tmp_path / "partial.json").read_text())
    assert partial["32-single"]["value"] == out["value"]


def test_lockfile_excludes_second_process(tmp_path):
    """While one orchestrator holds the lock, a second prints a diagnostic
    JSON (not a hang, not a traceback) and exits 2."""
    import fcntl

    lock = str(tmp_path / "lock")
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        proc = subprocess.run(
            [sys.executable, BENCH],
            env=_env(tmp_path), capture_output=True, text=True, timeout=120, cwd=REPO,
        )
        assert proc.returncode == 2
        out = _last_json_line(proc.stdout)
        assert out["value"] is None
        assert "exclusive" in out["error"]
    finally:
        os.close(fd)


def test_child_crash_leaves_parseable_artifact(tmp_path, monkeypatch):
    """Simulate the round-3 failure: the measurement child dies after
    calibration but before the headline lands. The orchestrator must retry
    once, then emit valid JSON with an error field and exit 1 — and the
    partial artifact must keep whatever phases DID complete."""
    monkeypatch.setenv("CCST_BENCH_LOCKFILE", str(tmp_path / "lock"))
    monkeypatch.setenv("CCST_BENCH_PARTIAL", str(tmp_path / "partial.json"))
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    # env knobs are read at import; repoint the loaded module directly
    bench.LOCKFILE = str(tmp_path / "lock")
    bench.PARTIAL_PATH = str(tmp_path / "partial.json")

    calls = []

    def fake_child(phase, timeout_s, current):
        size, _batch, mode = phase
        calls.append(size)
        # a completed prior phase survives; the crashing phase only got as
        # far as calibration
        partial = bench._load_partial()
        if size == 512 and mode == "overall":
            partial["512"] = {"metric": "stylize_img_per_sec_512px", "calibrated": True}
            bench._flush_partial(partial)
            return -11  # SIGSEGV'd child
        if mode == "single":
            partial["512-single"] = {
                "metric": "stylize_img_per_sec_512px_single", "value": 1300.0,
                "vs_baseline": 17.13, "quality_psnr_db": 54.0,
            }
            bench._flush_partial(partial)
            return 0
        partial["256"] = {
            "metric": "stylize_img_per_sec_256px", "value": 4521.21,
            "vs_baseline": 59.57, "bf16_img_per_sec": 1817.0, "bf16_batch": 128,
            "quality_psnr_db": 65.2, "mae_int8_vs_torch": 4e-05,
        }
        bench._flush_partial(partial)
        return 0

    bench._run_child = fake_child
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = bench._orchestrate(
            [(512, 128, "overall"), (256, 128, "overall"), (512, 128, "single")]
        )
    assert rc == 1
    assert calls == [512, 512, 256, 512]  # one retry of the crashed phase
    out = _last_json_line(buf.getvalue())
    assert out["metric"] == "stylize_img_per_sec_512px"
    assert out["value"] is None
    assert "did not complete" in out["error"]
    # the completed 256px phase is STILL in the driver-visible JSON
    assert out["at_256px"]["value"] == 4521.21
    # and the single-mode phase lands in its own block (VERDICT r4 #3)
    assert out["single_mode"]["512px"]["value"] == 1300.0
    partial = json.loads((tmp_path / "partial.json").read_text())
    assert partial["512"]["calibrated"] is True


def test_backend_watchdog_rc3_skips_remaining_phases(tmp_path, monkeypatch):
    """rc 3 (backend-init watchdog) means the tunnel is down: no retry, no
    further phases — fail fast with the diagnostic JSON."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod2", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.LOCKFILE = str(tmp_path / "lock")
    bench.PARTIAL_PATH = str(tmp_path / "partial.json")

    calls = []
    bench._run_child = lambda phase, t, cur: (calls.append(phase[0]), 3)[1]

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = bench._orchestrate([(512, 128, "overall"), (256, 128, "overall")])
    assert rc == 1
    assert calls == [512]  # no retry against a wedged grant; 256 skipped
    out = _last_json_line(buf.getvalue())
    assert out["value"] is None


def test_direct_inner_respects_lockfile(tmp_path):
    """A direct --inner one-off (no orchestrator) must also honor the
    one-axon-process lock: fail fast with the diagnostic JSON, exit 2."""
    import fcntl

    fd = os.open(str(tmp_path / "lock"), os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        proc = subprocess.run(
            [sys.executable, BENCH, "--inner", "--size", "32", "--batch", "2"],
            env=_env(tmp_path), capture_output=True, text=True, timeout=120,
            cwd=REPO,
        )
        assert proc.returncode == 2
        out = _last_json_line(proc.stdout)
        assert out["value"] is None and "exclusive" in out["error"]
    finally:
        os.close(fd)


@pytest.mark.slow
def test_sigterm_mid_run_still_emits_json(tmp_path):
    """Driver timeout scenario: SIGTERM the orchestrator while a child is
    measuring. The last stdout line must STILL be valid JSON (carrying any
    completed phases + a signal note) — the round-3 failure mode was a
    non-JSON artifact in exactly this case."""
    import signal
    import time as _time

    proc = subprocess.Popen(
        [sys.executable, BENCH, "--size", "32", "--batch", "2"],
        env=_env(tmp_path), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, cwd=REPO,
    )
    # wait until the child process has started measuring (partial exists)
    deadline = _time.time() + 300
    while _time.time() < deadline and not (tmp_path / "partial.json").exists():
        _time.sleep(0.5)
    assert (tmp_path / "partial.json").exists(), "child never started"
    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=120)
    assert proc.returncode == 128 + signal.SIGTERM
    out = _last_json_line(stdout)
    assert "terminated by signal 15" in out["error"]
