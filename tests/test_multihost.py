"""Multi-host (DCN) federation: 2 real jax.distributed processes on CPU.

The TPU-native equivalent of the reference's only true distributed path —
the NCCL DDP template (reconstruct_img/imagenet_reconstruct.py:141-175) —
per SURVEY.md §2.8/§5.8: processes join via jax.distributed.initialize, the
client mesh axis sits on the process boundary, and FedAvg is a weighted
cross-process reduction inserted by XLA (Gloo collectives on CPU). Both
processes must compute the identical aggregated server model.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_fedavg_agrees():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err[-2000:]}"
        digest = [l for l in out.splitlines() if l.startswith("DIGEST ")]
        assert digest, f"no digest in: {out}"
        outs.append(digest[-1])
    assert outs[0] == outs[1], f"server params diverged across hosts: {outs}"
