"""Drive every DG plugin on the real chip via the production CLI.

VERDICT r4 #4: the DG plugins (RSC's two-pass vjp, Jigsaw's two-head loss,
MixStyle, FedDG's FOMAML step, fedprox) had only CPU-mesh equivalence tests;
this repo's own history says "compiles on CPU" is weak evidence for the
tunnel (the SLE-resize subgraph compiled instantly on CPU and took >28 min
remotely until round 4 root-caused it). This driver runs each plugin through
the REAL `ccst-tpu fed-train` CLI on a synthetic PACS-shaped tree at the
production training resolution (222px, resnet18, sequential-simulation
runner like the reference), with the persistent compile cache on, and
records per-plugin compile wall (round-0 seconds, which includes every
jit's first call) vs steady-state wall (round-1 seconds) plus final losses.

Also drives the two eval-time paths: `fed-test --tent` (entropy-min BN
adaptation) and `fed-test --in-test` (BN->affine-IN rewrite) on the saved
no_DG checkpoint.

Output: benchmarks/EXPERIMENT_DG_CHIP.json + a table for docs/STATUS.md.

Run: python benchmarks/dg_chip_drive.py [--rounds 2] [--image-size 222]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def make_tree(root: str) -> None:
    from ccst_tpu.data.lists import write_list
    from ccst_tpu.data.loader import save_image_u8

    rng = np.random.default_rng(5)
    for d in ["art_painting", "cartoon", "photo", "sketch"]:
        names, labels = [], []
        for ci in range(7):
            for i in range(3):
                rel = f"PACS/kfold/{d}/cls{ci}/img{i}.png"
                base = 0.2 + 0.08 * ci
                save_image_u8(
                    np.clip(rng.normal(base, 0.15, (64, 64, 3)), 0, 1).astype(
                        np.float32
                    ),
                    os.path.join(root, rel),
                )
                names.append(rel)
                labels.append(ci)
        write_list(
            os.path.join(root, "txt_lists", "pacs", f"{d}_train.txt"),
            names, labels,
        )
        write_list(
            os.path.join(root, "txt_lists", "pacs", f"{d}_test.txt"),
            names[:5], labels[:5],
        )


def run_cli(argv, timeout=2400, env_extra=None):
    """Run a CLI subcommand; on timeout return (None, wall) instead of raising.

    A single pathological remote compile (e.g. the pre-fix Jigsaw gather,
    docs/STATUS.md r5) must not abort the whole plugin matrix — record it
    and move on. subprocess.run kills the child on timeout, releasing the
    chip lock for the next plugin.
    """
    env = dict(os.environ)
    env["CCST_COMPILE_CACHE"] = env.get("CCST_COMPILE_CACHE", "1")
    if env_extra:
        env.update(env_extra)
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "ccst_tpu.cli"] + argv,
            capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return None, time.perf_counter() - t0
    wall = time.perf_counter() - t0
    return proc, wall


def round_seconds(log_path: str):
    rounds = {}
    with open(log_path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("event") == "round":
                rounds[rec["round"]] = rec
    return rounds


# every label a complete chip matrix must carry with rc 0
ALL_LABELS = (
    "fedavg_no_DG", "RSC", "Jigsaw", "MixStyle", "feddg", "fedprox",
    "fed-test_tent", "fed-test_in_test",
)


def merge_resume(prior: dict, fresh: dict) -> dict:
    """Merge a fresh partial matrix into a prior artifact.

    Keeps every curated top-level key of the prior artifact (config, tier,
    note, cpu_mesh_matrix, ...), refreshes the keys the fresh run measured,
    and keeps prior per-plugin runs that the fresh run did not repeat —
    fresh runs win on conflict (recorded later via results["runs"][label]).
    """
    prior = dict(prior)
    prior_runs = prior.pop("runs", {})
    prior.update(fresh)
    prior["runs"] = dict(prior_runs)
    prior["runs"].update(fresh.get("runs", {}))
    return prior


def finalize_matrix(results: dict) -> dict:
    """Recompute pending_on_chip/tier from what actually landed rc 0."""
    pending = [
        lbl for lbl in ALL_LABELS
        if results.get("runs", {}).get(lbl, {}).get("rc") != 0
    ]
    if pending:
        results["pending_on_chip"] = pending
        results["tier"] = "chip-partial"
    else:
        results.pop("pending_on_chip", None)
        results["tier"] = "chip-full"
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--image-size", type=int, default=222)
    ap.add_argument("--network", default="resnet18")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "EXPERIMENT_DG_CHIP.json"))
    ap.add_argument(
        "--only", default=None,
        help="comma-separated plugin labels to run (others are skipped); "
        "results merge into an existing --out JSON so a crashed matrix can "
        "be resumed without re-paying completed plugins",
    )
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="ccst_dg_chip_")
    make_tree(root)

    base = [
        "fed-train", "--dataset", "pacs", "--target", "photo",
        "--network", args.network, "--rounds", str(args.rounds),
        "--wk-iters", "1", "--batch-size", str(args.batch_size),
        "--image-size", str(args.image_size), "--lr", "0.01",
        "--data-root", root, "--list-root", root,
        "--save-freq", "1",
    ]

    # plugin matrix: (label, extra flags)
    plugins = [
        ("fedavg_no_DG", []),
        ("RSC", ["--dg-method", "RSC"]),
        ("Jigsaw", ["--dg-method", "Jigsaw"]),
        ("MixStyle", ["--dg-method", "MixStyle"]),
        ("feddg", ["--dg-method", "feddg"]),
        ("fedprox", ["--mode", "fedprox", "--mu", "0.001"]),
    ]
    only = set(args.only.split(",")) if args.only else None
    if only is not None:
        plugins = [p for p in plugins if p[0] in only]

    # FedDG needs the amplitude banks on disk first (kfold_amp layout),
    # one per source domain; the bank is a host-side FFT — run it on CPU
    amp_wall = 0.0
    for d in ("art_painting", "cartoon", "sketch"):
        proc, wall = run_cli([
            "amp-bank", "--dataset", "pacs", "--domain", d,
            "--list-root", root, "--data-root", root, "--out-root", root,
            "--image-size", str(args.image_size),
        ], env_extra={"CCST_PLATFORM": "cpu"})
        assert proc is not None and proc.returncode == 0, (
            proc.stderr[-3000:] if proc else "amp-bank timed out"
        )
        amp_wall += wall
    results = {"amp_bank_seconds": round(amp_wall, 1), "runs": {}}
    if only is not None and os.path.exists(args.out):
        # resume: keep every top-level key of the existing artifact (config,
        # tier, note, cpu_mesh_matrix, ...) and merge into its runs table —
        # a partial re-run must never clobber curated context
        with open(args.out) as f:
            prior = json.load(f)
        results = merge_resume(prior, results)

    ckpt_for_eval = None
    for label, extra in plugins:
        save = os.path.join(root, f"ckpt_{label}")
        logd = os.path.join(root, f"logs_{label}")
        proc, wall = run_cli(
            base + extra + ["--save-path", save, "--log-path", logd]
        )
        if proc is None:
            rec = {"rc": "timeout", "wall_seconds": round(wall, 1)}
            results["runs"][label] = rec
            print(json.dumps({label: rec}), flush=True)
            continue
        rec = {"rc": proc.returncode, "wall_seconds": round(wall, 1)}
        if proc.returncode == 0:
            import glob

            log = glob.glob(os.path.join(logd, "*.jsonl"))[0]
            rounds = round_seconds(log)
            last = rounds[args.rounds - 1]
            # sequential-runner rounds log per-client losses
            # (train_loss/<client>); average them for the table
            losses = [v for k, v in last.items() if k.startswith("train_loss")]
            loss_mean = float(np.mean(losses)) if losses else float("nan")
            rec.update(
                round0_seconds=round(rounds[0]["seconds"], 1),
                round1_seconds=round(last["seconds"], 1),
                train_loss_final=round(loss_mean, 4),
                val_acc_final=round(last["val_acc_mean"], 4),
                loss_finite=bool(np.isfinite(loss_mean)),
            )
            if label == "fedavg_no_DG":
                ckpt_for_eval = (save, logd)
        else:
            rec["stderr_tail"] = proc.stderr[-1500:]
        results["runs"][label] = rec
        print(json.dumps({label: rec}), flush=True)

    # eval-time paths on the no_DG checkpoint
    if ckpt_for_eval:
        save, logd = ckpt_for_eval
        for label, extra in (
            ("tent", ["--tent"]),
            ("in_test", ["--in-test"]),
        ):
            proc, wall = run_cli([
                "fed-test", "--dataset", "pacs", "--target", "photo",
                "--network", args.network,
                "--image-size", str(args.image_size),
                "--batch-size", str(args.batch_size),
                "--data-root", root, "--list-root", root,
                "--save-path", save, "--log-path", logd,
                "--checkpoint", "latest",
            ] + extra)
            if proc is None:
                rec = {"rc": "timeout", "wall_seconds": round(wall, 1)}
            else:
                rec = {"rc": proc.returncode, "wall_seconds": round(wall, 1)}
                if proc.returncode == 0:
                    rec["stdout_tail"] = proc.stdout.strip().splitlines()[-1]
                else:
                    rec["stderr_tail"] = proc.stderr[-1500:]
            results["runs"][f"fed-test_{label}"] = rec
            print(json.dumps({f"fed-test_{label}": rec}), flush=True)

    finalize_matrix(results)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
