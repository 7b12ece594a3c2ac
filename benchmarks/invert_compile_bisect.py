"""Bisect the invert-train remote-compile pathology (VERDICT r3 #7).

Round 2b measured `invert-train` taking >28 min to compile through the axon
tunnel (STATUS.md); the CPU path compiles the same program in seconds. This
harness times AOT lowering+compilation of each subgraph of the train step in
ISOLATION, one subprocess per case (so a pathological case can be killed by
timeout without wedging the rest):

  gen-fwd      StyleInverter forward (eval)
  gen-train    generator-only value_and_grad + adam (z given)
  vgg-style    style_vector: VGG encoder relu4_1 mean||std at the image size
  full-step    the real train_inverter step_fn (encoder + gen + adam)

Usage:
  python benchmarks/invert_compile_bisect.py --case gen-fwd --size 256
  python benchmarks/invert_compile_bisect.py            # orchestrate all

Each case prints one JSON line: {"case", "size", "compile_s", "ok"}.
The orchestrator writes benchmarks/INVERT_COMPILE.json with every row.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CASES = [
    ("gen-fwd", 64), ("gen-fwd", 256),
    ("gen-train", 64), ("gen-train", 256),
    ("vgg-style", 256),
    ("full-step", 64), ("full-step", 256),
]
BATCH = 16


def run_case(case: str, size: int) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from ccst_tpu.models import vgg
    from ccst_tpu.privacy.generator import StyleInverter
    from ccst_tpu.privacy.invert import InvertConfig, style_vector, train_inverter  # noqa: F401

    model = StyleInverter(image_size=size)
    z0 = jnp.zeros((BATCH, 1024), jnp.float32)
    imgs = jnp.zeros((BATCH, size, size, 3), jnp.float32)

    if case == "gen-fwd":
        params = model.init(jax.random.PRNGKey(0), z0[:1], train=False)["params"]
        fn = jax.jit(lambda p, z: model.apply({"params": p}, z, train=False))
        args = (params, z0)
    elif case == "gen-train":
        params = model.init(jax.random.PRNGKey(0), z0[:1], train=False)["params"]
        tx = optax.adam(2e-4)
        opt = tx.init(params)

        def step(p, o, z, y):
            def loss_fn(pp):
                r = model.apply({"params": pp}, z, train=True)
                return jnp.mean(jnp.square(r - y))

            l, g = jax.value_and_grad(loss_fn)(p)
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2, l

        fn = jax.jit(step)
        args = (params, opt, z0, imgs)
    elif case == "vgg-style":
        enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
        enc16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), enc)
        fn = jax.jit(lambda e, x: style_vector(e, x.astype(jnp.bfloat16)))
        args = (enc16, imgs)
    elif case == "full-step":
        enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
        enc16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), enc)
        params = model.init(jax.random.PRNGKey(0), z0[:1], train=False)["params"]
        tx = optax.adam(2e-4)
        opt = tx.init(params)

        def step(p, o, x):
            zz = style_vector(enc16, x.astype(jnp.bfloat16)).astype(jnp.float32)
            zz = jax.lax.stop_gradient(zz)

            def loss_fn(pp):
                r = model.apply({"params": pp}, zz, train=True)
                return jnp.mean(jnp.square(r - x))

            l, g = jax.value_and_grad(loss_fn)(p)
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2, l

        fn = jax.jit(step)
        args = (params, opt, imgs)
    else:
        raise SystemExit(f"unknown case {case}")

    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    return {
        "case": case, "size": size, "lower_s": round(t_lower, 2),
        "compile_s": round(t_compile, 2), "ok": True,
        "platform": jax.devices()[0].platform,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    if args.case:
        print(json.dumps(run_case(args.case, args.size)))
        return

    rows = []
    for case, size in CASES:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--case", case, "--size", str(size)]
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout,
                cwd=REPO,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            try:
                row = json.loads(line)
            except json.JSONDecodeError:  # killed mid-print / junk stdout
                row = {
                    "case": case, "size": size, "ok": False,
                    "rc": out.returncode, "stderr_tail": out.stderr[-500:],
                }
        except subprocess.TimeoutExpired:
            row = {"case": case, "size": size, "ok": False,
                   "timeout_s": args.timeout,
                   "wall_s": round(time.perf_counter() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "benchmarks", "INVERT_COMPILE.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
