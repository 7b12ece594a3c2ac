"""Bounded TPU-tunnel liveness probe (and recovery loop).

The dev tunnel's TPU is an exclusive per-process pool grant with no
client-side release: killing a client mid-claim can wedge the grant
server-side for hours (benchmarks/README.md). The safe recovery pattern
is a *bounded* probe — one small process that either completes a real
device computation or self-terminates on a watchdog — repeated on a slow
cadence, never two at once, instead of blind restarts of real workloads.

Single probe:    python benchmarks/tunnel_probe.py
Recovery loop:   python benchmarks/tunnel_probe.py --loop --interval 600 \
                     [--then CMD ...]    # run CMD once the tunnel grants

Exit codes: 0 = device computed (tunnel healthy; --then command's rc if
given), 3 = watchdog fired (backend init exceeded --watchdog seconds),
1 = probe subprocess failed some other way.

The probe body runs in a *subprocess* so the parent (loop) never
initializes the axon backend itself and the watchdog's ``os._exit`` kills
only the waiting client, not the loop.
"""
import argparse
import json
import subprocess
import sys
import time

_PROBE_BODY = """
import json, os, sys, threading, time
timeout = float(sys.argv[1])
platform = sys.argv[2]
def _watchdog():
    time.sleep(timeout)
    print(json.dumps({"probe": "timeout", "watchdog_s": timeout}), flush=True)
    os._exit(3)
threading.Thread(target=_watchdog, daemon=True).start()
t0 = time.perf_counter()
import jax, jax.numpy as jnp
if platform:  # JAX_PLATFORMS is overridden by the image's sitecustomize
    jax.config.update("jax_platforms", platform)
devs = jax.devices()  # blocks until the pool grant arrives (or watchdog)
x = jnp.ones((256, 256))
y = (x @ x).block_until_ready()
print(json.dumps({
    "probe": "ok",
    "platform": devs[0].platform,
    "device": str(devs[0]),
    "init_s": round(time.perf_counter() - t0, 1),
    "check": float(y[0, 0]),
}), flush=True)
"""


def probe_once(watchdog_s: float, platform: str = "") -> int:
    """One bounded probe in a subprocess; returns its exit code."""
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE_BODY, str(watchdog_s), platform],
        # belt and braces on top of the in-process watchdog
        timeout=watchdog_s + 120,
    )
    return proc.returncode


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--watchdog", type=float, default=540.0,
                    help="seconds before the probe self-terminates (rc 3)")
    ap.add_argument("--loop", action="store_true",
                    help="repeat until the tunnel grants (or --attempts)")
    ap.add_argument("--interval", type=float, default=600.0,
                    help="seconds between probe attempts in --loop mode")
    ap.add_argument("--attempts", type=int, default=40,
                    help="max probe attempts in --loop mode")
    ap.add_argument("--platform", default="",
                    help="force a jax platform inside the probe (e.g. cpu "
                         "for self-tests; default: the backend the image "
                         "registers, i.e. the axon TPU)")
    ap.add_argument("--then", nargs=argparse.REMAINDER, default=None,
                    help="command to exec once the tunnel is healthy")
    args = ap.parse_args(argv)

    attempts = args.attempts if args.loop else 1
    for i in range(1, attempts + 1):
        print(json.dumps({"attempt": i, "t": time.strftime("%H:%M:%S")}),
              flush=True)
        rc = probe_once(args.watchdog, args.platform)
        if rc == 0:
            if args.then:
                return subprocess.run(args.then).returncode
            return 0
        if args.loop and i < attempts:
            time.sleep(args.interval)
    return rc


if __name__ == "__main__":
    sys.exit(main())
