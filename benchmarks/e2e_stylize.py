"""End-to-end stylize benchmark: disk -> decode -> device -> encode -> disk.

The device-only rate (bench.py) isolates chip throughput; this measures the
WHOLE production pipeline the reference timed (its 75.9 img/s artifact
includes PIL decode and save_image, CCST_OverallStyleTransfer.py:147-175):
content JPEGs on disk, style banks computed by the style-bank stage, the
Overall transfer CLI with the int8-static executor, stylized JPEGs written
back. Writes BENCH_E2E.json at the repo root.

Environment caveat (measured, embedded in the artifact): the dev harness
reaches the TPU through a network tunnel whose device->host bandwidth is
~2-18 MB/s (vs ~10+ GB/s PCIe on a real TPU host). At 512px every stylized
u8 batch is ~38 MB, so on THIS harness the end-to-end number measures the
tunnel, not the framework; the artifact therefore reports the tunnel
bandwidth alongside so the number can be attributed. The host also has one
CPU core (decode/encode ~90-100 img/s at 512px) — on real hardware that,
not the device (956 img/s), would be the pipeline bound.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))  # sibling `synth`

N_CONTENT = 576     # 12 batches of 48: enough to amortize the
# per-invocation trace/lower cost so the warm number reflects steady state
N_PER_STYLE = 48    # style domains only feed the banks
SIZE = 512


def main() -> None:
    import jax.numpy as jnp

    from ccst_tpu.cli import main as cli_main
    from ccst_tpu.data.loader import save_image_u8
    from synth import build_pacs_tree

    root = tempfile.mkdtemp(prefix="ccst_e2e_")
    t_gen = time.perf_counter()
    # shared with host_pipeline_ab.py so the two artifacts stay comparable
    domains = build_pacs_tree(root, N_CONTENT, N_PER_STYLE, SIZE)
    t_gen = time.perf_counter() - t_gen

    # persistent compile cache: a fresh fill per run so cold genuinely
    # compiles and warm genuinely reloads (what a production multi-target
    # stylize sweep pays after its first invocation)
    os.environ["CCST_COMPILE_CACHE"] = os.path.join(root, "xla_cache")

    common = [
        "--dataset", "pacs", "--list-root", root, "--data-root", root,
        "--output-root", root,
        "--style-stats-dir", os.path.join(root, "style_stats"),
        "--image-size", str(SIZE), "--batch-size", "48",
    ]
    t0 = time.perf_counter()
    for d in domains:
        if d != "art_painting":   # only the style banks feed the transfer
            assert cli_main(
                ["style-bank", *common, "--target", "art_painting",
                 "--domain", d]
            ) == 0
    t_bank = time.perf_counter() - t0

    # production fast path: calibrate ONCE, stylize runs reload the scales
    # (cli.py auto-pickup) instead of re-calibrating per invocation
    t0 = time.perf_counter()
    assert cli_main([
        "calibrate", *common, "--target", "art_painting",
        "--engine", "int8-static",
    ]) == 0
    t_calib = time.perf_counter() - t0

    def run_stylize():
        t0 = time.perf_counter()
        assert cli_main([
            "stylize", *common, "--target", "art_painting",
            "--mode", "overall", "--engine", "int8-static",
        ]) == 0
        return time.perf_counter() - t0

    t_cold = run_stylize()   # compiles, fills the compile cache
    t_warm = run_stylize()   # steady state (scales persisted, cache hit)
    n_out = N_CONTENT * (len(domains) - 1)

    # ---- overlap audit (VERDICT r3 weak #3): decompose the warm e2e wall
    # into its two legs, measured IN ISOLATION over the same workload:
    #   host leg  = decode every content image + encode every output
    #   device leg = h2d + stylize_multi + d2h fetch (no disk)
    # The overlap metric itself comes from the production loop's stall
    # counters, NOT from leg arithmetic (see below where it is computed).
    import concurrent.futures as cf

    import jax

    from ccst_tpu.config import StylizeConfig
    from ccst_tpu.data.loader import ImageBatchLoader
    from ccst_tpu.models import vgg
    from ccst_tpu.pipeline.stylize import StylizeEngine, bank_path_for
    from ccst_tpu.pipeline.style_bank import load_style_stats

    cfg = StylizeConfig(
        dataset="pacs", target="art_painting", image_size=SIZE,
        batch_size=48, data_root=root, list_root=root, output_root=root,
        style_stats_dir=os.path.join(root, "style_stats"),
        engine="int8-static",
    )
    names = [
        f"PACS/kfold/art_painting/cls/img{i:03d}.jpg" for i in range(N_CONTENT)
    ]
    paths = [os.path.join(root, n) for n in names]

    # host leg: decode all + encode all (same thread pools + u8 transport
    # as production)
    loader = ImageBatchLoader(
        paths, batch_size=48, image_size=SIZE, out_dtype="uint8"
    )
    t0 = time.perf_counter()
    host_batches = [b.images for b in loader]
    t_decode = time.perf_counter() - t0
    enc_dir = os.path.join(root, "enc_probe")
    # engine outputs are u8 (output_u8), so the encode probe writes the u8
    # batches directly — save_image_u8 passes uint8 arrays through untouched
    outs_u8 = host_batches
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(8) as pool:
        futs = []
        for bi, b in enumerate(outs_u8):
            for si in range(len(domains) - 1):
                for j, img in enumerate(b):
                    futs.append(pool.submit(
                        save_image_u8, img,
                        os.path.join(enc_dir, f"{bi}_{si}_{j}.jpg"),
                    ))
        for f in futs:
            f.result()
    t_encode = time.perf_counter() - t0
    t_host = t_decode + t_encode

    # device leg: same batches, no disk — h2d, multi-style step, d2h
    styles = [d for d in domains if d != "art_painting"]
    bank = [load_style_stats(bank_path_for(cfg, s)) for s in styles]
    s_means = np.stack([m for m, _ in bank])
    s_stds = np.stack([s for _, s in bank])
    encp = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    decp = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    # same persisted scales the CLI runs used (calibrate above); output_u8
    # matches the production CLI (cli.py:212)
    from ccst_tpu.models.vgg_fast import load_scales
    from ccst_tpu.pipeline.stylize import scales_path_for

    scales = load_scales(scales_path_for(cfg))
    eng = StylizeEngine(
        encp, decp, engine="int8-static", output_u8=True, scales=scales
    )
    # warm/compile outside the timed region
    _ = np.asarray(eng.stylize_multi(jnp.asarray(host_batches[0]), s_means, s_stds, 1.0))
    t0 = time.perf_counter()
    for b in host_batches:
        _ = np.asarray(eng.stylize_multi(jnp.asarray(b), s_means, s_stds, 1.0))
    t_device = time.perf_counter() - t0

    # Direct overlap evidence from the production loop's stall counters
    # (TransferReport/_write_timing): decode can only stall the main loop in
    # loader_wait, encode in encode_backpressure (queue full mid-run) or
    # encode_drain (work left after the last fetch). overlap_efficiency =
    # fraction of the isolated host leg that never surfaced as a main-loop
    # stall; the unhideable first-batch decode is reported separately.
    timing_path = os.path.join(
        root, "pacs_art_painting_overall_stylize_time.json"
    )
    with open(timing_path) as f:
        timing = json.load(f)
    loader_wait = timing.get("loader_wait_seconds", 0.0)
    fetch_wait = timing.get("fetch_wait_seconds", 0.0)
    host_visible = (
        loader_wait
        + timing.get("encode_backpressure_seconds", 0.0)
        + timing.get("encode_drain_seconds", 0.0)
    )
    overlap = max(0.0, min(1.0, 1.0 - host_visible / max(t_host, 1e-9)))

    # measure the tunnel's device<->host bandwidth so the e2e number can be
    # attributed (on this harness it IS the bottleneck)
    probe = np.zeros((38, 1000, 1000), np.uint8)  # 38 MB, one output batch
    d = jax.device_put(probe)
    d.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(jax.device_get(d))
    down_mbs = probe.nbytes / 1e6 / (time.perf_counter() - t0)

    artifact = {
        "metric": "e2e_stylize_img_per_sec_512px",
        "value": round(n_out / t_warm, 2),
        "unit": "img/s",
        "pipeline": "disk jpg -> decode -> int8-static stylize -> encode -> disk jpg",
        "images_out": n_out,
        "seconds_warm": round(t_warm, 2),
        "seconds_cold_incl_compile": round(t_cold, 2),
        "style_bank_seconds": round(t_bank, 2),
        "calibrate_once_seconds": round(t_calib, 2),
        "harness_device_to_host_MBps": round(down_mbs, 1),
        # overlap audit. overlap_efficiency = 1 - (visible host stalls in
        # the production loop: loader_wait + encode backpressure + encode
        # drain) / (isolated host leg). 1.0 = decode+encode fully hidden
        # behind device work; the unhideable first-batch priming decode is
        # excluded and reported via the timing JSON.
        "host_leg_seconds": round(t_host, 2),
        "host_leg_decode_seconds": round(t_decode, 2),
        "host_leg_encode_seconds": round(t_encode, 2),
        "device_leg_seconds_incl_tunnel_xfer": round(t_device, 2),
        "warm_loop_loader_wait_seconds": round(loader_wait, 2),
        "warm_loop_fetch_wait_seconds": round(fetch_wait, 2),
        "warm_loop_host_visible_seconds": round(host_visible, 2),
        "overlap_efficiency": round(overlap, 2),
        "harness_note": (
            "this dev harness reaches the TPU over a network tunnel; at "
            f"{down_mbs:.0f} MB/s device->host, moving each ~38 MB stylized "
            "u8 batch dominates wall-clock. On a real TPU host (PCIe) the "
            "bound is the 1-core JPEG codec (~90-100 img/s) and then the "
            "device rate (bench.py)."
        ),
        "device_only_img_per_sec": "see BENCH JSON (bench.py)",
        "vs_baseline_75.9": round(n_out / t_warm / 75.9, 2),
    }
    with open(os.path.join(REPO, "BENCH_E2E.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
