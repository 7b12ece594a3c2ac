"""CI tier for benchmarks/host_pipeline_ab.py: the emulated-device engine's
async-dispatch contract, and the production transfer loop running against it.

The real measurement (BENCH_HOST_PIPELINE.json) runs the 576-image 512px
workload; this keeps the harness's semantics pinned at toy scale on CPU.
"""
import importlib.util
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "host_pipeline_ab", os.path.join(REPO, "benchmarks", "host_pipeline_ab.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_deferred_blocks_until_ready_and_slices_lazily():
    hp = _load()
    payload = np.arange(2 * 4 * 3 * 3 * 3, dtype=np.uint8).reshape(2, 4, 3, 3, 3)
    t0 = time.perf_counter()
    d = hp._Deferred(payload, t0 + 0.15)[:, :2]
    got = np.asarray(d)
    assert time.perf_counter() - t0 >= 0.15  # materialization waited
    np.testing.assert_array_equal(got, payload[:, :2])


def test_emulated_engine_serial_timeline():
    hp = _load()
    payload = np.zeros((2, 4, 3, 3, 3), np.uint8)
    eng = hp.EmulatedDeviceEngine(rate=100.0, payload=payload)
    imgs = np.zeros((4, 3, 3, 3), np.float32)
    t0 = time.perf_counter()
    a = eng.stylize_multi(imgs, [0, 1], [0, 1], 1.0)  # 8 outputs @100/s = 80ms
    b = eng.stylize_multi(imgs, [0, 1], [0, 1], 1.0)  # queued BEHIND a
    assert time.perf_counter() - t0 < 0.05  # dispatch is async
    np.asarray(b[:, :4])
    elapsed = time.perf_counter() - t0
    assert elapsed >= 0.16  # b waited for a's device time too (serial device)
    assert abs(eng.device_busy_s - 0.16) < 1e-6


def test_production_loop_with_emulated_device(tmp_path, monkeypatch):
    import jax

    jax.config.update("jax_platforms", "cpu")
    hp = _load()
    monkeypatch.setattr(hp, "N_CONTENT", 10)
    monkeypatch.setattr(hp, "N_PER_STYLE", 2)
    monkeypatch.setattr(hp, "SIZE", 32)
    monkeypatch.setattr(hp, "BATCH", 4)

    from ccst_tpu.config import StylizeConfig
    from ccst_tpu.pipeline import style_bank as sb
    from ccst_tpu.pipeline.stylize import run_overall_transfer

    root = str(tmp_path)
    domains = hp.build_tree(root)
    styles = [d for d in domains if d != "art_painting"]
    rng = np.random.default_rng(1)
    for s in styles:
        sb.save_style_stats(
            os.path.join(root, "style_stats", "pacs"), s,
            rng.standard_normal(512).astype(np.float32) * 0.1,
            rng.random(512).astype(np.float32) * 0.5 + 0.5,
        )
    cfg = StylizeConfig(
        dataset="pacs", target="art_painting", mode="overall",
        image_size=32, batch_size=4, data_root=root, list_root=root,
        output_root=root, style_stats_dir=os.path.join(root, "style_stats"),
    )
    payload = rng.integers(0, 255, (len(styles), 4, 32, 32, 3), dtype=np.uint8)
    eng = hp.EmulatedDeviceEngine(rate=200.0, payload=payload)
    report = run_overall_transfer(cfg, eng)

    assert report.images == 10
    # every output landed on disk under the stylized-tree contract
    for s in styles:
        for i in range(10):
            out = os.path.join(
                root,
                f"PACS/all_style_transferred_Overall/art_painting/{s}/"
                f"cls/img{i:03d}_{s}.jpg",
            )
            assert os.path.exists(out), out
    # the emulated device charged exactly the dispatched work: 3 batches
    # (4+4+2 rows, but full batches execute) x 3 styles x 4 rows / 200 per s
    assert abs(eng.device_busy_s - (3 * 3 * 4) / 200.0) < 1e-6
