"""Determinism, idempotent stylize reruns, metric export, DP inverter."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.utils.excel_log import export_rounds_csv


def test_stylize_deterministic(rng):
    """Bitwise-reproducible stylization under fixed inputs (SURVEY §5.2:
    the rebuild adds determinism checks in place of race detection)."""
    from ccst_tpu.models import vgg
    from ccst_tpu.pipeline.stylize import StylizeEngine

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    x = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    s_mean = np.zeros(512, np.float32)
    s_std = np.ones(512, np.float32)
    a = np.asarray(engine.stylize(x, s_mean, s_std, 1.0))
    b = np.asarray(engine.stylize(x, s_mean, s_std, 1.0))
    np.testing.assert_array_equal(a, b)


def test_single_transfer_seeded_determinism(tmp_path, rng):
    """Single-mode style sampling is seeded (reference seed=1,
    CCST_SingleStyleTransfer.py:22-26): same seed, same style picks."""
    import random

    r1 = random.Random(7)
    r2 = random.Random(7)
    pool = [f"s{i}" for i in range(50)]
    assert [r1.choice(pool) for _ in range(10)] == [r2.choice(pool) for _ in range(10)]


def test_skip_existing_stylize(tmp_path, rng):
    from ccst_tpu.config import StylizeConfig
    from ccst_tpu.data.lists import write_list
    from ccst_tpu.data.loader import save_image_u8
    from ccst_tpu.models import vgg
    from ccst_tpu.pipeline.style_bank import compute_style_bank
    from ccst_tpu.pipeline.stylize import StylizeEngine, run_overall_transfer

    root = str(tmp_path)
    for d in ["art_painting", "cartoon", "photo", "sketch"]:
        names, labels = [], []
        for i in range(3):
            rel = f"PACS/kfold/{d}/dog/img{i}.png"
            save_image_u8(rng.random((32, 32, 3), dtype=np.float32), os.path.join(root, rel))
            names.append(rel)
            labels.append(0)
        write_list(os.path.join(root, "txt_lists", "pacs", f"{d}_train.txt"), names, labels)

    cfg = StylizeConfig(
        dataset="pacs", target="photo", image_size=32, batch_size=4,
        data_root=root, list_root=root, output_root=root,
        style_stats_dir=os.path.join(root, "style_stats"), dtype="float32",
        skip_existing=True,
    )
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    for d in ["art_painting", "cartoon", "sketch"]:
        compute_style_bank(cfg, d, encoder_params=enc)
    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    r1 = run_overall_transfer(cfg, engine)
    assert r1.images == 3
    # delete ONE output; rerun should redo only that image
    victim = os.path.join(
        root, "PACS/all_style_transferred_Overall/photo/cartoon/dog/img1_cartoon.png"
    )
    os.remove(victim)
    r2 = run_overall_transfer(cfg, engine)
    assert os.path.exists(victim)
    # only 1 image (for 1 style) was reprocessed
    assert r2.images * max(len(r2.styles), 1) <= 3  # far fewer than 9


def test_export_rounds_csv(tmp_path):
    import json

    log = tmp_path / "run.jsonl"
    with open(log, "w") as f:
        for r in range(3):
            f.write(json.dumps({"event": "round", "round": r, "test_acc": 0.5 + r / 10}) + "\n")
        f.write(json.dumps({"event": "best", "round": 2}) + "\n")
    out = export_rounds_csv(str(log))
    with open(out) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 4  # header + 3 rounds
    assert "test_acc" in lines[0]


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_inverter_dp_mesh(tmp_path, rng):
    """train_inverter with a data mesh: pjit-sharded batches, same API."""
    from jax.sharding import Mesh
    from ccst_tpu.data.lists import write_list
    from ccst_tpu.data.loader import save_image_u8
    from ccst_tpu.privacy.invert import InvertConfig, train_inverter

    root = str(tmp_path)
    names, labels = [], []
    for i in range(8):
        rel = f"PACS/kfold/cartoon/dog/img{i}.png"
        save_image_u8(rng.random((32, 32, 3), dtype=np.float32), os.path.join(root, rel))
        names.append(rel)
        labels.append(0)
    write_list(os.path.join(root, "txt_lists", "pacs", "cartoon_train.txt"), names, labels)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    cfg = InvertConfig(
        dataset="pacs", source="cartoon", list_root=root, data_root=root,
        image_size=32, batch_size=4, steps=6, lr=1e-3,
        out_dir=os.path.join(root, "inv"),
    )
    best = train_inverter(cfg, mesh=mesh)
    assert np.isfinite(best["final_loss"])


def test_jigsaw_table_matches_reference_asset():
    """permutation_set(30) must be the reference's permutations_30.npy
    (data/ImageLoader.py:102-106), 0-based."""
    import numpy as np
    from ccst_tpu.data.jigsaw import permutation_set

    table = permutation_set(30)
    assert table.shape == (30, 9) and table.min() == 0 and table.max() == 8
    # spot anchor: first three rows of the published table
    np.testing.assert_array_equal(
        table[:3],
        [[7, 2, 0, 1, 5, 6, 3, 4, 8],
         [0, 1, 2, 3, 4, 5, 6, 8, 7],
         [1, 0, 3, 2, 6, 4, 8, 7, 5]],
    )
    # each row is a permutation of 0..8
    for row in table:
        assert sorted(row.tolist()) == list(range(9))


def test_jigsaw_onehot_bit_identical_at_default_precision(rng):
    """The gather-free one-hot formulation must equal the take_along_axis
    gather BIT-FOR-BIT under DEFAULT matmul precision — conftest forces
    'highest' globally, which would mask a missing precision= override (on
    TPU the default feeds the MXU bf16 operands, rounding every pixel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ccst_tpu.data.jigsaw import GRID, N_TILES, permutation_set, tile_and_permute

    images = jnp.asarray(rng.random((4, 9, 9, 2), dtype=np.float32))
    perms = jnp.asarray(permutation_set(30))
    orders = jnp.asarray([0, 3, 17, 30])

    n, h, w, c = images.shape
    th, tw = h // GRID, w // GRID
    tiles = (
        images.reshape(n, GRID, th, GRID, tw, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, N_TILES, th, tw, c)
    )
    table = jnp.concatenate([jnp.arange(N_TILES)[None, :], perms], axis=0)
    sel = table[orders]  # the obvious gather formulation
    want = jnp.take_along_axis(tiles, sel[:, :, None, None, None], axis=1)
    want = (
        want.reshape(n, GRID, GRID, th, tw, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h, w, c)
    )
    with jax.default_matmul_precision("default"):
        got = tile_and_permute(images, orders, perms)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_segment_path_rewrite_ignores_substring_collisions():
    """A data root containing the domain name as a substring must not be
    rewritten (round-1 blind str.replace bug)."""
    from ccst_tpu.data.lists import stylized_output_path

    p = "/data/photo_sets/pacs/kfold/photo/dog/pic_001.jpg"
    out = stylized_output_path(p, target="photo", style="art_painting",
                               mode="overall")
    assert out == ("/data/photo_sets/pacs/all_style_transferred_Overall/"
                   "photo/art_painting/dog/pic_001_art_painting.jpg")


def test_metrics_image_and_histogram_summaries(tmp_path):
    """TFLogger image/histogram parity (reference utils/tf_logger.py:30-81)
    as JSONL records (TensorBoard forwarding when available)."""
    import json as _json
    import numpy as np
    from ccst_tpu.utils.metrics import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path, echo=False)
    lg.log_image("recon", np.zeros((8, 8, 3), np.float32) + 0.5, step=3)
    lg.log_histogram("weights", np.arange(100, dtype=np.float32), step=3)
    lg.close()
    recs = [_json.loads(l) for l in open(path)]
    img = next(r for r in recs if r["event"] == "image")
    assert img["shape"] == [8, 8, 3] and img["step"] == 3
    h = next(r for r in recs if r["event"] == "histogram")
    assert sum(h["counts"]) == 100 and h["max"] == 99.0


def test_checkpoint_orbax_backend(tmp_path):
    """Orbax checkpoint round-trip (optional backend; msgpack is default)."""
    import numpy as np
    import pytest as _pytest
    from ccst_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    _pytest.importorskip("orbax.checkpoint")
    payload = {"params": {"w": np.arange(6.0).reshape(2, 3)}, "a_iter": np.int32(7)}
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint(path, payload, backend="orbax")
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back["params"]["w"], payload["params"]["w"])
    assert int(back["a_iter"]) == 7


def test_plot_runs(tmp_path):
    """plotter.ipynb equivalent: curves PNG from the metrics JSONL."""
    from ccst_tpu.utils.metrics import MetricsLogger
    from ccst_tpu.utils.plotting import plot_runs

    paths = []
    for run in range(2):
        p = str(tmp_path / f"run{run}.jsonl")
        log = MetricsLogger(p, echo=False)
        for r in range(4):
            log.log("round", round=r, val_acc_mean=0.5 + 0.1 * r + 0.02 * run,
                    test_acc=0.4 + 0.1 * r, train_loss=1.0 - 0.2 * r)
        log.close()
        paths.append(p)
    out = plot_runs(paths, str(tmp_path / "curves.png"))
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000

    from ccst_tpu.cli import main as cli_main

    assert cli_main(["plot", *paths, "-o", str(tmp_path / "cli.png")]) == 0
    assert os.path.exists(tmp_path / "cli.png")


def test_profiling_helpers(tmp_path):
    """utils/profiling: StageTimer's reference-style record and maybe_trace's
    trace-capture/no-op contract (SURVEY §5.1)."""
    import jax.numpy as jnp

    from ccst_tpu.utils.profiling import StageTimer, maybe_trace

    t = StageTimer()
    t.add(4)
    t.add(2)
    rec = t.report(stage="stylize")
    assert rec["images"] == 6 and rec["stage"] == "stylize"
    assert rec["images_per_sec"] > 0 and rec["seconds"] >= 0

    with maybe_trace(None):  # no-op path
        pass
    trace_dir = str(tmp_path / "trace")
    with maybe_trace(trace_dir):
        jnp.square(jnp.arange(8.0)).block_until_ready()
    captured = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(trace_dir)
        for f in fs
    ]
    assert captured, "jax.profiler trace produced no files"


def test_mesh_config_axis_sizes():
    from ccst_tpu.config import MeshConfig

    assert MeshConfig(client=2, data=-1).axis_sizes(8) == {
        "client": 2, "data": 4, "model": 1
    }
    assert MeshConfig(client=1, data=1, model=8).axis_sizes(8)["model"] == 8
    with pytest.raises(ValueError, match="not divisible"):
        MeshConfig(client=3, data=-1).axis_sizes(8)
    with pytest.raises(ValueError, match="one mesh axis"):
        MeshConfig(client=-1, data=-1).axis_sizes(8)


def test_amplitude_spectrum_matches_numpy(rng):
    from ccst_tpu.ops.fft_aug import amplitude_spectrum

    img = rng.random((16, 16, 3)).astype(np.float32)
    got = np.asarray(amplitude_spectrum(jnp.asarray(img)))
    want = np.abs(np.fft.fft2(img.transpose(2, 0, 1), axes=(-2, -1)))
    assert got.shape == (3, 16, 16)  # CHW, the reference bank layout
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_export_rounds_xlsx_falls_back_to_csv(tmp_path):
    """openpyxl is absent in this env: the xlsx exporter must degrade to the
    CSV path rather than crash (utils/excel_log.py:37-43)."""
    import json as _json

    from ccst_tpu.utils.excel_log import export_rounds_xlsx

    p = str(tmp_path / "run.jsonl")
    with open(p, "w") as f:
        for i in range(3):
            f.write(_json.dumps(
                {"event": "round", "round": i, "val_acc_mean": 0.5 + i / 10}
            ) + "\n")
    out = export_rounds_xlsx(p)
    assert os.path.exists(out)
    body = open(out).read()
    assert "val_acc_mean" in body and "0.7" in body


def test_count_params():
    from ccst_tpu.models import vgg

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    n = vgg.count_params(enc)
    # VGG-19 [:relu4_1] + the 1x1 RGB layer: a fixed, known parameter count
    assert n == sum(
        int(np.prod(np.asarray(p).shape))
        for layer in enc.values() for p in layer.values()
    )
    assert n > 3_000_000
