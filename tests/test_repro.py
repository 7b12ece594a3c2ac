"""The one-command paper-repro driver end-to-end on a synthetic tree
(VERDICT r4 #1): banks -> stylize (overall AND single) -> reorganize ->
gen-lists -> fed-train per arm x seed -> the paper-layout results table.
On a real machine only the dataset images + the two AdaIN .pth files are
missing (docs/REPRODUCE.md); everything this test exercises is the same
code path `ccst-tpu repro` runs there."""
import json
import os

import numpy as np
import pytest

from ccst_tpu.data.lists import parse_list, write_list
from ccst_tpu.data.loader import save_image_u8

DOMAINS = ["art_painting", "cartoon", "photo", "sketch"]

pytestmark = pytest.mark.slow  # several fed-train runs; dev tier skips


def _make_tree(root, rng):
    for d in DOMAINS:
        names, labels = [], []
        for ci, cls in enumerate(["dog", "horse"]):
            for i in range(3):
                rel = f"PACS/kfold/{d}/{cls}/img{i}.png"
                base = 0.3 if ci == 0 else 0.7
                save_image_u8(
                    np.clip(rng.normal(base, 0.1, (36, 36, 3)), 0, 1).astype(
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
            names[:2], labels[:2],
        )


def test_repro_driver_end_to_end(tmp_path, monkeypatch, rng, capsys):
    import ccst_tpu.config as cc
    from ccst_tpu.pipeline.repro import ReproConfig, run_repro

    monkeypatch.setitem(
        cc.DATASETS, "pacs", cc.DatasetSpec(
            name="pacs", domains=tuple(DOMAINS), num_classes=2,
            image_size=36, stylize_size=36,
        )
    )
    root = str(tmp_path)
    _make_tree(root, rng)
    out_dir = os.path.join(root, "repro_out")
    cfg = ReproConfig(
        dataset="pacs", data_root=root, out_dir=out_dir,
        targets="photo", modes="overall,single", k=2, seeds="1",
        network="resnet4", rounds=2, lr=0.05, batch_size=4, image_size=36,
        stylize_size=36, stylize_batch=4, dtype="float32",
    )
    result = run_repro(cfg)

    # every arm x the one target x the one seed ran to completion
    assert result["arms"] == ["no_fusion", "adain-overall-K2", "adain-single-K2"]
    for arm in result["arms"]:
        cell = result["table"][arm]["photo"]
        assert len(cell["accs"]) == 1 and np.isfinite(cell["accs"][0])
        assert 0.0 <= cell["mean"] <= 1.0
        # per-run artifacts exist (checkpoint + log per seed)
        run_dir = os.path.join(out_dir, arm, "photo", "seed1")
        assert os.path.isdir(os.path.join(run_dir, "ckpt"))
        logs = os.listdir(os.path.join(run_dir, "logs"))
        assert any(f.endswith(".jsonl") for f in logs)

    # the stylize stages really produced the fusion lists the adain arms
    # trained from, and every list entry exists on disk
    for mode in ("overall", "single"):
        klist = os.path.join(
            root, "txt_lists", f"pacs_adain-{mode}-K2", "photo",
            "cartoon_train.txt",
        )
        names, _ = parse_list(klist)
        assert names, klist
        missing = [n for n in names if not os.path.exists(os.path.join(root, n))]
        assert not missing

    # machine-readable table + the rendered paper-layout table
    saved = json.load(open(os.path.join(out_dir, "repro_results.json")))
    assert saved["table"]["no_fusion"]["photo"]["accs"] == \
        result["table"]["no_fusion"]["photo"]["accs"]
    assert "no_fusion" in result["rendered"]
    assert "±" in result["rendered"]
