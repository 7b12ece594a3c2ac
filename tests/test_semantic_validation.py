"""CI-sized smoke of the end-to-end semantic-validation experiment
(experiments/semantic_validation.py; VERDICT r2 directive #4).

Drives the full production chain — decoder training, style banks, int8
calibration, stylization, tree reorganization, K-list generation, federated
training — on the shapes4 synthetic benchmark at miniature scale, for the
no_fusion and bf16-stylized arms. The committed EXPERIMENT_SEMANTIC.json is
produced by the full offline run (3 seeds, 10 rounds); this test pins the
chain itself.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-scale; dev fast tier: -m 'not slow'

from experiments import semantic_validation as sv


def test_quick_chain(tmp_path):
    from ccst_tpu.data.loader import load_image

    size = 32
    sv._register(size)

    root = str(tmp_path / "arm")
    sv.make_shapes_dataset(root, size, n_per_class=6, seed=1)
    # list layout: 4 domains x (train + test)
    for d in sv.DOMAINS:
        assert os.path.exists(
            os.path.join(root, "txt_lists", "shapes4", f"{d}_train.txt")
        )

    probes = np.stack([
        load_image(os.path.join(root, f"SHAPES4/kfold/{d}/disk/img000.png"), size)
        for d in sv.DOMAINS[:-1]
    ])
    enc = sv.make_experiment_encoder(probes)
    dec = sv._train_stylizer(root, size, steps=5, enc=enc)
    sv.run_chain(root, size, "ref", seed=1, enc=enc, dec=dec)
    # stylized tree + fusion lists exist for the held-out target
    target = sv.DOMAINS[-1]
    fusion_list = os.path.join(
        root, "txt_lists", "shapes4_adain-overall-K3", target,
        f"{sv.DOMAINS[0]}_train.txt",
    )
    assert os.path.exists(fusion_list), fusion_list

    base = sv.run_fed(root, size, "no_fusion", seed=1, rounds=1)
    fused = sv.run_fed(root, size, "adain-overall-K3", seed=1, rounds=1)

    # single-mode chain (concrete per-batch style images, no domain banks)
    sroot = str(tmp_path / "single")
    sv.make_shapes_dataset(sroot, size, n_per_class=6, seed=1)
    sv.run_chain(sroot, size, "ref", seed=1, enc=enc, dec=dec, mode="single")
    single_list = os.path.join(
        sroot, "txt_lists", "shapes4_adain-single-K3", target,
        f"{sv.DOMAINS[0]}_train.txt",
    )
    assert os.path.exists(single_list), single_list
    single = sv.run_fed(sroot, size, "adain-single-K3", seed=1, rounds=1)

    for r in (base, fused, single):
        assert 0.0 <= r["test_acc"] <= 1.0
        assert r["round"] >= 0
