"""Blank-patch filtering and decoder training."""
import os

import jax
import numpy as np
import pytest

from ccst_tpu.data.lists import filter_blank_images, parse_list, write_list
from ccst_tpu.data.loader import save_image_u8


def test_filter_blank_images(tmp_path, rng):
    root = str(tmp_path)
    names, labels = [], []
    # hospital1: 2 blanks (black, white), 1 flat gray, 3 textured
    imgs = [
        np.zeros((32, 32, 3), np.float32),                       # black
        np.ones((32, 32, 3), np.float32),                        # white
        np.full((32, 32, 3), 0.5, np.float32),                   # flat (low std)
        rng.random((32, 32, 3)).astype(np.float32),
        rng.random((32, 32, 3)).astype(np.float32) * 0.5 + 0.25,
        rng.random((32, 32, 3)).astype(np.float32) * 0.3 + 0.4,
    ]
    for i, img in enumerate(imgs):
        rel = f"camelyon17/kfold/hospital1/tumor/img{i}.png"
        save_image_u8(img, os.path.join(root, rel))
        names.append(rel)
        labels.append(i % 2)
    write_list(
        os.path.join(root, "txt_lists", "camelyon17", "hospital1_train.txt"),
        names, labels,
    )
    written = filter_blank_images(root, "camelyon17", data_root=root)
    kept, _ = parse_list(written["hospital1"])
    assert len(kept) == 3
    assert all("img" + str(i) in " ".join(kept) for i in (3, 4, 5))


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_train_decoder_smoke(tmp_path, rng):
    from ccst_tpu.pipeline.train_decoder import DecoderTrainConfig, train_decoder

    root = str(tmp_path)
    for d in ["art_painting", "cartoon", "photo", "sketch"]:
        names, labels = [], []
        for i in range(4):
            rel = f"PACS/kfold/{d}/dog/img{i}.png"
            save_image_u8(rng.random((32, 32, 3), dtype=np.float32), os.path.join(root, rel))
            names.append(rel)
            labels.append(0)
        write_list(os.path.join(root, "txt_lists", "pacs", f"{d}_train.txt"), names, labels)
    cfg = DecoderTrainConfig(
        dataset="pacs", list_root=root, data_root=root,
        image_size=32, batch_size=4, steps=4, lr=1e-4,
        out_path=os.path.join(root, "dec.npz"), log_every=2,
    )
    result = train_decoder(cfg)
    assert os.path.exists(result["out_path"])
    assert np.isfinite(result["final_loss_c"])
    assert np.isfinite(result["final_loss_s"])
    # trained decoder loads back and runs
    from ccst_tpu.models.convert import load_decoder
    from ccst_tpu.models import vgg
    import jax.numpy as jnp

    dec = load_decoder(result["out_path"])
    out = vgg.apply_decoder(dec, jnp.ones((1, 4, 4, 512)))
    assert out.shape == (1, 32, 32, 3)
