"""Privacy subsystem: generator shapes, PSNR metric, inversion train/eval."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.data.lists import write_list
from ccst_tpu.data.loader import save_image_u8
from ccst_tpu.privacy.generator import StyleInverter
from ccst_tpu.privacy.invert import (
    InvertConfig,
    evaluate_inverter,
    perceptual_distance,
    psnr,
    style_vector,
    train_inverter,
)


def test_generator_shapes():
    model = StyleInverter(image_size=32, fmap_max=32)
    z = jnp.zeros((2, 1024))
    params = model.init(jax.random.PRNGKey(0), z, train=False)["params"]
    out = model.apply({"params": params}, z, train=False)
    assert out.shape == (2, 32, 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_generator_rejects_non_pow2():
    model = StyleInverter(image_size=48)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024)), train=False)


def test_psnr():
    a = jnp.zeros((1, 8, 8, 3))
    np.testing.assert_allclose(float(psnr(a, a + 0.1)[0]), 20.0, atol=0.01)
    assert float(psnr(a, a)[0]) > 100  # identical -> huge
    # known value: mse=0.25 -> 10*log10(1/0.25) ~ 6.02
    np.testing.assert_allclose(float(psnr(a, a + 0.5)[0]), 6.0206, atol=0.01)


def test_style_vector_shape(rng):
    from ccst_tpu.models import vgg

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    z = style_vector(enc, imgs)
    assert z.shape == (2, 1024)
    # first half mean, second half std (std > 0)
    assert np.all(np.asarray(z[:, 512:]) > 0)


def test_perceptual_distance_zero_for_identical(rng):
    from ccst_tpu.models import vgg

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    a = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    b = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    d_same = float(perceptual_distance(enc, a, a)[0])
    d_diff = float(perceptual_distance(enc, a, b)[0])
    assert d_same < 1e-6
    assert d_diff > d_same


@pytest.fixture
def invert_dataset(tmp_path, rng):
    root = str(tmp_path)
    for d in ["art_painting", "cartoon"]:
        names, labels = [], []
        for i in range(12):
            rel = f"PACS/kfold/{d}/dog/img{i}.png"
            save_image_u8(
                rng.random((32, 32, 3), dtype=np.float32),
                os.path.join(root, rel),
            )
            names.append(rel)
            labels.append(0)
        write_list(os.path.join(root, "txt_lists", "pacs", f"{d}_train.txt"), names, labels)
    return root


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_invert_train_and_eval(invert_dataset):
    cfg = InvertConfig(
        dataset="pacs",
        source="art_painting",
        list_root=invert_dataset,
        data_root=invert_dataset,
        image_size=32,
        batch_size=4,
        steps=30,
        lr=1e-3,
        out_dir=os.path.join(invert_dataset, "inverter"),
    )
    best = train_inverter(cfg)
    assert os.path.exists(best["checkpoint"])
    assert best["psnr"] > 0

    report = evaluate_inverter(cfg, target="cartoon")
    assert report["images"] == 12
    assert np.isfinite(report["psnr_mean"])
    assert os.path.isdir(report["recon_dir"])
    assert os.path.exists(os.path.join(report["recon_dir"], "recon_0.png"))
    assert os.path.exists(os.path.join(report["recon_dir"], "psnr_perceptual.npy"))


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_invert_train_perceptual_loss(invert_dataset):
    """LPIPS-criterion training variant (imagenet_reconstruct_lpips.py):
    same template, loss = MSE + w * perceptual distance."""
    cfg = InvertConfig(
        dataset="pacs",
        source="art_painting",
        list_root=invert_dataset,
        data_root=invert_dataset,
        image_size=32,
        batch_size=4,
        steps=12,
        lr=1e-3,
        out_dir=os.path.join(invert_dataset, "inv_perc"),
        loss="mse+perceptual",
        perc_weight=0.05,
    )
    best = train_inverter(cfg)
    assert os.path.exists(best["checkpoint"])
    assert np.isfinite(best["final_loss"])
