"""End-to-end pipeline tests on a synthetic PACS-like dataset, plus the
BASELINE parity check: full stylize path vs torch < 1e-3 mean-abs pixel error.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ccst_tpu.config import StylizeConfig
from ccst_tpu.data.lists import parse_list, write_list
from ccst_tpu.data.loader import ImageBatchLoader, load_image, save_image_u8
from ccst_tpu.models import vgg
from ccst_tpu.models.convert import from_torch_sequential
from ccst_tpu.pipeline.style_bank import (
    compute_style_bank,
    load_style_stats,
    save_style_stats,
)
from ccst_tpu.pipeline.stylize import (
    StylizeEngine,
    run_overall_transfer,
    run_single_transfer,
)
from tests.torch_ref import build_torch_stack, sequential_state_dict, torch_adain_from_stats

DOMAINS = ["art_painting", "cartoon", "photo", "sketch"]


@pytest.fixture
def synth_dataset(tmp_path, rng):
    """Tiny PACS-like tree: root/PACS/kfold/{domain}/{cls}/img{i}.png, 32px."""
    root = str(tmp_path)
    for d in DOMAINS:
        names, labels = [], []
        for cls_i, cls in enumerate(["dog", "horse"]):
            for i in range(3):
                rel = f"PACS/kfold/{d}/{cls}/img{i}.png"
                img = rng.random((32, 32, 3), dtype=np.float32)
                save_image_u8(img, os.path.join(root, rel))
                names.append(rel)
                labels.append(cls_i)
        write_list(
            os.path.join(root, "txt_lists", "pacs", f"{d}_train.txt"), names, labels
        )
    return root


def small_cfg(root, **kw):
    defaults = dict(
        dataset="pacs",
        target="photo",
        image_size=32,
        batch_size=4,
        data_root=root,
        list_root=root,
        style_stats_dir=os.path.join(root, "style_stats"),
        output_root=root,
        dtype="float32",
    )
    defaults.update(kw)
    return StylizeConfig(**defaults)


def test_loader_shapes_and_padding(synth_dataset):
    names, labels = parse_list(
        os.path.join(synth_dataset, "txt_lists", "pacs", "photo_train.txt")
    )
    paths = [os.path.join(synth_dataset, n) for n in names]
    loader = ImageBatchLoader(paths, labels, batch_size=4, image_size=32)
    batches = list(loader)
    assert len(batches) == 2  # 6 imgs -> 4 + 2(padded)
    assert batches[0].images.shape == (4, 32, 32, 3)
    assert batches[0].valid == 4
    assert batches[1].valid == 2
    assert batches[1].images.shape == (4, 32, 32, 3)
    # padding rows CYCLE the real rows (images and labels): batch-statistic
    # layers must see only real-image statistics, never zero images
    np.testing.assert_array_equal(batches[1].images[2], batches[1].images[0])
    np.testing.assert_array_equal(batches[1].images[3], batches[1].images[1])
    np.testing.assert_array_equal(
        batches[1].labels[2:], batches[1].labels[:2]
    )
    assert batches[0].images.max() <= 1.0


def test_loader_reiterable_and_shuffle(synth_dataset):
    names, labels = parse_list(
        os.path.join(synth_dataset, "txt_lists", "pacs", "photo_train.txt")
    )
    paths = [os.path.join(synth_dataset, n) for n in names]
    loader = ImageBatchLoader(paths, labels, batch_size=3, image_size=32, shuffle=True, seed=5)
    order1 = [p for b in loader for p in b.paths]
    order2 = [p for b in loader for p in b.paths]
    assert sorted(order1) == sorted(paths)
    assert order1 != order2  # reshuffled per epoch


def test_style_bank_end_to_end(synth_dataset):
    cfg = small_cfg(synth_dataset)
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    mean, std = compute_style_bank(cfg, "cartoon", encoder_params=enc)
    assert mean.shape == (512,) and std.shape == (512,)
    assert np.all(std > 0)
    # reference-layout npy readable and matches
    npy = os.path.join(cfg.style_stats_dir, "pacs", "cartoon_mean_std.npy")
    m2, s2 = load_style_stats(npy)
    np.testing.assert_allclose(m2, mean, rtol=1e-6)
    np.testing.assert_allclose(s2, std, rtol=1e-6)
    assert os.path.exists(
        os.path.join(cfg.style_stats_dir, "pacs", "cartoon_style_comp_time.json")
    )


def test_style_bank_ignores_padding(synth_dataset, rng):
    """Bank over 6 images (batch 4 => padded final batch) must equal bank
    over the same images in one exact batch."""
    from ccst_tpu.pipeline.style_bank import make_bank_step
    from ccst_tpu.ops.welford import welford_finalize, welford_init

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    imgs = rng.random((6, 32, 32, 3), dtype=np.float32)
    step = make_bank_step(enc, dtype=jnp.float32)

    s = welford_init(512)
    s = step(s, jnp.asarray(imgs[:4]), jnp.asarray(4))
    padded = np.concatenate([imgs[4:], np.zeros((2, 32, 32, 3), np.float32)])
    s = step(s, jnp.asarray(padded), jnp.asarray(2))
    mean_a, std_a = welford_finalize(s)

    s2 = welford_init(512)
    s2 = step(s2, jnp.asarray(imgs), jnp.asarray(6))
    mean_b, std_b = welford_finalize(s2)
    np.testing.assert_allclose(np.asarray(mean_a), np.asarray(mean_b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std_a), np.asarray(std_b), rtol=1e-4, atol=1e-6)


def test_overall_transfer_end_to_end(synth_dataset):
    cfg = small_cfg(synth_dataset)
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    for d in DOMAINS:
        if d != cfg.target:
            compute_style_bank(cfg, d, encoder_params=enc)
    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    report = run_overall_transfer(cfg, engine)
    assert report.images == 6
    assert sorted(report.styles) == sorted(d for d in DOMAINS if d != "photo")
    # outputs exist at the contract paths
    out = os.path.join(
        synth_dataset,
        "PACS/all_style_transferred_Overall/photo/cartoon/dog/img0_cartoon.png",
    )
    assert os.path.exists(out), out
    img = load_image(out)
    assert img.shape == (32, 32, 3)
    # timing artifact
    assert os.path.exists(
        os.path.join(synth_dataset, "pacs_photo_overall_stylize_time.json")
    )


def test_single_transfer_end_to_end(synth_dataset):
    cfg = small_cfg(synth_dataset)
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    report = run_single_transfer(cfg, engine)
    assert report.images == 6
    out = os.path.join(
        synth_dataset,
        "PACS/all_style_transferred_Single/photo/sketch/horse/img2_sketch.png",
    )
    assert os.path.exists(out), out


def test_output_resize(synth_dataset):
    """camelyon17-style post-resize (512 -> 96 in the reference; here 32 -> 16)."""
    cfg = small_cfg(synth_dataset, output_size=16)
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    for d in DOMAINS:
        if d != cfg.target:
            compute_style_bank(cfg, d, encoder_params=enc)
    engine = StylizeEngine(enc, dec, dtype=jnp.float32, output_size=16)
    run_overall_transfer(cfg, engine)
    img = load_image(
        os.path.join(
            synth_dataset,
            "PACS/all_style_transferred_Overall/photo/cartoon/dog/img0_cartoon.png",
        )
    )
    assert img.shape == (16, 16, 3)


def test_stylize_multi_equals_per_style(rng):
    """The single-encode multi-style path must produce the same images as
    per-style stylize calls (it reuses the identical content features)."""
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    images = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    s_means = rng.standard_normal((3, 512)).astype(np.float32) * 0.05
    s_stds = (rng.random((3, 512)).astype(np.float32) * 0.1 + 0.02)
    multi = np.asarray(engine.stylize_multi(images, s_means, s_stds, 0.9))
    for si in range(3):
        single = np.asarray(engine.stylize(images, s_means[si], s_stds[si], 0.9))
        np.testing.assert_allclose(multi[si], single, rtol=1e-5, atol=1e-6)


def test_full_path_parity_vs_torch(rng):
    """BASELINE.md: < 1e-3 mean-abs pixel error vs the torch reference path
    (encoder -> adaIN_StyleStat_ContentFeat -> alpha blend -> decoder)."""
    torch.manual_seed(0)
    t_enc = build_torch_stack(vgg.ENCODER_ARCH).eval()
    t_dec = build_torch_stack(vgg.DECODER_ARCH).eval()
    enc = from_torch_sequential(sequential_state_dict(t_enc), vgg.ENCODER_ARCH)
    dec = from_torch_sequential(sequential_state_dict(t_dec), vgg.DECODER_ARCH)

    content = rng.random((2, 64, 64, 3), dtype=np.float32)
    s_mean = rng.standard_normal((512,), dtype=np.float32) * 0.05
    s_std = (rng.random((512,), dtype=np.float32) * 0.1 + 0.02).astype(np.float32)
    alpha = 0.8

    with torch.no_grad():
        c = torch.from_numpy(np.transpose(content, (0, 3, 1, 2)).copy())
        f = t_enc(c)
        t = torch_adain_from_stats(
            f,
            torch.from_numpy(s_mean).view(1, -1, 1, 1),
            torch.from_numpy(s_std).view(1, -1, 1, 1),
        )
        t = alpha * t + (1 - alpha) * f
        ref = t_dec(t).numpy().transpose(0, 2, 3, 1)

    engine = StylizeEngine(enc, dec, dtype=jnp.float32)
    ours = np.asarray(engine.stylize(jnp.asarray(content), s_mean, s_std, alpha))
    mae = np.mean(np.abs(ours - ref))
    assert mae < 1e-3, f"mean abs pixel error {mae} >= 1e-3"
    # and the bf16 production path stays visually equivalent
    engine16 = StylizeEngine(enc, dec, dtype=jnp.bfloat16)
    ours16 = np.asarray(engine16.stylize(jnp.asarray(content), s_mean, s_std, alpha))
    assert np.mean(np.abs(ours16 - ref)) < 3e-2
