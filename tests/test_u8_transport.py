"""u8 transport: content batches ship to the device as decoded bytes.

The stylize path moves content host->device as uint8 (1/4 the traffic of
float32 — the PCIe/tunnel leg) and normalizes on device. These tests pin the
bit-identity claims that make the mode safe to use unconditionally:

- loader: ``out_dtype="uint8"`` bytes / 255 == the float32 batches exactly
  (both backends resize in u8/PIL-parity space, loader.py::load_image)
- engine: stylize outputs from a u8 batch == outputs from the float batch
  (``as_input`` divides the same integer bytes by 255 in float32)
- calibration: scales computed from a u8 batch == scales from the float one
"""
import os

import numpy as np
import jax
import pytest

from ccst_tpu.data.loader import ImageBatchLoader, save_image_u8
from ccst_tpu.models import vgg
from ccst_tpu.pipeline.stylize import StylizeEngine


@pytest.fixture
def image_dir(tmp_path, rng):
    paths = []
    for i in range(6):
        # odd source size -> exercises the bilinear resize path
        img = rng.uniform(0, 1, (37, 41, 3)).astype(np.float32)
        p = os.path.join(str(tmp_path), f"img{i}.png")
        save_image_u8(img, p)
        paths.append(p)
    return paths


@pytest.mark.parametrize("backend", ["pil", "native"])
def test_loader_u8_bit_parity(image_dir, backend):
    if backend == "native":
        from ccst_tpu import native

        if not native.available():
            pytest.skip("native IO tier unavailable")
    kw = dict(batch_size=3, image_size=32, shuffle=False, backend=backend)
    f32 = np.concatenate([b.images for b in ImageBatchLoader(image_dir, **kw)])
    u8 = np.concatenate(
        [b.images for b in ImageBatchLoader(image_dir, out_dtype="uint8", **kw)]
    )
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8.astype(np.float32) / 255.0, f32)


def test_engine_u8_input_bit_parity(rng):
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    eng = StylizeEngine(enc, dec, dtype=np.float32, engine="ref", output_u8=True)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    s_mean = rng.normal(0, 1, (512,)).astype(np.float32)
    s_std = rng.uniform(0.5, 1.5, (512,)).astype(np.float32)
    out_f = np.asarray(eng.stylize(f32, s_mean, s_std))
    out_u = np.asarray(eng.stylize(u8, s_mean, s_std))
    np.testing.assert_array_equal(out_u, out_f)
    # multi-style path too
    means, stds = s_mean[None], s_std[None]
    np.testing.assert_array_equal(
        np.asarray(eng.stylize_multi(u8, means, stds)),
        np.asarray(eng.stylize_multi(f32, means, stds)),
    )


def test_calibration_u8_input_parity(rng):
    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    bank = [(
        rng.normal(0, 1, (512,)).astype(np.float32),
        rng.uniform(0.5, 1.5, (512,)).astype(np.float32),
    )]
    scales = {}
    for name, imgs in (("u8", u8), ("f32", f32)):
        e = StylizeEngine(enc, dec, dtype=np.float32, engine="int8-static")
        e.calibrate(imgs, bank, max_images=2)
        scales[name] = e.scales
    assert scales["u8"] == scales["f32"]
