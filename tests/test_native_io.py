"""Native C++ IO tier (ccst_tpu/native/ccst_io.cpp) vs the PIL path.

The loader auto-selects the native backend when the .so is present
(data/loader.py:77-82), so its decode/resize/encode must be
pixel-equivalent to PIL — otherwise golden anchors and stylize outputs
silently depend on which backend happened to load. These tests pin that
contract; they skip when no toolchain could build the library.
"""
import os

import numpy as np
import pytest

from ccst_tpu import native
from ccst_tpu.data.loader import ImageBatchLoader, load_image, save_image_u8

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable"
)


@pytest.fixture
def png_tree(tmp_path, rng):
    paths = []
    for i in range(5):
        p = os.path.join(str(tmp_path), f"img{i}.png")
        save_image_u8(rng.random((40, 40, 3)).astype(np.float32), p)
        paths.append(p)
    return paths


def test_native_decode_matches_pil(png_tree):
    """Identity-size decode must be bit-equal; PIL-parity bilinear resize
    within 1 u8 LSB per pixel."""
    p = png_tree[0]
    np.testing.assert_array_equal(
        native.decode_resize(p, 40), load_image(p, 40)
    )
    got_r = native.decode_resize(p, 24)
    assert got_r.shape == (24, 24, 3)
    np.testing.assert_allclose(got_r, load_image(p, 24), atol=1.01 / 255)


def test_loader_backend_parity(png_tree):
    """The same list through backend='native' and backend='pil' yields
    identical batches (the auto-selection must be behavior-invisible)."""
    labels = list(range(len(png_tree)))
    batches = {}
    for backend in ("native", "pil"):
        loader = ImageBatchLoader(
            png_tree, labels, batch_size=2, image_size=40,
            shuffle=False, backend=backend,
        )
        batches[backend] = [np.asarray(b.images) for b in loader]
    assert len(batches["native"]) == len(batches["pil"]) == 3
    for a, b in zip(batches["native"], batches["pil"]):
        np.testing.assert_array_equal(a, b)


def test_native_png_encode_roundtrip(tmp_path, rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    p = os.path.join(str(tmp_path), "enc.png")
    native.encode_png(p, img)
    from PIL import Image

    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_native_jpeg_encode_decodable(tmp_path):
    # smooth gradient, not noise: JPEG quantization legitimately destroys
    # white noise (measured ~48 mean error) but roundtrips smooth content
    # at ~0.9
    xx, yy = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32))
    img = (np.stack([xx, yy, (xx + yy) / 2], -1) * 255).astype(np.uint8)
    p = os.path.join(str(tmp_path), "enc.jpg")
    native.encode_jpeg(p, img, quality=95)
    from PIL import Image

    back = np.asarray(Image.open(p).convert("RGB"))
    assert back.shape == img.shape
    assert np.mean(np.abs(back.astype(np.int32) - img.astype(np.int32))) < 3


def test_batch_decode_reports_bad_path(png_tree, tmp_path):
    """A missing file fails loudly, naming the path (loader relies on this
    rather than silently training on garbage)."""
    bad = os.path.join(str(tmp_path), "missing.png")
    ok = native.decode_resize_batch([png_tree[0], png_tree[1]], 24)
    assert ok.shape == (2, 24, 24, 3)
    with pytest.raises(IOError, match="missing.png"):
        native.decode_resize_batch([png_tree[0], bad], 24)
