"""Encoder/decoder parity vs torch with identical (converted) weights.

The BASELINE target is <1e-3 mean-abs pixel error for the full stylize path;
these tests hold the conv stack itself to much tighter fp32 tolerances.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from ccst_tpu.models import vgg as jvgg
from ccst_tpu.models.convert import from_torch_sequential, load_npz, save_npz
from tests.torch_ref import build_torch_stack, sequential_state_dict


def make_pair(arch, seed=0):
    torch.manual_seed(seed)
    tmodule = build_torch_stack(arch).eval()
    params = from_torch_sequential(sequential_state_dict(tmodule), arch)
    return tmodule, params


def test_encoder_parity_even_size(rng):
    tmod, params = make_pair(jvgg.ENCODER_ARCH)
    x = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    ours = jvgg.apply_encoder(params, jnp.asarray(x))
    assert ours.shape == (2, 8, 8, 512)
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_encoder_parity_odd_size_ceil_mode(rng):
    """Odd spatial dims exercise ceil-mode pooling (net.py:46)."""
    tmod, params = make_pair(jvgg.ENCODER_ARCH, seed=1)
    x = rng.random((1, 37, 45, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    ours = jvgg.apply_encoder(params, jnp.asarray(x))
    assert ours.shape[1:3] == tuple(ref.shape[2:4])
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_decoder_parity(rng):
    tmod, params = make_pair(jvgg.DECODER_ARCH, seed=2)
    f = rng.standard_normal((1, 8, 8, 512), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref = tmod(torch.from_numpy(np.transpose(f, (0, 3, 1, 2)).copy()))
    ours = jvgg.apply_decoder(params, jnp.asarray(f))
    assert ours.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_encoder_taps_shapes(rng):
    _, params = make_pair(jvgg.ENCODER_ARCH, seed=3)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    taps = jvgg.encoder_taps(params, x)
    assert taps["relu1_1"].shape == (1, 32, 32, 64)
    assert taps["relu2_1"].shape == (1, 16, 16, 128)
    assert taps["relu3_1"].shape == (1, 8, 8, 256)
    assert taps["relu4_1"].shape == (1, 4, 4, 512)


def test_npz_roundtrip(tmp_path):
    _, params = make_pair(jvgg.DECODER_ARCH, seed=4)
    path = str(tmp_path / "decoder.npz")
    save_npz(path, params)
    loaded = load_npz(path)
    for name in params:
        np.testing.assert_array_equal(
            np.asarray(params[name]["w"]), np.asarray(loaded[name]["w"])
        )


def test_random_init_runs():
    key = jax.random.PRNGKey(0)
    enc = jvgg.init_params(key, jvgg.ENCODER_ARCH)
    dec = jvgg.init_params(key, jvgg.DECODER_ARCH)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    feat = jvgg.apply_encoder(enc, x)
    img = jvgg.apply_decoder(dec, feat)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_polyphase_upsample_conv_parity(rng):
    """upsample_reflect_conv3x3 (documented negative perf result) must still
    equal conv3x3(reflect_pad(nearest2x(x))) exactly."""
    from ccst_tpu.models.vgg import (
        conv2d,
        reflect_pad,
        upsample_nearest2x,
        upsample_reflect_conv3x3,
    )

    x = jnp.asarray(rng.standard_normal((2, 7, 9, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    ref = conv2d(reflect_pad(upsample_nearest2x(x), 1), w, b)
    out = upsample_reflect_conv3x3(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
