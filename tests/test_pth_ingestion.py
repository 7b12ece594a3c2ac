"""File-level `.pth` ingestion (VERDICT r2 missing #3 / directive #8).

The converters had only ever seen in-memory state dicts; here genuine
``torch.save`` bytes flow through the *file* loading paths the CLI uses
(`--vgg-weights x.pth`, `load_imagenet_resnet`), exactly as a user with the
reference's published checkpoints (`/root/reference/README.md:21`,
vgg_normalised.pth / decoder.pth; torchvision ImageNet weights,
`/root/reference/nets/resnet.py:339-345`) would drive them — and forward
parity is asserted against the torch model the bytes came from.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ccst_tpu.models import vgg as jvgg
from ccst_tpu.models.convert import load_decoder, load_encoder
from tests.torch_ref import build_torch_stack, sequential_state_dict


def test_vgg_pth_file_roundtrip(tmp_path, rng):
    """torch.save'd sequential state dicts (the reference checkpoint layout)
    through load_encoder/load_decoder's .pth file route, forward parity."""
    torch.manual_seed(0)
    tenc = build_torch_stack(jvgg.ENCODER_ARCH).eval()
    tdec = build_torch_stack(jvgg.DECODER_ARCH).eval()
    enc_path, dec_path = str(tmp_path / "vgg_normalised.pth"), str(tmp_path / "decoder.pth")
    torch.save(sequential_state_dict(tenc), enc_path)
    torch.save(sequential_state_dict(tdec), dec_path)

    enc = load_encoder(enc_path)
    dec = load_decoder(dec_path)

    x = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        feat_t = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
        out_t = tdec(feat_t)
    feat = jvgg.apply_encoder(enc, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(feat), feat_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5,
    )
    out = jvgg.apply_decoder(dec, feat)
    np.testing.assert_allclose(
        np.asarray(out), out_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=2e-4,
    )


def test_resnet18_pth_file_ingestion(tmp_path, rng):
    """torchvision-layout resnet18 weights serialized with torch.save, read
    back through load_imagenet_resnet's FILE path; 2e-4 forward parity (same
    tolerance as the in-memory converter test)."""
    from ccst_tpu.models.classifiers import get_network
    from ccst_tpu.models.convert_resnet import load_imagenet_resnet
    from tests.torch_ref import TorchResNet18

    torch.manual_seed(1)
    tmodel = TorchResNet18(classes=7).eval()
    path = str(tmp_path / "resnet18-imagenet.pth")
    torch.save(tmodel.state_dict(), path)

    jmodel = get_network("resnet18", classes=7)
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 36, 36, 3)), train=False
    )
    params, stats, loaded = load_imagenet_resnet(
        path, variables["params"], variables["batch_stats"]
    )
    assert loaded
    # the converter skips the renamed task head (strict=False semantics,
    # nets/resnet.py:345); copy it so end-to-end logits are comparable
    params = dict(params)
    params["class_classifier"] = {
        "kernel": jnp.asarray(tmodel.fc.weight.detach().numpy().T),
        "bias": jnp.asarray(tmodel.fc.bias.detach().numpy()),
    }

    x = rng.random((2, 36, 36, 3), dtype=np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    got = np.asarray(
        jmodel.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x),
            train=False,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)

    missing = str(tmp_path / "nope.pth")
    p2, s2, loaded2 = load_imagenet_resnet(
        missing, variables["params"], variables["batch_stats"]
    )
    assert not loaded2  # absent cache: untouched params (reference gate)
