"""ImageNet-weight converter: full-forward parity vs a torchvision-keyed
torch ResNet18 with shared random weights."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ccst_tpu.models.classifiers import get_network
from ccst_tpu.models.convert_resnet import (
    convert_torchvision_resnet,
    load_imagenet_resnet,
)
from tests.torch_ref import TorchResNet18


def test_resnet18_conversion_forward_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchResNet18(classes=1000).eval()
    # give BN non-trivial running stats
    with torch.no_grad():
        tmodel(torch.randn(4, 3, 64, 64))

    model = get_network("resnet18", classes=7)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = convert_torchvision_resnet(
        tmodel.state_dict(), variables["params"], variables["batch_stats"]
    )

    # copy the torch fc into our (renamed) head for an end-to-end compare
    params = dict(params)
    params["class_classifier"] = {
        "kernel": jnp.asarray(tmodel.fc.weight.detach().numpy().T[:, :7]),
        "bias": jnp.asarray(tmodel.fc.bias.detach().numpy()[:7]),
    }

    imgs = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)).copy()))
    ours = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(imgs),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy()[:, :7], rtol=1e-3, atol=1e-4
    )


def test_load_imagenet_resnet_gates_on_missing_file():
    model = get_network("resnet18", classes=7)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)), train=False)
    p, s, loaded = load_imagenet_resnet(
        "/nonexistent/resnet18.pth", variables["params"], variables["batch_stats"]
    )
    assert not loaded


def test_load_imagenet_resnet_from_pth(tmp_path):
    torch.manual_seed(1)
    tmodel = TorchResNet18()
    path = str(tmp_path / "resnet18.pth")
    torch.save(tmodel.state_dict(), path)
    model = get_network("resnet18", classes=7)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)), train=False)
    p, s, loaded = load_imagenet_resnet(path, variables["params"], variables["batch_stats"])
    assert loaded
    np.testing.assert_allclose(
        np.asarray(p["conv1"]["kernel"]),
        tmodel.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
        rtol=1e-6,
    )
    # head untouched (stays random like the reference's strict=False load)
    np.testing.assert_allclose(
        np.asarray(p["class_classifier"]["kernel"]),
        np.asarray(variables["params"]["class_classifier"]["kernel"]),
    )


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_resnet50_conversion_forward_parity(rng):
    """Bottleneck path of the converter (the reference also loads pretrained
    resnet50, nets/resnet.py:339-345,350-370): 3 convs per block plus the
    downsample conv landing on the block's LAST Conv_i, across all 16
    blocks/4 stages."""
    from tests.torch_ref import TorchResNet50

    torch.manual_seed(1)
    tmodel = TorchResNet50(classes=1000).eval()
    with torch.no_grad():
        tmodel(torch.randn(4, 3, 64, 64))  # non-trivial running stats

    model = get_network("resnet50", classes=7)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = convert_torchvision_resnet(
        tmodel.state_dict(), variables["params"], variables["batch_stats"]
    )
    params = dict(params)
    params["class_classifier"] = {
        "kernel": jnp.asarray(tmodel.fc.weight.detach().numpy().T[:, :7]),
        "bias": jnp.asarray(tmodel.fc.bias.detach().numpy()[:7]),
    }

    imgs = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)).copy()))
    ours = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(imgs),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy()[:, :7], rtol=1e-3, atol=2e-4
    )
