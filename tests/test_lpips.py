"""LPIPS architecture parity (VERDICT r2 missing #2 / directive #9).

An independent torch twin implements the LPIPS v0.1 computation graph
(richzhang/PerceptualSimilarity; the metric the reference calls via
``lpips.LPIPS(net='vgg')``, reconstruct_img/test.py:28,184). Both sides load
the SAME torch.save'd checkpoint bytes (a torchvision-layout VGG16 features
state dict + LPIPS lin-head state dict — random weights, since the published
files need network egress), and the distances must agree to fp tolerance.
This proves the converted-weight path: with the real files, `invert-eval
--lpips-vgg ... --lpips-lin ...` computes the true reference metric.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from ccst_tpu.privacy.lpips import (
    TAP_AFTER, TAP_CHANNELS, VGG16_PLAN, load_lpips_weights, lpips_distance,
)


class TorchVGG16Features(nn.Module):
    """torchvision vgg16.features skeleton (matching indices/keys)."""

    def __init__(self):
        super().__init__()
        layers = []
        cin = 3
        for item in VGG16_PLAN:
            if item == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                _, cout = item
                layers.append(nn.Conv2d(cin, cout, 3, padding=1))
                layers.append(nn.ReLU())
                cin = cout
        self.features = nn.Sequential(*layers)

    def taps(self, x):
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            # tap right after the relu that follows conv index i-1
            if i >= 1 and isinstance(layer, nn.ReLU) and (i - 1) in TAP_AFTER:
                out.append(x)
        return out


def torch_lpips(tmodel, lins_sd, a, b, eps=1e-10):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def prep(x):
        return (x * 2.0 - 1.0 - shift) / scale

    with torch.no_grad():
        ta = tmodel.taps(prep(a))
        tb = tmodel.taps(prep(b))
        total = 0.0
        for i, (fa, fb) in enumerate(zip(ta, tb)):
            na = fa / (fa.pow(2).sum(dim=1, keepdim=True).sqrt() + eps)
            nb = fb / (fb.pow(2).sum(dim=1, keepdim=True).sqrt() + eps)
            d2 = (na - nb).pow(2)
            lin = lins_sd[f"lin{i}.model.1.weight"]  # (1, C, 1, 1)
            val = F.conv2d(d2, lin).mean(dim=(1, 2, 3))
            total = total + val
    return total.numpy()


@pytest.fixture(scope="module")
def lpips_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lpips")
    torch.manual_seed(3)
    tmodel = TorchVGG16Features().eval()
    # torchvision checkpoints key convs as features.N.*
    vgg_sd = {f"features.{k}": v for k, v in tmodel.features.state_dict().items()}
    lins_sd = {
        f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
        for i, c in enumerate(TAP_CHANNELS)
    }
    vgg_path, lin_path = str(tmp / "vgg16.pth"), str(tmp / "lins.pth")
    torch.save(vgg_sd, vgg_path)
    torch.save(lins_sd, lin_path)
    return tmodel, lins_sd, vgg_path, lin_path


def test_lpips_parity_with_torch_twin(lpips_files, rng):
    tmodel, lins_sd, vgg_path, lin_path = lpips_files
    vggp, lins = load_lpips_weights(vgg_path, lin_path)

    a = rng.random((2, 64, 64, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    got = np.asarray(lpips_distance(vggp, lins, jnp.asarray(a), jnp.asarray(b)))
    want = torch_lpips(
        tmodel, lins_sd,
        torch.from_numpy(a.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(b.transpose(0, 3, 1, 2).copy()),
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    assert got.min() > 0  # distinct images have positive distance


def test_lpips_identity_and_monotonicity(lpips_files, rng):
    """Metric sanity: d(x, x) == 0 and distance grows with distortion."""
    _, _, vgg_path, lin_path = lpips_files
    vggp, lins = load_lpips_weights(vgg_path, lin_path)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    d0 = float(lpips_distance(vggp, lins, jnp.asarray(x), jnp.asarray(x))[0])
    assert d0 < 1e-8
    prev = d0
    for amp in (0.05, 0.15, 0.4):
        y = np.clip(x + rng.normal(0, amp, x.shape), 0, 1).astype(np.float32)
        d = float(lpips_distance(vggp, lins, jnp.asarray(x), jnp.asarray(y))[0])
        assert d > prev
        prev = d
