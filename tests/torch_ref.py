"""Torch golden-reference implementations for parity tests.

These re-state the reference's *formulas* (cited per function) in torch so
tests can compare our JAX ops against torch-CPU numerics with freshly
initialized weights — the published ``.pth`` checkpoints are not available in
this environment. Test-only module; the framework itself never imports torch.
"""
from __future__ import annotations

import torch
import torch.nn as nn

from ccst_tpu.models.vgg import Conv, Pool, Tap, Upsample


def torch_calc_mean_std(feat: torch.Tensor, eps: float = 1e-5):
    """Formula of reference style_transfer/AdaIN/function.py:4-13 (NCHW)."""
    n, c = feat.shape[:2]
    var = feat.view(n, c, -1).var(dim=2) + eps  # torch default: unbiased
    std = var.sqrt().view(n, c, 1, 1)
    mean = feat.view(n, c, -1).mean(dim=2).view(n, c, 1, 1)
    return mean, std


def torch_adain(content, style, eps: float = 1e-5):
    """function.py:16-24."""
    s_mean, s_std = torch_calc_mean_std(style, eps)
    c_mean, c_std = torch_calc_mean_std(content, eps)
    return (content - c_mean) / c_std * s_std + s_mean


def torch_adain_from_stats(content, style_mean, style_std, eps: float = 1e-5):
    """function.py:26-33."""
    c_mean, c_std = torch_calc_mean_std(content, eps)
    return (content - c_mean) / c_std * style_std + style_mean


def torch_coral(source, target):
    """function.py:36-77 (CHW images)."""

    def flat_mean_std(feat):
        flat = feat.view(3, -1)
        return flat, flat.mean(-1, keepdim=True), flat.std(-1, keepdim=True)

    def mat_sqrt(x):
        u, d, v = torch.svd(x)
        return u @ d.pow(0.5).diag() @ v.t()

    s_f, s_m, s_s = flat_mean_std(source)
    s_norm = (s_f - s_m) / s_s
    s_cov = s_norm @ s_norm.t() + torch.eye(3)
    t_f, t_m, t_s = flat_mean_std(target)
    t_norm = (t_f - t_m) / t_s
    t_cov = t_norm @ t_norm.t() + torch.eye(3)
    transfer = mat_sqrt(t_cov) @ (torch.inverse(mat_sqrt(s_cov)) @ s_norm)
    return (transfer * t_s + t_m).view(source.shape)


def build_torch_stack(arch) -> nn.Sequential:
    """Build an equivalent torch module from our declarative arch spec, so the
    exact same architecture drives both frameworks in parity tests."""
    layers = []
    for layer in arch:
        if isinstance(layer, Conv):
            if layer.ksize == 3:
                layers.append(nn.ReflectionPad2d((1, 1, 1, 1)))
            layers.append(nn.Conv2d(layer.cin, layer.cout, layer.ksize))
            if layer.relu:
                layers.append(nn.ReLU())
        elif isinstance(layer, Pool):
            layers.append(nn.MaxPool2d((2, 2), (2, 2), (0, 0), ceil_mode=True))
        elif isinstance(layer, Upsample):
            layers.append(nn.Upsample(scale_factor=2, mode="nearest"))
        elif isinstance(layer, Tap):
            pass
        else:
            raise TypeError(layer)
    return nn.Sequential(*layers)


def sequential_state_dict(module: nn.Sequential):
    """State dict with flat numeric keys, as the reference checkpoints have."""
    return {k: v for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# Minimal torch ResNet with torchvision's exact state-dict key names, for
# testing the ImageNet-weight converter without torchvision installed.
# ---------------------------------------------------------------------------


class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    """torchvision-compatible resnet18 skeleton (state-dict keys match)."""

    def __init__(self, classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, planes in enumerate((64, 128, 256, 512), start=1):
            blocks = []
            for bi in range(2):
                stride = 2 if (li > 1 and bi == 0) else 1
                downsample = None
                if stride != 1 or inplanes != planes:
                    downsample = nn.Sequential(
                        nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                        nn.BatchNorm2d(planes),
                    )
                blocks.append(TorchBasicBlock(inplanes, planes, stride, downsample))
                inplanes = planes
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class TorchBottleneck(nn.Module):
    """torchvision v1.5 Bottleneck (stride on the 3x3), state-dict-compatible."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(nn.Module):
    """torchvision-compatible resnet50 skeleton (state-dict keys match)."""

    def __init__(self, classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3)), start=1
        ):
            blocks = []
            for bi in range(n_blocks):
                stride = 2 if (li > 1 and bi == 0) else 1
                downsample = None
                if stride != 1 or inplanes != planes * 4:
                    downsample = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                        nn.BatchNorm2d(planes * 4),
                    )
                blocks.append(TorchBottleneck(inplanes, planes, stride, downsample))
                inplanes = planes * 4
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)
