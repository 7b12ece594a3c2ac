"""Classifier zoo (flax.linen, NHWC): ResNet-18/50 (+IN/Jigsaw/MixStyle),
DenseNet-121 (Camelyon17 stat-free-norm variant), DigitModel, AlexNet.

Re-designed from the reference zoo (nets/resnet.py, nets/densenet.py,
nets/models.py) for TPU: channels-last, jit-friendly, BN state in flax
``batch_stats`` collections (so federated aggregation can treat BN exactly —
FedBN keeps it local, FedAvg averages it). The classification head keeps the
reference's name ``class_classifier`` (nets/resnet.py:147) so checkpoints and
aggregation rules match by key.

Known reference divergences (deliberate, see SURVEY.md §6b):
  - DenseNet honors the requested class count (the reference silently ignores
    it and always builds a binary head, nets/densenet.py:59,141-153).
  - Global average pooling replaces fixed ``AvgPool2d(7)``; identical at the
    canonical 222px resolution (7x7 final grid) and correct at any other.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ccst_tpu.models.layers import (
    InstanceNorm,
    MixStyle,
    StatFreeNorm,
    TorchBatchNorm,
    avg_pool,
    global_avg_pool,
    kaiming_normal_fan_out,
    max_pool_same,
)

Array = jax.Array

JIGSAW_CLASSES = 31  # 30 permutations + "unshuffled" (nets/resnet.py:266)


def make_norm(kind: str):
    """norm factory: 'bn' | 'in' | 'statfree'."""
    if kind == "bn":
        # TorchBatchNorm, not flax BatchNorm: torch parity of the RUNNING
        # variance (unbiased update — see models/layers.py docstring); the
        # reference's eval paths read running stats, so this is load-bearing
        # for eval equivalence (tests/test_train_equivalence_ext.py).
        return partial(TorchBatchNorm, momentum=0.9, epsilon=1e-5)
    if kind == "in":
        return lambda use_running_average=None, name=None, **kw: InstanceNorm(name=name)
    if kind == "statfree":
        return lambda use_running_average=None, name=None, **kw: StatFreeNorm(name=name)
    raise ValueError(f"unknown norm kind {kind!r}")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "bn"
    expansion: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        norm = make_norm(self.norm)
        conv = partial(nn.Conv, use_bias=False, kernel_init=kaiming_normal_fan_out)
        identity = x
        out = conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1)(x)
        out = norm(use_running_average=not train, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), padding=1)(out)
        out = norm(use_running_average=not train, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = conv(
                self.planes * self.expansion, (1, 1), strides=(self.stride, self.stride)
            )(x)
            identity = norm(use_running_average=not train, name="bn_down")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "bn"
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        norm = make_norm(self.norm)
        conv = partial(nn.Conv, use_bias=False, kernel_init=kaiming_normal_fan_out)
        identity = x
        out = conv(self.planes, (1, 1))(x)
        out = norm(use_running_average=not train, name="bn1")(out)
        out = nn.relu(out)
        # torchvision v1.5: stride on the 3x3
        out = conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1)(out)
        out = norm(use_running_average=not train, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * self.expansion, (1, 1))(out)
        out = norm(use_running_average=not train, name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = conv(
                self.planes * self.expansion, (1, 1), strides=(self.stride, self.stride)
            )(x)
            identity = norm(use_running_average=not train, name="bn_down")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet with the reference's renamed head (nets/resnet.py:132-191).

    ``jigsaw=True`` adds the 31-way auxiliary head and returns a tuple
    (class_logits, jig_logits) (JigsawResNet, nets/resnet.py:262-279).
    ``mixstyle_layers`` inserts MixStyle after the named stages
    (MixStyleResNet, nets/resnet.py:281-311).
    """

    classes: int
    block: str = "basic"                  # "basic" | "bottleneck"
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    norm: str = "bn"
    jigsaw: bool = False
    mixstyle_layers: Sequence[str] = ()
    mixstyle_p: float = 0.5
    mixstyle_alpha: float = 0.1

    @nn.compact
    def __call__(self, x: Array, train: bool = True, return_features: bool = False):
        norm = make_norm(self.norm)
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            kernel_init=kaiming_normal_fan_out, name="conv1",
        )(x)
        x = norm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_same(x, 3, 2, 1)

        mix = (
            MixStyle(p=self.mixstyle_p, alpha=self.mixstyle_alpha)
            if self.mixstyle_layers
            else None
        )
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), self.stage_sizes), start=1
        ):
            for i in range(n_blocks):
                stride = 2 if (stage > 1 and i == 0) else 1
                x = block_cls(
                    planes=planes, stride=stride, norm=self.norm,
                    name=f"layer{stage}_{i}",
                )(x, train=train)
            if mix is not None and f"layer{stage}" in self.mixstyle_layers:
                x = mix(x, train=train)

        x = global_avg_pool(x)
        if return_features:
            return x  # pooled penultimate vector (RSC's featurizer output)
        logits = nn.Dense(self.classes, name="class_classifier")(x)
        if self.jigsaw:
            jig = nn.Dense(JIGSAW_CLASSES, name="jig_classifier")(x)
            return logits, jig
        return logits


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        out = StatFreeNorm()(x)
        out = nn.relu(out)
        out = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            kernel_init=kaiming_normal_fan_out,
        )(out)
        out = StatFreeNorm()(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.growth_rate, (3, 3), padding=1, use_bias=False,
            kernel_init=kaiming_normal_fan_out,
        )(out)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    """DenseNet-BC with stat-free normalization (nets/densenet.py:47-153),
    including the reference's ``zero_padding`` after dense block 1 (:86) that
    fits 96px Camelyon17 patches."""

    classes: int = 2
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.0
    jigsaw: bool = False
    mixstyle: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True, return_features: bool = False):
        x = nn.Conv(
            self.num_init_features, (7, 7), strides=(2, 2), padding=3,
            use_bias=False, kernel_init=kaiming_normal_fan_out, name="conv0",
        )(x)
        x = StatFreeNorm()(x)
        x = nn.relu(x)
        x = max_pool_same(x, 3, 2, 1)

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = DenseLayer(
                    growth_rate=self.growth_rate,
                    bn_size=self.bn_size,
                    drop_rate=self.drop_rate,
                    name=f"denseblock{i + 1}_layer{j + 1}",
                )(x, train=train)
            if self.mixstyle and i in (0, 1):
                x = MixStyle(p=0.5, alpha=0.1)(x, train=train)
            num_features += num_layers * self.growth_rate
            if i == 0:
                x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))  # zero_padding
            if i != len(self.block_config) - 1:
                x = StatFreeNorm()(x)
                x = nn.relu(x)
                x = nn.Conv(
                    num_features // 2, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal_fan_out, name=f"transition{i + 1}",
                )(x)
                x = avg_pool(x, 2, 2)
                num_features //= 2
        x = StatFreeNorm()(x)
        x = nn.relu(x)
        x = global_avg_pool(x)
        if return_features:
            return x
        logits = nn.Dense(self.classes, name="classifier")(x)
        if self.jigsaw:
            jig = nn.Dense(JIGSAW_CLASSES, name="jig_classifier")(x)
            return logits, jig
        return logits


class DigitModel(nn.Module):
    """3-conv/3-fc digits benchmark model (nets/models.py:65-105), 28px."""

    classes: int = 10

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        bn = partial(TorchBatchNorm, momentum=0.9, epsilon=1e-5)
        x = nn.Conv(64, (5, 5), padding=2)(x)
        x = bn(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_same(x, 2, 2, 0)
        x = nn.Conv(64, (5, 5), padding=2)(x)
        x = bn(use_running_average=not train, name="bn2")(x)
        x = nn.relu(x)
        x = max_pool_same(x, 2, 2, 0)
        x = nn.Conv(128, (5, 5), padding=2)(x)
        x = bn(use_running_average=not train, name="bn3")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(2048)(x)
        x = bn(use_running_average=not train, name="bn4")(x)
        x = nn.relu(x)
        x = nn.Dense(512)(x)
        x = bn(use_running_average=not train, name="bn5")(x)
        x = nn.relu(x)
        return nn.Dense(self.classes, name="class_classifier")(x)


class AlexNet(nn.Module):
    """BN AlexNet (nets/models.py:7-62), for DomainNet / Office-Caltech."""

    classes: int = 10

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        # explicit bn1..bn7 names (reference nets/models.py:16-49): flax
        # auto-names would not match aggregate.is_bn_path's fedbn selector
        bn = partial(TorchBatchNorm, momentum=0.9, epsilon=1e-5)
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=2)(x)
        x = bn(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_same(x, 3, 2, 0)
        x = nn.Conv(192, (5, 5), padding=2)(x)
        x = bn(use_running_average=not train, name="bn2")(x)
        x = nn.relu(x)
        x = max_pool_same(x, 3, 2, 0)
        x = nn.Conv(384, (3, 3), padding=1)(x)
        x = bn(use_running_average=not train, name="bn3")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=1)(x)
        x = bn(use_running_average=not train, name="bn4")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=1)(x)
        x = bn(use_running_average=not train, name="bn5")(x)
        x = nn.relu(x)
        x = max_pool_same(x, 3, 2, 0)
        # AdaptiveAvgPool2d((6,6)) at canonical sizes is identity/near; use resize
        if x.shape[1] != 6 or x.shape[2] != 6:
            x = jax.image.resize(
                x, (x.shape[0], 6, 6, x.shape[-1]), method="bilinear"
            )
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(4096)(x)
        x = bn(use_running_average=not train, name="bn6")(x)
        x = nn.relu(x)
        x = nn.Dense(4096)(x)
        x = bn(use_running_average=not train, name="bn7")(x)
        x = nn.relu(x)
        return nn.Dense(self.classes, name="class_classifier")(x)


# ---------------------------------------------------------------------------
# Registry (nets/models.py:114-133)
# ---------------------------------------------------------------------------


def get_network(
    name: str,
    classes: int,
    dg_method: str = "no_DG",
) -> nn.Module:
    """Build a classifier module by registry name, honoring the DG-method
    variants the reference selects in its factory functions
    (nets/resnet.py:314-369, nets/densenet.py:141-153)."""
    dg = dg_method.lower()
    jigsaw = dg == "jigsaw"
    mixstyle = dg == "mixstyle"
    mix_layers = ("layer1", "layer2", "layer3") if mixstyle else ()

    if name == "resnet4":
        return ResNet(classes=classes, block="basic", stage_sizes=(1, 1, 1, 1),
                      jigsaw=jigsaw, mixstyle_layers=mix_layers)
    if name == "resnet18":
        return ResNet(classes=classes, block="basic", stage_sizes=(2, 2, 2, 2),
                      jigsaw=jigsaw, mixstyle_layers=mix_layers)
    if name == "resnet18IN":
        return ResNet(classes=classes, block="basic", stage_sizes=(2, 2, 2, 2),
                      norm="in")
    if name == "resnet50":
        return ResNet(classes=classes, block="bottleneck", stage_sizes=(3, 4, 6, 3),
                      jigsaw=jigsaw, mixstyle_layers=mix_layers)
    if name == "DigitModel":
        return DigitModel(classes=classes)
    if name == "densenet":
        return DenseNet(classes=classes, jigsaw=jigsaw, mixstyle=mixstyle)
    if name == "alexnet":
        return AlexNet(classes=classes)
    raise ValueError(f"Name of network unknown {name}")


NETS = ("resnet4", "resnet18", "resnet18IN", "resnet50", "DigitModel", "densenet", "alexnet")
