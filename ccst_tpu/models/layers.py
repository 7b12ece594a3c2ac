"""Shared nn layers for the classifier zoo (flax.linen, NHWC)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# torch Conv2d kaiming_normal_(mode='fan_out', nonlinearity='relu') equivalent
# (reference nets/resnet.py:149-151).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)


class InstanceNorm(nn.Module):
    """Per-(N, C) spatial normalization (torch ``InstanceNorm2d``).

    Used by ResNetIN (nets/resnet.py:193-232) and the IN-test BN swap
    (federated/fed_run.py:218-232). No running stats — normalization uses
    the sample's own statistics at train and eval alike.
    """

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            out = out * scale + bias
        return out.astype(orig_dtype)


class StatFreeNorm(nn.Module):
    """torch ``BatchNorm2d(affine=False, track_running_stats=False)``: batch
    statistics at train *and* eval, nothing learnable, nothing aggregated.
    This is the norm the reference DenseNet uses everywhere
    (nets/densenet.py:11,15,40,67,91) — chosen so FedAvg has no BN state to
    mishandle on Camelyon17.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        axes = tuple(range(xf.ndim - 1))
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(orig_dtype)


class MixStyle(nn.Module):
    """Batch-shuffled instance-statistic mixing (nets/layers.py:6-73).

    Train-only, applied with probability ``p`` per call; lambda ~ Beta(alpha,
    alpha) per sample; statistics are stop-gradiented like the reference's
    ``.detach()``. Requires an rng stream named ``"mixstyle"``.
    """

    p: float = 0.5
    alpha: float = 0.1
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        if not train:
            return x
        key = self.make_rng("mixstyle")
        k_gate, k_beta, k_perm = jax.random.split(key, 3)
        b = x.shape[0]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        sig = jnp.sqrt(var + self.eps)
        mu = jax.lax.stop_gradient(mu)
        sig = jax.lax.stop_gradient(sig)
        x_normed = (xf - mu) / sig

        lmda = jax.random.beta(k_beta, self.alpha, self.alpha, (b, 1, 1, 1))
        perm = jax.random.permutation(k_perm, b)
        mu_mix = mu * lmda + mu[perm] * (1 - lmda)
        sig_mix = sig * lmda + sig[perm] * (1 - lmda)
        mixed = (x_normed * sig_mix + mu_mix).astype(x.dtype)

        apply = jax.random.bernoulli(k_gate, self.p)
        return jnp.where(apply, mixed, x)


def max_pool_same(x: Array, window: int, stride: int, padding: int) -> Array:
    """torch ``MaxPool2d(window, stride, padding)`` (symmetric zero... -inf pad)."""
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def avg_pool(x: Array, window: int, stride: int) -> Array:
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


def global_avg_pool(x: Array) -> Array:
    return jnp.mean(x, axis=(1, 2))
