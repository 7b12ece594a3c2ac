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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-statistics semantics.

    flax.linen.BatchNorm stores the BIASED batch variance in ``var``;
    torch's BatchNorm2d stores the UNBIASED one (Bessel-corrected,
    N/(N-1)). Normalization itself uses the biased variance in both
    frameworks, so train-mode forward/backward agree either way — but every
    reference eval path reads the running stats (model.eval(), fed_run.py
    test()/test_fedbn), where the discrepancy is (N/(N-1))x on the stored
    variance: negligible for conv BN (N = batch*H*W) but 33% for
    BatchNorm1d at batch 4 (DigitModel's bn4/bn5). This module mirrors
    torch bit-for-bit: update = momentum*old + (1-momentum)*unbiased_var
    (torch's `momentum`=0.1 == our 0.9 convention).

    Interface-compatible with flax BatchNorm as used by the zoo: params
    ``scale``/``bias``, batch_stats ``mean``/``var``,
    ``use_running_average`` selects eval behavior.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average=None) -> Array:
        use_ra = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        axes = tuple(range(xf.ndim - 1))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)  # biased: used for normalization
            if not self.is_initializing():
                n = xf.size // c
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )
        out = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = out * scale + bias
        return out.astype(orig_dtype)


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
