"""AdaIN training objective (decoder training), functional.

Mirrors the reference ``Net`` wrapper (style_transfer/AdaIN/net.py:95-152):
frozen encoder, content loss = MSE(relu4_1(g_t), t), style loss = sum over
relu{1..4}_1 taps of MSE on per-channel (mean, std). The reference never
trains the decoder in-repo (it downloads weights) but ships this wrapper;
here it is a first-class, jittable training step so the decoder can be
(re)trained on TPU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ccst_tpu.models import vgg
from ccst_tpu.ops.adain import adain, calc_mean_std

Array = jax.Array

_TAPS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1")


def adain_losses(
    encoder_params,
    decoder_params,
    content: Array,
    style: Array,
    alpha: float = 1.0,
) -> Tuple[Array, Array]:
    """(content_loss, style_loss) of one batch (net.py:138-152)."""
    style_feats = vgg.encoder_taps(encoder_params, style)
    content_feat = vgg.apply_encoder(encoder_params, content)

    t = adain(content_feat, style_feats["relu4_1"])
    t = alpha * t + (1 - alpha) * content_feat
    t = jax.lax.stop_gradient(t)  # encoder frozen; t is the regression target

    g_t = vgg.apply_decoder(decoder_params, t)
    g_t_feats = vgg.encoder_taps(encoder_params, g_t)

    def mse(a: Array, b: Array) -> Array:
        return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))

    loss_c = mse(g_t_feats["relu4_1"], t)
    loss_s = jnp.asarray(0.0, jnp.float32)
    for name in _TAPS:
        gm, gs = calc_mean_std(g_t_feats[name])
        sm, ss = calc_mean_std(jax.lax.stop_gradient(style_feats[name]))
        loss_s = loss_s + mse(gm, sm) + mse(gs, ss)
    return loss_c, loss_s


def adain_train_step(
    encoder_params,
    decoder_params,
    content: Array,
    style: Array,
    lr: float = 1e-4,
    style_weight: float = 10.0,
    content_weight: float = 1.0,
    axis_name: str | None = None,
):
    """One SGD step on the decoder. With ``axis_name`` set, gradients are
    `pmean`ed across that mesh axis (data parallelism)."""

    def total_loss(dec):
        lc, ls = adain_losses(encoder_params, dec, content, style)
        return content_weight * lc + style_weight * ls

    loss, grads = jax.value_and_grad(total_loss)(decoder_params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
    new_dec = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), decoder_params, grads)
    return new_dec, loss
