"""Per-client training/eval steps for the federated runtime.

Functional, jit/vmap/shard_map-safe rebuilds of the reference's local update
loops (federated/fed_run.py:31-211) and the DG-method dispatch inside them:

  - plain cross-entropy        (fed_run.py:63-65)
  - Jigsaw two-head loss       (fed_run.py:57-62)
  - RSC gradient-percentile feature/sample muting (utils/rsc_utils.py:32-75)
  - FedProx proximal term vs the server weights   (fed_run.py:163-169;
    applied from local step > 0 like the reference)
  - FedDG/ELCFS first-order meta step on a frequency-augmented view
    (fed_run.py:90-146; the reference's autograd.grad without create_graph
    is FOMAML — reproduced exactly with stop_gradient on the inner grads)

A "client state" is a dict {"params": ..., "batch_stats": ...}; batch_stats
may be an empty dict for stat-free models. Optimizer is plain SGD built
fresh each round like the reference (fed_run.py:657) — so there is no
optimizer state to thread.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ccst_tpu.data.jigsaw import jigsaw_batch
from ccst_tpu.ops.fft_aug import feddg_batch_augment
from ccst_tpu.ops.image import eval_transform, train_transform

Array = jax.Array
State = Dict[str, Any]


class StepMetrics(NamedTuple):
    loss: Array
    correct: Array    # class-head correct count
    count: Array      # samples seen
    jig_correct: Array
    active: Array     # 1.0 if the step had any valid samples (0 = padded no-op)


def cross_entropy(logits: Array, labels: Array) -> Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def _masked_mean(per_example: Array, mask: Array) -> Array:
    return jnp.sum(per_example * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _apply(model, state: State, images: Array, train: bool, rngs=None, **kw):
    variables = {"params": state["params"], **(
        {"batch_stats": state["batch_stats"]} if state.get("batch_stats") else {}
    )}
    mutable = ["batch_stats"] if (train and state.get("batch_stats")) else False
    out = model.apply(variables, images, train=train, rngs=rngs, mutable=mutable, **kw)
    if mutable:
        y, new_vars = out
        return y, new_vars.get("batch_stats", {})
    return out, state.get("batch_stats", {})


def _head_apply(params, features: Array, head: str = "class_classifier") -> Array:
    p = params[head] if head in params else params["classifier"]
    return features @ p["kernel"] + p["bias"]


def _masked_percentile(x: Array, mask: Array, q: float) -> Array:
    """``jnp.percentile(x[mask > 0], q)`` with a static shape: padded rows
    must not displace the rank threshold (the torch reference takes the
    percentile over the real rows only). Sorts padding to +inf and linearly
    interpolates at rank q/100*(n_valid-1), matching jnp.percentile's
    default method on the valid subset."""
    xs = jnp.sort(jnp.where(mask > 0, x, jnp.inf))
    n = jnp.sum(mask)
    r = (q / 100.0) * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, x.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, jnp.maximum(n.astype(jnp.int32) - 1, 0))
    w = (r - lo).astype(x.dtype)
    x_lo, x_hi = xs[lo], xs[hi]
    return x_lo + w * jnp.where(w > 0, x_hi - x_lo, jnp.zeros_like(x_lo))


def _rsc_logits(model, state, params, images, labels, n_classes: int,
                mask_valid: Optional[Array] = None):
    """RSC muted logits (utils/rsc_utils.py:32-75): mute the top-1/3
    representation gradients per feature and re-unmute the bottom-2/3 of
    samples by prediction change. ``mask_valid`` (B,) excludes padding rows
    from the batch-level percentile."""
    feats, new_stats = _apply(
        model, {**state, "params": params}, images, train=True,
        return_features=True,
    )
    onehot = jax.nn.one_hot(labels, n_classes)

    def scalar_out(f):
        return jnp.sum(_head_apply(params, f) * onehot)

    g = jax.grad(scalar_out)(feats)
    g = jax.lax.stop_gradient(g)
    # per-sample 66.67th percentile over the feature dim
    pct_f = jnp.percentile(g, (1 - 1 / 3) * 100, axis=1, keepdims=True)
    mask_f = (g < pct_f).astype(feats.dtype)

    logits = _head_apply(params, feats)
    logits_muted = _head_apply(params, feats * mask_f)
    s = jax.nn.softmax(logits, axis=1)
    s_muted = jax.nn.softmax(logits_muted, axis=1)
    changes = jnp.sum(s * onehot, axis=1) - jnp.sum(s_muted * onehot, axis=1)
    changes = jax.lax.stop_gradient(changes)
    if mask_valid is None:
        pct_b = jnp.percentile(changes, (1 - 1 / 3) * 100)
    else:
        pct_b = _masked_percentile(
            changes.astype(jnp.float32), mask_valid, (1 - 1 / 3) * 100
        ).astype(changes.dtype)
    mask_b = (changes < pct_b).astype(feats.dtype)[:, None]
    mask = jnp.maximum(mask_f, mask_b)  # logical_or on {0,1} masks
    return _head_apply(params, feats * mask), new_stats


def _prox_term(params, server_params) -> Array:
    diffs = jax.tree.map(
        lambda a, b: jnp.sum(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))),
        params,
        server_params,
    )
    return sum(jax.tree.leaves(diffs))


def make_train_step(
    model,
    *,
    n_classes: int,
    image_size: int,
    lr: float,
    dg_method: str = "no_DG",
    mode: str = "fedavg",
    mu: float = 1e-3,
    jig_weight: float = 0.7,
    jigsaw_n_classes: int = 30,
    bias_whole_image: float = 0.9,
    meta_step_size: float = 1e-3,
    clip_value: float = 1.0,
    min_scale: float = 0.8,
    max_scale: float = 1.0,
    transform_on_device: bool = True,
) -> Callable:
    """Build one client-local SGD step.

    Returned signature:
      step(state, server_params, batch, rng, step_idx) -> (state, StepMetrics)

    ``batch`` is a dict with "images" (raw [0,1] NHWC), "labels", and "mask"
    (per-example validity — padded rows carry 0); FedDG additionally needs
    "amp_bank" (K, C, H, W) passed via the batch dict.

    All branches are selected at trace time (dg_method/mode are static).
    """
    dg = dg_method.lower()
    is_prox = mode.lower() == "fedprox"

    def prepare(images, rng):
        if not transform_on_device:
            return images
        return train_transform(rng, images, image_size, min_scale, max_scale)

    def loss_fn(params, state, server_params, batch, rng, step_idx):
        k_tf, k_dg = jax.random.split(rng)
        mask = batch["mask"].astype(jnp.float32)
        labels = batch["labels"]

        if dg == "jigsaw":
            # the reference's model consumes the permuted grid image for BOTH
            # heads (fed_run.py:58: class_logit, jig_logit = model(img))
            jig_images, jig_labels = jigsaw_batch(
                k_dg, batch["images"], jigsaw_n_classes, bias_whole_image
            )
            # the grid image goes through the same train transform
            jig_images = prepare(jig_images, k_tf)
            (logits, jig_logits), new_stats = _apply(
                model, {**state, "params": params}, jig_images, train=True
            )
            ce = _masked_mean(cross_entropy(logits, labels), mask)
            jig_ce = _masked_mean(cross_entropy(jig_logits, jig_labels), mask)
            loss = ce + jig_weight * jig_ce
            metrics_logits = logits
            jig_corr = jnp.sum(
                (jnp.argmax(jig_logits, 1) == jig_labels).astype(jnp.float32) * mask
            )
        elif dg == "rsc":
            images = prepare(batch["images"], k_tf)
            logits, new_stats = _rsc_logits(
                model, state, params, images, labels, n_classes,
                mask_valid=mask,
            )
            loss = _masked_mean(cross_entropy(logits, labels), mask)
            metrics_logits = logits
            jig_corr = jnp.zeros(())
        elif dg == "feddg":
            images = eval_transform(batch["images"], image_size)
            freq = feddg_batch_augment(k_dg, batch["images"], batch["amp_bank"], L=0.0)
            freq = eval_transform(freq, image_size)

            def inner_loss(p):
                lg, st = _apply(model, {**state, "params": p}, images, train=True)
                return _masked_mean(cross_entropy(lg, labels), mask), (lg, st)

            (l_inner, (logits, new_stats)), grads = jax.value_and_grad(
                inner_loss, has_aux=True
            )(params)
            grads = jax.lax.stop_gradient(grads)  # FOMAML (fed_run.py:110)
            fast = jax.tree.map(
                lambda p, g: p
                - meta_step_size * jnp.clip(g, -clip_value, clip_value),
                params,
                grads,
            )
            lg_out, _ = _apply(model, {**state, "params": fast}, freq, train=True)
            l_outer = _masked_mean(cross_entropy(lg_out, labels), mask)
            loss = l_inner + l_outer
            metrics_logits = logits
            jig_corr = jnp.zeros(())
        else:  # no_DG / mixstyle (mixstyle lives inside the model)
            images = prepare(batch["images"], k_tf)
            rngs = {"mixstyle": k_dg} if dg == "mixstyle" else None
            logits, new_stats = _apply(
                model, {**state, "params": params}, images, train=True, rngs=rngs
            )
            loss = _masked_mean(cross_entropy(logits, labels), mask)
            metrics_logits = logits
            jig_corr = jnp.zeros(())

        if is_prox:
            # reference applies the proximal term from local step 1 on
            # (fed_run.py:163-165)
            prox = jnp.where(step_idx > 0, (mu / 2.0) * _prox_term(params, server_params), 0.0)
            loss = loss + prox

        correct = jnp.sum(
            (jnp.argmax(metrics_logits, 1) == labels).astype(jnp.float32) * mask
        )
        return loss, (new_stats, correct, jig_corr)

    def step(state: State, server_params, batch, rng, step_idx):
        (loss, (new_stats, correct, jig_corr)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"], state, server_params, batch, rng, step_idx)
        # padded batches (mask all-zero) must be a full no-op: no param
        # update AND no batch_stats update (the forward pass ran on a
        # duplicated padding batch, so its stats must be discarded too)
        any_valid = (jnp.sum(batch["mask"]) > 0).astype(jnp.float32)
        new_params = jax.tree.map(
            lambda p, g: p - lr * any_valid * g.astype(p.dtype), state["params"], grads
        )
        new_stats = jax.tree.map(
            lambda old, new: (
                any_valid * new.astype(jnp.float32)
                + (1.0 - any_valid) * old.astype(jnp.float32)
            ).astype(old.dtype),
            state.get("batch_stats", {}),
            new_stats,
        )
        new_state = {"params": new_params, "batch_stats": new_stats}
        metrics = StepMetrics(
            loss=loss * any_valid,
            correct=correct,
            count=jnp.sum(batch["mask"].astype(jnp.float32)),
            jig_correct=jig_corr,
            active=any_valid,
        )
        return new_state, metrics

    return step


def make_eval_step(model, *, image_size: int, transform_on_device: bool = True):
    """Eval step: resize+normalize -> logits -> (loss_sum, correct, count).
    Matches `test()` (fed_run.py:214-259)."""

    def step(state: State, batch) -> Tuple[Array, Array, Array]:
        images = (
            eval_transform(batch["images"], image_size)
            if transform_on_device
            else batch["images"]
        )
        logits, _ = _apply(model, state, images, train=False)
        if isinstance(logits, tuple):  # jigsaw model: class head only
            logits = logits[0]
        mask = batch["mask"].astype(jnp.float32)
        ce = cross_entropy(logits, batch["labels"])
        correct = jnp.sum(
            (jnp.argmax(logits, 1) == batch["labels"]).astype(jnp.float32) * mask
        )
        return jnp.sum(ce * mask), correct, jnp.sum(mask)

    return step
