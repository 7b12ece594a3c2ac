"""Tent: test-time entropy minimization (Wang et al., ICLR 2021).

The reference ships tent *call sites* (federated/fed_run.py:261-347,597-623)
but the library import is commented out, so the paths crash (SURVEY.md
§6b.6). This is a working implementation: at test time only the BatchNorm
affine parameters (scale/bias) adapt, by minimizing the mean prediction
entropy, with BN running in batch-statistics mode (train-mode BN, stats not
persisted) — the standard Tent recipe.

Two drivers mirror the reference's entry points:
  - ``tent_test``: epochs over the whole test set, adapting each batch, then
    a frozen re-evaluation per epoch (fed_run.py:261-313);
  - ``tent_test_on_the_fly``: K adaptation steps per batch, predict, move on
    (fed_run.py:315-347).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ccst_tpu.federated.aggregate import is_bn_path
from ccst_tpu.ops.image import eval_transform

Array = jax.Array
State = Dict[str, Any]


def entropy_loss(logits: Array, mask: Array) -> Array:
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    ent = -jnp.sum(p * logp, axis=1)
    return jnp.sum(ent * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bn_param_mask(params) -> Any:
    """1.0 on BN scale/bias leaves, 0.0 elsewhere — the set Tent adapts."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.asarray(1.0 if is_bn_path(path) else 0.0, leaf.dtype),
        params,
    )


def make_tent_step(model, image_size: int, lr: float = 1e-3):
    """One adaptation step: train-mode forward (batch-stat BN), entropy
    gradient on BN affine params only."""

    def step(state: State, batch) -> Tuple[State, Array, Array]:
        mask = batch["mask"].astype(jnp.float32)
        images = eval_transform(batch["images"], image_size)

        def loss_fn(params):
            variables = {"params": params}
            if state.get("batch_stats"):
                variables["batch_stats"] = state["batch_stats"]
                logits, _ = model.apply(
                    variables, images, train=True, mutable=["batch_stats"]
                )
            else:
                logits = model.apply(variables, images, train=True)
            if isinstance(logits, tuple):
                logits = logits[0]
            return entropy_loss(logits, mask), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        gate = bn_param_mask(state["params"])
        new_params = jax.tree.map(
            lambda p, g, m: p - lr * m * g.astype(p.dtype),
            state["params"], grads, gate,
        )
        correct = jnp.sum(
            (jnp.argmax(logits, 1) == batch["labels"]).astype(jnp.float32) * mask
        )
        return {**state, "params": new_params}, correct, jnp.sum(mask)

    return step


def tent_test(
    model, state: State, loader, image_size: int, lr: float = 1e-3,
    epochs: int = 10, logger=None,
) -> Tuple[State, float]:
    """Adapt over the test stream for several epochs; returns (adapted state,
    final frozen accuracy)."""
    from ccst_tpu.federated.runtime import _batch_dict
    from ccst_tpu.federated.train_ops import make_eval_step

    step = jax.jit(make_tent_step(model, image_size, lr))
    eval_step = jax.jit(make_eval_step(model, image_size=image_size))
    acc = 0.0
    for epoch in range(epochs):
        run_c = run_n = 0.0
        for batch in loader:
            state, c, n = step(state, _batch_dict(batch))
            run_c += float(c)
            run_n += float(n)
        frozen_c = frozen_n = 0.0
        for batch in loader:
            _, c, n = eval_step(state, _batch_dict(batch))
            frozen_c += float(c)
            frozen_n += float(n)
        acc = frozen_c / max(frozen_n, 1.0)
        if logger is not None:
            logger.log(
                "tent_epoch",
                epoch=epoch,
                running_acc=run_c / max(run_n, 1.0),
                frozen_acc=acc,
            )
    return state, acc


def tent_test_on_the_fly(
    model, state: State, loader, image_size: int, lr: float = 1e-3,
    steps_per_batch: int = 10, logger=None,
) -> float:
    """Adapt K steps on each batch then score it (fed_run.py:315-347)."""
    from ccst_tpu.federated.runtime import _batch_dict

    step = jax.jit(make_tent_step(model, image_size, lr))
    correct = count = 0.0
    for batch in loader:
        bd = _batch_dict(batch)
        c = n = jnp.zeros(())
        for _ in range(steps_per_batch):
            state, c, n = step(state, bd)
        correct += float(c)
        count += float(n)
    acc = correct / max(count, 1.0)
    if logger is not None:
        logger.log("tent_on_the_fly", acc=acc)
    return acc
