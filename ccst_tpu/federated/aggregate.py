"""Federated aggregation over stacked client pytrees.

TPU-native rebuild of the reference's ``communication()``
(federated/fed_run.py:385-455). Instead of looping over torch state dicts on
CPU, clients are a *stacked* pytree (leading axis = client) and aggregation
is a weighted reduction over that axis — pure jnp, so under jit with the
client axis sharded over a mesh, XLA lowers it to a weighted all-reduce on
ICI (SURVEY.md §2.8).

Modes (fed_run.py):
  - ``fedavg`` / ``fedprox``: weighted-average every leaf (params and BN
    batch_stats), broadcast back to all clients (:400-414).
  - ``fedbn``: average everything into the server, but broadcast only
    non-BN *params* back; clients keep local BN scale/bias and their own
    batch_stats (:388-399).
  - ``adafea``: like fedavg, plus the AdaFea BN3 coupling — after averaging,
    each client's ``bn3`` scale := sqrt(avg running_var + eps) and bias :=
    avg running_mean (:415-453). NOTE: in the reference this branch is
    unreachable (the fedavg elif at :400 is always truthy, SURVEY.md §6b.3);
    here it is implemented as written.

flax note: torch's ``num_batches_tracked`` has no flax equivalent (momentum
EMA), so the reference's copy-from-client-0 special case vanishes.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Tree = Any


def is_bn_path(path: Tuple) -> bool:
    """True if a params-tree path belongs to a BatchNorm module.

    Matches explicit names ('bn1', 'bn2', ...) and flax auto-names
    ('BatchNorm_0'); the reference's rule is the substring 'bn' in torch
    state-dict keys (fed_run.py:398).
    """
    for p in path:
        name = getattr(p, "key", getattr(p, "name", str(p)))
        if (
            name.startswith("bn")
            or name.startswith("BatchNorm")
            or name.startswith("TorchBatchNorm")
        ):
            return True
    return False


def _wavg(stacked: Tree, weights: Array) -> Tree:
    """Weighted average over the leading (client) axis of every leaf."""
    w = jnp.asarray(weights, jnp.float32)

    def avg(leaf):
        wf = w.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.sum(leaf.astype(jnp.float32) * wf, axis=0).astype(leaf.dtype)

    return jax.tree.map(avg, stacked)


def _broadcast(avg: Tree, like_stacked: Tree) -> Tree:
    n = jax.tree.leaves(like_stacked)[0].shape[0]
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), avg
    )


def _select_by_path(pred, if_true: Tree, if_false: Tree) -> Tree:
    return jax.tree_util.tree_map_with_path(
        lambda path, a, b: a if pred(path) else b, if_true, if_false
    )


def aggregate(
    mode: str,
    client_params: Tree,        # stacked over axis 0
    client_stats: Tree,         # stacked batch_stats (may be empty dict)
    weights: Array,             # (n_clients,)
):
    """Returns (server_params, server_stats, new_client_params, new_client_stats)."""
    mode = mode.lower()
    server_params = _wavg(client_params, weights)
    server_stats = _wavg(client_stats, weights) if client_stats else {}

    if mode in ("fedavg", "fedprox", "deepall"):
        new_cp = _broadcast(server_params, client_params)
        new_cs = _broadcast(server_stats, client_stats) if client_stats else client_stats
        return server_params, server_stats, new_cp, new_cs

    if mode == "fedbn":
        bcast = _broadcast(server_params, client_params)
        new_cp = _select_by_path(is_bn_path, client_params, bcast)
        return server_params, server_stats, new_cp, client_stats

    if mode == "adafea":
        new_cp = _broadcast(server_params, client_params)
        new_cs = _broadcast(server_stats, client_stats) if client_stats else client_stats
        if client_stats:
            new_cp = _adafea_couple(new_cp, server_stats)
        return server_params, server_stats, new_cp, new_cs

    raise ValueError(f"unknown aggregation mode {mode!r}")


def _adafea_couple(client_params: Tree, server_stats: Tree) -> Tree:
    """AdaFea: for modules named 'bn3', set scale := sqrt(var+eps),
    bias := mean from the aggregated running stats (fed_run.py:430-445)."""

    def fix(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if "bn3" not in names:
            return leaf
        try:
            stats = server_stats
            for n in names[:-1]:
                stats = stats[n]
        except (KeyError, TypeError):
            return leaf
        kind = names[-1]
        if kind == "scale":
            return jnp.broadcast_to(
                jnp.sqrt(stats["var"] + 1e-5)[None], leaf.shape
            ).astype(leaf.dtype)
        if kind == "bias":
            return jnp.broadcast_to(stats["mean"][None], leaf.shape).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, client_params)


def stack_clients(trees: Sequence[Tree]) -> Tree:
    """[tree, tree, ...] -> stacked tree with leading client axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def unstack_clients(stacked: Tree, n: int) -> list:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


def rebroadcast_bn_to_server(client_stats: Tree, weights: Array) -> Tree:
    """FedBN evaluation helper: average client BN state into the server for
    testing (`test_fedbn`, fed_run.py:350-381)."""
    return _wavg(client_stats, weights) if client_stats else {}
