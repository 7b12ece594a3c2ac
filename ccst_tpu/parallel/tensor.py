"""Parameter (tensor) sharding over a ``model`` mesh axis via GSPMD.

The reference's only intra-model parallelism is ModelParallelResNet50 —
a hand-written two-GPU pipeline split with an explicit ``.to('cuda:1')``
hop in forward (nets/resnet.py:235-260), disabled in its factory. The
TPU-native equivalent needs no model surgery at all: parameters get
``NamedSharding`` annotations over a ``model`` mesh axis and XLA/GSPMD
partitions every matmul/conv and inserts the collectives.

Policy (``shard_params``): shard the OUTPUT-channel dimension of conv
kernels and the output dimension of dense kernels when divisible by the
axis size and large enough to be worth it; replicate biases, norm params
and everything small. Activations stay replicated — for CNN classifiers
the activation-allgather cost is what the channel-split avoids until the
channel dims are large, which is exactly where this triggers.

Demonstrated end-to-end (ResNet-50 forward + grads sharded over a
(data=2, model=4) mesh matching the unsharded result) in
tests/test_parallel.py and exercised by ``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Tree = Any


def make_dp_tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def param_spec(path, leaf, axis_size: int, min_dim: int = 128) -> P:
    """PartitionSpec for one parameter leaf under the channel-split policy."""
    if leaf.ndim >= 2 and leaf.shape[-1] % axis_size == 0 and leaf.shape[-1] >= min_dim:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params(
    params: Tree, mesh: Mesh, min_dim: int = 128
) -> Tree:
    """Place every parameter according to :func:`param_spec` (output-channel
    split over the ``model`` axis, small/1D leaves replicated)."""
    axis_size = mesh.shape["model"]

    def place(path, leaf):
        spec = param_spec(path, leaf, axis_size, min_dim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch: Tree, mesh: Mesh) -> Tree:
    """Batch-dim data parallelism over the ``data`` axis."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data") if x.ndim >= 1 else P())
        ),
        batch,
    )
