"""Multi-host (DCN) federation: the reference's DDP template, TPU-native.

The reference's only real distributed training is the NCCL
DistributedDataParallel loop (reconstruct_img/imagenet_reconstruct.py:141-175:
``mp.spawn`` + ``dist.init_process_group('nccl')`` + DistributedSampler), and
SURVEY.md §2.8/§5.8 maps it to ``jax.distributed.initialize`` with a global
mesh: collectives ride ICI *within* a slice and DCN *across* hosts, inserted
by XLA from sharding annotations — there is no rank-conditional code.

Layout doctrine: put the **client** axis on the process (DCN) boundary and
the **data** axis on intra-host devices (ICI), so the only cross-host
traffic is the once-per-round FedAvg all-reduce (a weighted ``psum`` over
clients) while per-batch data parallelism stays on fast links.

Tested for real on multi-process CPU (tests/test_multihost.py spawns two
jax.distributed processes with Gloo cross-process collectives and checks the
aggregated server params agree bitwise on every host).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccst_tpu.parallel.fed_mesh import make_fed_mesh

Tree = Any


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or form) a jax.distributed cluster.

    Arguments default to the ``CCST_COORDINATOR`` / ``CCST_NUM_PROCS`` /
    ``CCST_PROC_ID`` environment variables so launchers can fan processes
    out with plain env plumbing (the reference passes rank/world_size through
    ``mp.spawn`` args, imagenet_reconstruct.py:153-175). On TPU pods all
    three are auto-detected and may stay None.
    """
    coordinator_address = coordinator_address or os.environ.get("CCST_COORDINATOR")
    if num_processes is None and "CCST_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["CCST_NUM_PROCS"])
    if process_id is None and "CCST_PROC_ID" in os.environ:
        process_id = int(os.environ["CCST_PROC_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_fed_mesh(n_client_shards: int, n_data_shards: int) -> Mesh:
    """(client, data) mesh over ALL processes' devices. ``jax.devices()``
    orders devices process-major, so with ``n_client_shards`` equal to (a
    multiple of) the process count, the client axis lands on the process/DCN
    boundary and the data axis stays host-local."""
    return make_fed_mesh(n_client_shards, n_data_shards, devices=jax.devices())


def from_process_local(mesh: Mesh, spec: P, local: np.ndarray) -> jax.Array:
    """Assemble a global array from this process's shard (the moral
    equivalent of DistributedSampler: each host materializes only its own
    clients' data)."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local)
    )


def shard_stacked_tree(tree: Tree, mesh: Mesh, axis: str = "client") -> Tree:
    """Shard a host-local stacked pytree (leading client axis) into global
    arrays; every process must pass its own clients' slice."""
    return jax.tree.map(
        lambda x: from_process_local(mesh, P(axis), np.asarray(x)), tree
    )


def replicate_tree(tree: Tree, mesh: Mesh) -> Tree:
    """Make a host-local tree (identical on every process) globally
    addressable and replicated."""
    return jax.tree.map(
        lambda x: from_process_local(mesh, P(), np.asarray(x)), tree
    )


def process_clients(n_clients: int) -> Sequence[int]:
    """Which stacked-client indices this process owns (contiguous blocks,
    matching the process-major device order of ``global_fed_mesh``)."""
    per = n_clients // jax.process_count()
    start = jax.process_index() * per
    return range(start, start + per)
