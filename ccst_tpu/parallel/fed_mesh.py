"""Client-parallel federated training over a device mesh.

The reference simulates federation by training clients *sequentially* in one
process (fed_run.py:663-673) and averaging state dicts on CPU (:385-455).
TPU-native redesign (SURVEY.md §2.8): clients live on a leading stacked axis,
one local step for *all* clients is a single ``vmap``ped program, and with
the stacked axis sharded over the mesh's ``client`` axis (batch dim over
``data``) XLA partitions the step so every client trains simultaneously;
aggregation is a weighted reduction over the client axis that lowers to an
all-reduce on ICI.

Works identically on one device (vmap = batched clients — already a big
throughput win over sequential simulation: one launch, C-fold larger batch
for the MXU) and on an N-device mesh via NamedSharding.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccst_tpu.federated.aggregate import aggregate

Array = jax.Array
State = Dict[str, Any]


def make_fed_mesh(
    n_client_shards: int,
    n_data_shards: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(client, data) mesh. ``n_client_shards * n_data_shards`` must cover
    the devices used."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_client_shards * n_data_shards
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_client_shards, n_data_shards)
    return Mesh(grid, ("client", "data"))


class ParallelFedTrainer:
    """Drives stacked client states through vmapped local steps + mesh
    aggregation.

    Host feeds one *stacked* batch (C, B, ...) per local step so device
    memory stays O(batch) instead of O(epoch). Clients with shorter epochs
    contribute masked (no-op) steps — semantics match per-client epochs of
    different lengths.
    """

    def __init__(
        self,
        train_step: Callable,
        mode: str,
        weights: Array,
        mesh: Optional[Mesh] = None,
    ):
        self.mode = mode
        self.weights = jnp.asarray(weights)
        self.mesh = mesh
        n = self.weights.shape[0]
        if mesh is not None:
            client_shards = mesh.shape.get("client", 1)
            if n % client_shards:
                raise ValueError(
                    f"n_clients={n} is not divisible by the mesh's client "
                    f"axis ({client_shards}); PACS/OfficeHome have 3 source "
                    f"clients — use client_shards in {{1, 3}} (e.g. "
                    f"make_fed_mesh(1, n_devices) for pure data parallelism)"
                )

        vstep = jax.vmap(train_step, in_axes=(0, None, 0, 0, None))

        def stacked_step(states, server_params, batches, rngs, step_idx):
            return vstep(states, server_params, batches, rngs, step_idx)

        def agg(client_params, client_stats, w):
            return aggregate(mode, client_params, client_stats, w)

        if mesh is not None:
            client_sharding = NamedSharding(mesh, P("client"))
            batch_sharding = NamedSharding(mesh, P("client", "data"))
            replicated = NamedSharding(mesh, P())
            self._state_shard = lambda t: jax.device_put(t, client_sharding)
            self._batch_shard = lambda t: jax.tree.map(
                lambda x: jax.device_put(
                    x, batch_sharding if x.ndim >= 2 else client_sharding
                ),
                t,
            )
            self._replicate = lambda t: jax.device_put(t, replicated)
            self.step = jax.jit(stacked_step)
            self.aggregate = jax.jit(agg)
        else:
            self._state_shard = lambda t: t
            self._batch_shard = lambda t: t
            self._replicate = lambda t: t
            self.step = jax.jit(stacked_step)
            self.aggregate = jax.jit(agg)

    def shard_states(self, stacked_states: State) -> State:
        return jax.tree.map(lambda x: self._state_shard(x), stacked_states)

    def run_epoch(
        self,
        stacked_states: State,
        server_params,
        stacked_batches: Iterator[Dict[str, Array]],
        rng: jax.Array,
    ) -> Tuple[State, Dict[str, np.ndarray]]:
        """One local epoch for all clients. ``stacked_batches`` yields dicts
        whose leaves have a leading client axis (C, B, ...)."""
        n = self.weights.shape[0]
        loss = np.zeros(n)
        correct = np.zeros(n)
        count = np.zeros(n)
        active = np.zeros(n)
        for step_idx, batch in enumerate(stacked_batches):
            rng, sub = jax.random.split(rng)
            rngs = jax.random.split(sub, n)
            batch = self._batch_shard(batch)
            stacked_states, m = self.step(
                stacked_states, server_params, batch, rngs, jnp.asarray(step_idx)
            )
            loss += np.asarray(m.loss)
            correct += np.asarray(m.correct)
            count += np.asarray(m.count)
            active += np.asarray(m.active)
        # per-client loss averages over that client's REAL steps only —
        # masked padding steps (mask all-zero, loss forced to 0) don't
        # deflate short-epoch clients' reported loss
        metrics = {
            "train_loss": loss / np.maximum(active, 1.0),
            "train_acc": correct / np.maximum(count, 1.0),
        }
        return stacked_states, metrics

    def communicate(self, stacked_params, stacked_stats):
        """Aggregate -> (server_params, server_stats, new stacked params/stats)."""
        return self.aggregate(stacked_params, stacked_stats, self.weights)


def stack_step_batches(
    client_batch_iters: List[Iterator],
    to_batch_dict: Callable,
) -> Iterator[Dict[str, Array]]:
    """Zip per-client batch iterators into stacked (C, B, ...) batch dicts,
    padding exhausted clients with zero-mask copies so every client's full
    epoch runs (clients have different dataset sizes, fed_run trains each to
    completion)."""
    iters = [iter(it) for it in client_batch_iters]
    done = [False] * len(iters)
    last: List[Optional[Dict[str, Array]]] = [None] * len(iters)
    while True:
        batches = []
        for i, it in enumerate(iters):
            if not done[i]:
                try:
                    b = to_batch_dict(next(it))
                    last[i] = b
                except StopIteration:
                    done[i] = True
            if done[i]:
                if last[i] is None:
                    raise ValueError(f"client {i} has no batches at all")
                b = {**last[i], "mask": jnp.zeros_like(last[i]["mask"])}
            batches.append(b)
        if all(done):
            return
        yield jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)
