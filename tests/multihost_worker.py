"""Worker process for tests/test_multihost.py.

Joins a 2-process jax.distributed CPU cluster (2 virtual devices each),
builds the global (client, data) federated mesh with the client axis on the
process boundary — the DCN layout of parallel/multihost.py — runs one
vmapped local step for its own client, aggregates with a cross-process
weighted reduction, and prints a digest of the server params. The parent
asserts both processes print identical digests.

Usage: python tests/multihost_worker.py <port> <process_id> <num_processes>
"""
import os
import sys

PORT, PID, NPROCS = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def main() -> None:
    from ccst_tpu.federated.train_ops import make_train_step
    from ccst_tpu.models.classifiers import get_network
    from ccst_tpu.parallel import multihost
    from ccst_tpu.parallel.fed_mesh import ParallelFedTrainer

    multihost.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROCS,
        process_id=PID,
    )
    assert jax.process_count() == NPROCS
    n_clients = NPROCS  # one client per host: the client axis rides DCN
    mesh = multihost.global_fed_mesh(n_clients, 2)

    model = get_network("resnet4", classes=4)
    x0 = jnp.ones((1, 36, 36, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    local_state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    # every process owns exactly its own clients' slice of the stacked state
    mine = list(multihost.process_clients(n_clients))
    assert mine == [PID]
    stacked = jax.tree.map(lambda v: np.asarray(v)[None], local_state)
    states = multihost.shard_stacked_tree(stacked, mesh, "client")

    step = make_train_step(model, n_classes=4, image_size=36, lr=0.05)
    trainer = ParallelFedTrainer(
        step, "fedavg", jnp.full((n_clients,), 1.0 / n_clients), mesh=mesh
    )
    server_params = multihost.replicate_tree(
        jax.tree.map(np.asarray, local_state["params"]), mesh
    )

    rng = np.random.default_rng(100 + PID)  # per-host data, like a real client
    batch_local = {
        "images": rng.random((1, 4, 36, 36, 3), np.float32),
        "labels": rng.integers(0, 4, (1, 4)).astype(np.int32),
        "mask": np.ones((1, 4), np.float32),
    }
    batch = {
        k: multihost.from_process_local(
            mesh, P("client", "data") if v.ndim >= 2 else P("client"), v
        )
        for k, v in batch_local.items()
    }
    rngs = multihost.replicate_tree(
        np.asarray(jax.random.split(jax.random.PRNGKey(1), n_clients)), mesh
    )
    new_states, metrics = trainer.step(
        states, server_params, batch, rngs, jnp.asarray(0)
    )
    sp, ss, ncp, ncs = trainer.communicate(
        new_states["params"], new_states["batch_stats"]
    )
    # metrics are sharded per-client across processes; force the aggregated
    # server params to a replicated layout (an all-gather over DCN), then
    # every host can read them directly
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding

    sp = jax.jit(
        lambda t: t, out_shardings=NamedSharding(mesh, P())
    )(sp)
    sp_host = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), sp)
    loss_host = multihost_utils.process_allgather(metrics.loss, tiled=True)
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, sp_host))
    digest = float(sum(np.float64(np.abs(l)).sum() for l in leaves))
    loss = float(np.asarray(loss_host).sum())
    assert np.isfinite(loss)
    print(f"DIGEST {digest:.10e}", flush=True)


if __name__ == "__main__":
    main()
