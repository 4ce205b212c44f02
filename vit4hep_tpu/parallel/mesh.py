"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP stack (``main.py:22-26``, ``base_experiment.py:161-167``).

Instead of one process per accelerator with explicit process groups, a single
process owns all local devices and SPMD-partitions every jitted program over a
``jax.sharding.Mesh``. Gradient all-reduce is emitted by the XLA partitioner;
there is no DDP analogue to manage.

The mesh is 2-D (``data``, ``model``) from day one so tensor/sequence sharding
can be added without API changes (SURVEY.md section 2.2); all shipped models use
``model=1`` (pure data parallelism, matching the reference's capability).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(num_devices: int | None = None, model_parallel: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays on the mesh, batch-sharded along ``data``.

    Multi-process: every process holds the SAME full host batch (identical
    seed => identical loader streams), and each assembles the global array
    from its own contiguous row chunk via
    ``make_array_from_process_local_data`` — a purely LOCAL operation. A
    plain ``device_put`` onto a non-addressable sharding instead runs a
    cross-process ``process_allgather`` equality check per batch, which is
    both a bandwidth tax and a deadlock when issued from the prefetch
    thread while the main thread runs train-step collectives (found by
    ``tests/test_distributed_e2e.py``). Contiguous-chunk ownership holds
    because the mesh grid is ``jax.devices()`` reshaped data-major and
    ``jax.devices()`` orders process 0's devices first.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    pc, pi = jax.process_count(), jax.process_index()

    def put(x):
        n = x.shape[0]
        if n % pc:
            raise ValueError(
                f"batch axis ({n}) must divide process count ({pc})")
        chunk = n // pc
        return jax.make_array_from_process_local_data(
            sharding, x[pi * chunk:(pi + 1) * chunk], global_shape=x.shape)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Place a pytree (params, opt state) fully replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_state(tree, mesh: Mesh):
    """Place a train-state pytree on the mesh: tensor-parallel sharding over
    the ``model`` axis where the parameter path matches a transformer matmul
    (parallel/sharding_rules.py), replicated otherwise. With model=1 this
    degrades to :func:`replicate`."""
    if mesh.shape[MODEL_AXIS] == 1:
        return replicate(tree, mesh)
    from vit4hep_tpu.parallel.sharding_rules import shard_tree

    return shard_tree(tree, mesh)
