"""Multi-host (pod-slice) execution helpers.

The reference is single-process (SURVEY.md §2: no parallelism of any kind);
scaling across hosts is new TPU-native capability.  The model is standard
JAX multi-controller SPMD: every host runs the same program,
``jax.distributed.initialize`` wires the processes into one global runtime,
and the instance batch is a single global array sharded over the global
``"batch"`` mesh axis — each host feeds its local shard, XLA runs the
embarrassingly parallel solve with zero cross-host communication, and only
fleet-level reductions (:func:`lcqpow_tpu.parallel.fleet_summary`) touch
ICI/DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from .sharding import BATCH_AXIS, make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    or the cloud-TPU auto-detection built into jax).  Returns True if a
    multi-process runtime is active after the call; single-process setups
    are a silent no-op so the same script runs everywhere.
    """
    if jax.process_count() > 1:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None \
            and "TPU_WORKER_HOSTNAMES" not in os.environ:
        return False  # single process, nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError):
        # Already initialized (or single-process auto-detection).
        pass
    return jax.process_count() > 1


def host_local_batch_to_global(batch, mesh=None):
    """Assemble a global batch from per-host local shards.

    Every host passes its *local* slice of the fleet (equal sizes across
    hosts); the result is one global array batch-sharded over the mesh,
    ready for :func:`lcqpow_tpu.parallel.solve_batch_sharded`.  On a single
    host this reduces to :func:`lcqpow_tpu.parallel.shard_batch`.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = make_mesh()
    sharding = NamedSharding(mesh, P(BATCH_AXIS))

    def place(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree.map(place, batch)
