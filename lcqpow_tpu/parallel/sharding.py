"""Multi-chip / multi-host scaling.

The reference has no parallelism of any kind (SURVEY.md §2: no threads, no
MPI/NCCL).  The TPU framework introduces it as new capability: a batch of
LCQP instances is sharded over a ``jax.sharding.Mesh`` along a ``"batch"``
axis, each instance solving independently on its shard's chip — collectives
(``psum``-style reductions, inserted automatically by XLA from the sharding
annotations) are needed only for fleet-level bookkeeping (convergence counts,
solved fractions), so communication rides ICI and rounds to zero.

Works identically on one chip, a multi-chip slice, or a multi-host pod
(give ``jax.distributed``-initialized global devices to :func:`make_mesh`);
tests exercise it on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data import LCQPData
from ..options import Options
from ..solver import Solution
from ..batch import solve_batch
from ..types import ReturnValue

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``"batch"``.

    Axes are ``Auto`` (classic GSPMD): input shardings act as placement
    hints and XLA propagates them through the whole batched program — the
    right model for an embarrassingly parallel instance sweep.
    """
    devices = list(devices) if devices is not None else jax.devices()
    return jax.make_mesh((len(devices),), (BATCH_AXIS,),
                         axis_types=(jax.sharding.AxisType.Auto,),
                         devices=devices)


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree so its leading axis is split across the mesh.
    The batch size must be divisible by the mesh size (pad with
    :func:`lcqpow_tpu.pad_lcqp`/repeat if needed)."""
    sharding = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), tree)


def solve_batch_sharded(data: LCQPData, options: Options = Options(),
                        mesh: Optional[Mesh] = None,
                        key: Optional[jax.Array] = None) -> Solution:
    """Shard the instance batch over the mesh and solve.

    Embarrassingly parallel: XLA compiles the vmapped driver once per shard
    shape; no cross-device communication occurs during the solve.  The
    returned :class:`Solution` leaves keep their distributed sharding.
    """
    if mesh is None:
        mesh = make_mesh()
    data = shard_batch(data, mesh)
    if key is not None:
        key = jax.device_put(key, NamedSharding(mesh, P()))
    return solve_batch(data, options, key=key)


def fleet_summary(sol: Solution) -> dict:
    """Cross-device reduction of fleet statistics (the only collective the
    workload needs — mirrors BASELINE.md's convergence bookkeeping)."""
    ok = (sol.ret == int(ReturnValue.SUCCESSFUL_RETURN))

    @jax.jit
    def _reduce(ok, iters, rho):
        return (jnp.sum(ok), jnp.mean(iters.astype(jnp.float32)),
                jnp.max(rho))

    n_ok, mean_iters, max_rho = _reduce(ok, sol.stats.iter_total,
                                        sol.stats.rho_opt)
    out = {
        "solved": int(n_ok),
        "total": int(ok.shape[0]),
        "mean_iterations": float(mean_iters),
        "max_rho": float(max_rho),
    }
    # Mixed-pipeline stage breakdown (where did lanes certify?): stage 1 =
    # predictor point certified as-is, 2 = corrector steps needed, 2+k =
    # escalation round k (see Stats.certified_stage).  Reduced by a jitted
    # collective like the scalars above — per-lane np.asarray gathers would
    # fail on multi-host fleets whose lanes live on non-addressable devices.
    if sol.stats.certified_stage is not None:
        # Stages are tiny ints (0..2+escalation rounds), but the escalation
        # round count is caller-controlled and so unbounded; stages beyond
        # the histogram clip into a final "other" bucket so the per-stage
        # counts always total the fleet size (ADVICE r3: codes >= 15 used
        # to vanish silently).
        _N_STAGES = 16

        @jax.jit
        def _stage_reduce(stage, steps):
            clipped = jnp.minimum(stage, _N_STAGES - 1)
            counts = jnp.sum(
                clipped[:, None] == jnp.arange(_N_STAGES)[None, :], axis=0)
            return counts, jnp.mean(steps.astype(jnp.float32))

        counts, mean_steps = _stage_reduce(sol.stats.certified_stage,
                                           sol.stats.corrector_steps)
        counts = [int(c) for c in counts]
        out["certified_by_stage"] = {
            (s if s < _N_STAGES - 1 else f"{_N_STAGES - 1}+"): c
            for s, c in enumerate(counts) if c}
        out["mean_corrector_steps"] = float(mean_steps)
    return out
