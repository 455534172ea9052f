"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax

import lcqpow_tpu as lt
from lcqpow_tpu.parallel import (fleet_summary, make_mesh, shard_batch,
                                 solve_batch_sharded)
from lcqpow_tpu.problems import warm_up, random_lcqp

OPTS = lt.Options(print_level=lt.PrintLevel.NONE)


def test_sharded_solve_matches_unsharded(eight_devices):
    B = 16
    problems = [random_lcqp(s, nV=6, nC=2, nComp=2) for s in range(B)]
    batched = lt.stack_lcqps(problems)

    mesh = make_mesh(eight_devices)
    ssol = solve_batch_sharded(batched, OPTS, mesh=mesh)
    usol = lt.solve_batch(batched, OPTS)

    np.testing.assert_allclose(np.asarray(ssol.x), np.asarray(usol.x),
                               atol=1e-9)
    np.testing.assert_array_equal(np.asarray(ssol.ret), np.asarray(usol.ret))
    # Results actually live distributed across the mesh.
    assert len(ssol.x.sharding.device_set) == 8


def test_fleet_summary(eight_devices):
    B = 8
    batched = lt.stack_lcqps([warm_up()] * B)
    mesh = make_mesh(eight_devices)
    sol = solve_batch_sharded(batched, OPTS, mesh=mesh)
    s = fleet_summary(sol)
    assert s["solved"] == B
    assert s["total"] == B
    assert s["mean_iterations"] > 0


def test_shard_batch_placement(eight_devices):
    mesh = make_mesh(eight_devices)
    batched = lt.stack_lcqps([warm_up()] * 8)
    placed = shard_batch(batched, mesh)
    assert len(placed.Q.sharding.device_set) == 8
