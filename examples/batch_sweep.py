"""Batched + mesh-sharded LCQP sweep — the capability the TPU build adds on
top of the reference (which is single-problem, single-threaded; SURVEY.md §2).

Solves a fleet of randomized warm-up-class LCQPs, vmapped into one lockstep
program and sharded over every available device.

Usage: python examples/batch_sweep.py [batch_size]
"""

import sys
import time

import jax
import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu.parallel import fleet_summary, make_mesh, solve_batch_sharded
from lcqpow_tpu.problems import random_lcqp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    problems = [random_lcqp(rng, nV=8, nC=2, nComp=2) for _ in range(B)]
    batch = lt.stack_lcqps(problems)

    mesh = make_mesh()
    print(f"devices: {mesh.devices.ravel().tolist()}")

    opts = lt.Options(print_level=lt.PrintLevel.NONE)
    t0 = time.time()
    sol = solve_batch_sharded(batch, opts, mesh=mesh)
    jax.block_until_ready(sol.x)
    dt = time.time() - t0
    print(f"first call (incl. compile): {dt:.2f}s")

    t0 = time.time()
    sol = solve_batch_sharded(batch, opts, mesh=mesh)
    jax.block_until_ready(sol.x)
    dt = time.time() - t0

    print(f"steady state: {B} solves in {dt*1e3:.1f} ms "
          f"-> {B/dt:.0f} solves/s")
    print(fleet_summary(sol))


if __name__ == "__main__":
    main()
