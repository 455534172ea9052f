"""Sweep the corrector pass budget at batch 4096: certified count vs time.

The corrector's lockstep while_loop runs until the WORST lane finishes, so
1-2 straggler lanes can force the whole batch through the full 25-pass
budget.  This measures the knee of certified-throughput vs budget.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses

import jax.numpy as jnp
import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu.mixed import solve_mixed
from lcqpow_tpu.problems import random_lcqp


def log(*a):
    print(*a, flush=True)


B = int(os.environ.get("B", "4096"))
rng = np.random.default_rng(0)
problems = [random_lcqp(rng, nV=8, nC=2, nComp=2, as_numpy=True)
            for _ in range(64)]
base = jax.tree.map(lambda *xs: np.stack(xs), *problems)
reps_needed = -(-B // 64)
batch = jax.tree.map(
    lambda x: np.tile(x, (reps_needed,) + (1,) * (x.ndim - 1))[:B], base)
batch = dataclasses.replace(batch, g=batch.g + 0.01 * rng.normal(size=(B, 8)))
batch = jax.tree.map(jnp.asarray, batch)
keys = jax.random.split(jax.random.PRNGKey(1), B)

opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200)

results = []  # keep handles; readback after all timing
for budget in (25, 12, 8, 6, 4, 3, 2):
    fn = jax.jit(jax.vmap(
        lambda d, k: solve_mixed(d, opts, key=k, n_corrector_iters=budget),
        in_axes=(0, 0)))
    t0 = time.time()
    sol = fn(batch, keys)
    jax.block_until_ready(sol.x)
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        sol = fn(batch, keys)
        jax.block_until_ready(sol.x)
        times.append(time.time() - t0)
    results.append((budget, tc, min(times), sol))
    log(f"budget {budget:3d}: compile {tc:.1f}s best {min(times)*1e3:.1f} ms")

log("--- readbacks ---")
for budget, tc, t, sol in results:
    n_ok = int((np.asarray(sol.ret) == 0).sum())
    log(f"budget {budget:3d}: certified {n_ok}/{B}  best {t*1e3:.1f} ms  "
        f"-> {n_ok/t:.0f} certified solves/s")
