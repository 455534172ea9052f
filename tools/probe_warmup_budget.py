"""Sweep the warm-up fleet's first-pass corrector budget x escalation:
the corrector while_loop is lockstep, so ONE stubborn lane makes all 4096
lanes pay the full 25-pass budget (measured: corrector 102 ms of the 152 ms
total).  A small budget + bucket escalation should certify the same lanes
at much higher throughput.  Run on chip."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu.mixed import solve_batch_mixed
from lcqpow_tpu.problems import random_lcqp

B = int(os.environ.get("B", "4096"))
rng = np.random.default_rng(0)
problems = [random_lcqp(rng, nV=8, nC=2, nComp=2, as_numpy=True)
            for _ in range(64)]
base = jax.tree.map(lambda *xs: np.stack(xs), *problems)
reps_needed = -(-B // 64)
batch = jax.tree.map(
    lambda x: np.tile(x, (reps_needed,) + (1,) * (x.ndim - 1))[:B], base)
batch = dataclasses.replace(batch, g=batch.g + 0.01 * rng.normal(size=(B, 8)))
jb = jax.tree.map(jnp.asarray, batch)
opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200)

for budget, esc in [(25, 0), (8, 0), (8, 1), (6, 1), (12, 1)]:
    fn = lambda: solve_batch_mixed(jb, opts, key=jax.random.PRNGKey(1),
                                   n_corrector_iters=budget, escalate=esc)
    t0 = time.time()
    sol = fn()
    _ = int(np.asarray(sol.ret[0]))
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        sol = fn()
        _ = int(np.asarray(sol.ret[0]))
        times.append(time.time() - t0)
    t = min(times)
    ok = int((np.asarray(sol.ret) == 0).sum())
    print(f"budget={budget:3d} esc={esc}: first {tc:6.1f}s  warm {t*1e3:7.1f} ms "
          f"certified {ok}/{B}  -> {ok/t:8.0f} solves/s", flush=True)
