"""Diagnose single bench-circle lanes on CPU: f64 oracle vs mixed pipeline.

Env: LANES="1,5,6" (bench fleet lane indices), MODE=mixed|f64|both
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
from lcqpow_tpu.problems import optimize_on_circle

LANES = [int(s) for s in os.environ.get("LANES", "1,5,6").split(",")]
MODE = os.environ.get("MODE", "both")
B = 128

rng = np.random.default_rng(1)
data, x0 = optimize_on_circle(100, as_numpy=True)
W = np.array([[17., -15.], [-15., 17.]])
refs = np.array([0.5, -0.6]) + 0.05 * rng.normal(size=(B, 2))
g = np.tile(np.asarray(data.g), (B, 1))
g[:, :2] = -(refs @ W.T)
x0b = np.tile(np.asarray(x0), (B, 1))
x0b[:, :2] = refs

opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200,
                  stationarity_tolerance=1e-2,
                  qp_solver=lt.QPSolver.OSQP_SPARSE)

for lane in LANES:
    d = dataclasses.replace(data, g=jnp.asarray(g[lane]))
    d = jax.tree.map(jnp.asarray, d)
    xl = jnp.asarray(x0b[lane])
    key = jax.random.split(jax.random.PRNGKey(1), B)[lane]
    print(f"--- lane {lane}: ref target {refs[lane]}", flush=True)
    if MODE in ("f64", "both"):
        t0 = time.time()
        s = lt.solve(d, opts, x0=xl, key=key)
        print(f"  f64:   ret={int(s.ret)} x2={np.asarray(s.x[:2])} "
              f"iters={int(s.stats.iter_total)} rho={float(s.stats.rho_opt):.3g} "
              f"subit={int(s.stats.subproblem_iter)} ({time.time()-t0:.0f}s)",
              flush=True)
    if MODE in ("mixed", "both"):
        t0 = time.time()
        s = lt.solve_mixed(d, opts, x0=xl, key=key)
        cs = s.stats.corrector_steps
        print(f"  mixed: ret={int(s.ret)} x2={np.asarray(s.x[:2])} "
              f"iters={int(s.stats.iter_total)} rho={float(s.stats.rho_opt):.3g} "
              f"subit={int(s.stats.subproblem_iter)} "
              f"corr={int(cs) if cs is not None else '-'} "
              f"stage={int(s.stats.certified_stage)} ({time.time()-t0:.0f}s)",
              flush=True)
