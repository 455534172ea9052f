"""Probe: batched circle-N100 mixed solve on TPU at increasing batch sizes.

The unbatched solve works on-chip; the bench's batch-128 config dies with
'TPU device error'.  Bisect the batch size (and optionally the pipeline
stage, STAGES=pred|mixed) to find the breaking shape.
"""
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
from lcqpow_tpu.problems import optimize_on_circle

B = int(os.environ.get("B", "8"))
STAGE = os.environ.get("STAGE", "mixed")
N = int(os.environ.get("N", "100"))

rng = np.random.default_rng(1)
data, x0 = optimize_on_circle(N, as_numpy=True)
W = np.array([[17., -15.], [-15., 17.]])
refs = np.array([0.5, -0.6]) + 0.05 * rng.normal(size=(B, 2))
g = np.tile(np.asarray(data.g), (B, 1))
g[:, :2] = -(refs @ W.T)
batch = jax.tree.map(lambda x: np.tile(x, (B,) + (1,) * x.ndim), data)
batch = dataclasses.replace(batch, g=g)
x0b = np.tile(np.asarray(x0), (B, 1))
x0b[:, :2] = refs
batch = jax.tree.map(jnp.asarray, batch)
x0b = jnp.asarray(x0b)
keys = jax.random.split(jax.random.PRNGKey(1), B)

opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200,
                  stationarity_tolerance=1e-2,
                  qp_solver=lt.QPSolver.OSQP_SPARSE)
if STAGE == "pred":
    from lcqpow_tpu.mixed import _predictor_options
    from lcqpow_tpu.solver import solve
    m = data.A.shape[0] + 2 * data.L.shape[0] + data.Q.shape[0]
    popts = _predictor_options(opts, m)
    batch = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), batch)
    x0b = jnp.asarray(x0b, jnp.float32)
    fn = jax.jit(jax.vmap(lambda d, k, a: solve(d, popts, x0=a, key=k),
                          in_axes=(0, 0, 0)))
else:
    from lcqpow_tpu.mixed import solve_mixed
    fn = jax.jit(jax.vmap(lambda d, k, a: solve_mixed(d, opts, x0=a, key=k),
                          in_axes=(0, 0, 0)))

t0 = time.time()
sol = fn(batch, keys, x0b)
ret = np.asarray(sol.ret)
print(f"B={B} stage={STAGE}: compile+run {time.time()-t0:.1f}s "
      f"certified {(ret == 0).sum()}/{B}", flush=True)
