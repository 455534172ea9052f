"""Probe: solve ONE chunk of the bench's circle-N100 fleet, in isolation.

Reconstructs the exact 128-lane fleet `bench.py` builds (same seeds), then
solves only lanes [CHUNK*8, (CHUNK+1)*8) with the same vmapped solve_mixed
executable the bench chunk path uses.  Run under a bash loop with one
process per chunk to find which chunk kills the TPU worker — and whether
the kill correlates with straggler lanes (high iteration counts).

Env:
  CHUNK     chunk index 0..15 (default 0)
  CH        chunk width (default 8)
  MAXIT     homotopy iteration budget (default 200 — the bench value)
  STAGE     "mixed" (default) | "pred" (f32 predictor only)
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

CHUNK = int(os.environ.get("CHUNK", "0"))
CH = int(os.environ.get("CH", "8"))
MAXIT = int(os.environ.get("MAXIT", "200"))
STAGE = os.environ.get("STAGE", "mixed")
B = 128

rng = np.random.default_rng(1)
data, x0 = optimize_on_circle(100, as_numpy=True)
W = np.array([[17., -15.], [-15., 17.]])
refs = np.array([0.5, -0.6]) + 0.05 * rng.normal(size=(B, 2))
g = np.tile(np.asarray(data.g), (B, 1))
g[:, :2] = -(refs @ W.T)
batch = jax.tree.map(lambda x: np.tile(x, (B,) + (1,) * x.ndim), data)
batch = dataclasses.replace(batch, g=g)
x0b = np.tile(np.asarray(x0), (B, 1))
x0b[:, :2] = refs

lo, hi = CHUNK * CH, (CHUNK + 1) * CH
cut = lambda a: jnp.asarray(a[lo:hi])
cbatch = jax.tree.map(cut, batch)
cx0 = jnp.asarray(x0b[lo:hi])
keys = jax.random.split(jax.random.PRNGKey(1), B)[lo:hi]

opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=MAXIT,
                  stationarity_tolerance=1e-2,
                  qp_solver=lt.QPSolver.OSQP_SPARSE)
# Ablation overrides: ADMM_OVR='{"polish": false, "max_iter": 100}' etc.
_ovr = os.environ.get("ADMM_OVR")
if _ovr:
    import json as _json
    opts = opts.replace(admm=dataclasses.replace(opts.admm,
                                                 **_json.loads(_ovr)))
if STAGE == "pred":
    from lcqpow_tpu.mixed import _predictor_options
    from lcqpow_tpu.solver import solve
    m = data.A.shape[0] + 2 * data.L.shape[0] + data.Q.shape[0]
    popts = _predictor_options(opts, m)
    cbatch = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), cbatch)
    cx0 = jnp.asarray(cx0, jnp.float32)
    fn = jax.jit(jax.vmap(lambda d, k, a: solve(d, popts, x0=a, key=k),
                          in_axes=(0, 0, 0)))
else:
    from lcqpow_tpu.mixed import solve_mixed
    fn = jax.jit(jax.vmap(lambda d, k, a: solve_mixed(d, opts, x0=a, key=k),
                          in_axes=(0, 0, 0)))

t0 = time.time()
sol = fn(cbatch, keys, cx0)
ret = np.asarray(sol.ret)
t1 = time.time()
iters = np.asarray(sol.stats.iter_total)
print(f"chunk={CHUNK} [{lo}:{hi}] stage={STAGE} maxit={MAXIT}: "
      f"{t1-t0:.1f}s certified {(ret == 0).sum()}/{CH} "
      f"ret={ret.tolist()} iters={iters.tolist()}", flush=True)
