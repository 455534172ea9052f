"""Probe: does queueing many chunk dispatches (no intermediate sync) crash
the axon TPU worker?  Mimics chunked_call's dispatch pattern on the circle
fleet: N sequential vmap-8 solve_mixed calls, optionally syncing between
chunks (SYNC=1)."""
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
from lcqpow_tpu.mixed import solve_mixed
from lcqpow_tpu.problems import optimize_on_circle

NCH = int(os.environ.get("NCH", "16"))
SYNC = os.environ.get("SYNC", "0") == "1"
CH = 8

rng = np.random.default_rng(1)
data, x0 = optimize_on_circle(100, as_numpy=True)
W = np.array([[17., -15.], [-15., 17.]])
B = NCH * CH
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
vf = jax.jit(jax.vmap(lambda d, k, a: solve_mixed(d, opts, x0=a, key=k),
                      in_axes=(0, 0, 0)))

t0 = time.time()
outs = []
for i in range(NCH):
    sl = lambda a: a[i * CH:(i + 1) * CH]
    sol = vf(jax.tree.map(sl, batch), keys[i * CH:(i + 1) * CH],
             x0b[i * CH:(i + 1) * CH])
    outs.append(sol)
    if SYNC:
        _ = int(np.asarray(sol.ret[0]))
    print(f"chunk {i} dispatched ({time.time()-t0:.1f}s)", flush=True)
ret = np.concatenate([np.asarray(s.ret) for s in outs])
print(f"NCH={NCH} SYNC={SYNC}: certified {(ret == 0).sum()}/{B} "
      f"in {time.time()-t0:.1f}s", flush=True)
