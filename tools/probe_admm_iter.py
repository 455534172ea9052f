"""Isolate the inner-ADMM per-iteration cost at the circle chunk shapes.

Runs admm.solve on a (B, m=503, n=202) batch with polish off and a fixed
iteration budget, and times the warm executable — per-iteration cost =
time / max_iter.  Run on the chip.
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
from lcqpow_tpu.solvers import admm
from lcqpow_tpu.mixed import _predictor_options

f32 = jnp.float32
B = int(os.environ.get("B", "32"))
ITERS = int(os.environ.get("ITERS", "250"))

data, x0 = optimize_on_circle(100, as_numpy=True)
opts = lt.Options(print_level=lt.PrintLevel.NONE, stationarity_tolerance=1e-2,
                  qp_solver=lt.QPSolver.OSQP_SPARSE)
m_rows = data.A.shape[0] + 2 * data.L.shape[0] + data.Q.shape[0]
cfg = _predictor_options(opts, m_rows).admm
cfg = dataclasses.replace(cfg, polish=False, max_iter=ITERS,
                          eps_abs=1e-12, eps_rel=1e-12)  # force full budget

n = data.Q.shape[0]
A_int = np.concatenate([np.asarray(data.A_full), np.eye(n)], axis=0)
l_int = np.concatenate([np.asarray(data.lbA_full), np.asarray(data.lb)])
u_int = np.concatenate([np.asarray(data.ubA_full), np.asarray(data.ub)])

rng = np.random.default_rng(0)
gs = np.asarray(data.g)[None, :] + 0.01 * rng.normal(size=(B, n))


def one(g):
    ws = admm.factorize(jnp.asarray(data.Q, f32), jnp.asarray(A_int, f32),
                        jnp.asarray(l_int, f32), jnp.asarray(u_int, f32),
                        cfg, q_proto=g)
    st = admm.init_state(ws)
    res = admm.solve(ws, g, st, cfg)
    return res.iterations, res.x


fn = jax.jit(jax.vmap(one))
g32 = jnp.asarray(gs, f32)
t0 = time.time()
out = fn(g32)
jax.block_until_ready(out)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
times = []
for _ in range(3):
    t0 = time.time()
    out = fn(g32)
    _ = np.asarray(out[0])
    times.append(time.time() - t0)
t = min(times)
iters = int(np.max(np.asarray(out[0])))
print(f"B={B} iters={iters}: best {t:.3f}s -> {t/max(iters,1)*1e3:.3f} ms/iter "
      f"(incl. factorize+checks)", flush=True)
