"""Bisect the fused-vs-split cost anomaly: the standalone predictor (2.3 s)
+ corrector (0.3 s) executables are ~9x faster than the single fused
solve_mixed program (23.5 s) on the same (32, m=503) circle chunk.  Time
(a) solve_mixed fused, (b) a hand-chained pred->corrector single program.
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
from lcqpow_tpu.mixed import (_predictor_options, _resolve_kkt_form,
                              correct_and_certify, solve_mixed)
from lcqpow_tpu.solver import solve

f32 = jnp.float32
B = int(os.environ.get("B", "32"))

data, x0 = optimize_on_circle(100, as_numpy=True)
opts = lt.Options(print_level=lt.PrintLevel.NONE, stationarity_tolerance=1e-2,
                  max_iterations=200, qp_solver=lt.QPSolver.OSQP_SPARSE)
opts = _resolve_kkt_form(jax.tree.map(jnp.asarray, data), opts)
print("kkt_form:", opts.admm.kkt_form, flush=True)
m_rows = data.A.shape[0] + 2 * data.L.shape[0] + data.Q.shape[0]
popts = _predictor_options(opts, m_rows)

n = data.Q.shape[0]
rng = np.random.default_rng(1)
W = np.array([[17., -15.], [-15., 17.]])
refs = np.array([0.5, -0.6]) + 0.05 * rng.normal(size=(B, 2))
gs = np.tile(np.asarray(data.g), (B, 1))
gs[:, :2] = -(refs @ W.T)
x0b = np.tile(np.asarray(x0), (B, 1))
x0b[:, :2] = refs
batch = jax.tree.map(lambda a: np.tile(a, (B,) + (1,) * a.ndim), data)
batch = dataclasses.replace(batch, g=gs)
keys = jax.random.split(jax.random.PRNGKey(1), B)
jbatch = jax.tree.map(jnp.asarray, batch)
jx0 = jnp.asarray(x0b)


def timed(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        times.append(time.time() - t0)
    print(f"{name}: compile+first {tc:6.1f}s  warm best "
          f"{min(times)*1e3:9.1f} ms", flush=True)
    return out


def chained(d, k, a):
    d32 = jax.tree.map(lambda t: jnp.asarray(t, f32), d)
    pred = solve(d32, popts, x0=jnp.asarray(a, f32), key=k)
    d64 = jax.tree.map(lambda t: jnp.asarray(t, jnp.float64), d)
    return correct_and_certify(d64, opts, pred.x, pred.y,
                               pred.stats.rho_opt, pred.stats.iter_outer > 0,
                               pred.ret, pred.stats.qp_exit_flag)


cout = timed("hand-chained pred+corr", jax.jit(jax.vmap(chained)),
             jbatch, keys, jx0)
print("   certified:", int((np.asarray(cout[2]) == 0).sum()), "/", B,
      flush=True)

mout = timed("solve_mixed fused", jax.jit(jax.vmap(
    lambda d, k, a: solve_mixed(d, opts, x0=a, key=k))), jbatch, keys, jx0)
print("   certified:", int((np.asarray(mout.ret) == 0).sum()), "/", B,
      flush=True)
