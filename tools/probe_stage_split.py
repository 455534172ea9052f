"""Decompose the circle-chunk mixed pipeline cost: polish bundle, predictor
homotopy, corrector — each timed warm as its own executable at (B, m=503,
n=202).  Run on the chip."""
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
from lcqpow_tpu.mixed import _predictor_options, correct_and_certify
from lcqpow_tpu.solver import solve

f32 = jnp.float32
B = int(os.environ.get("B", "32"))

data, x0 = optimize_on_circle(100, as_numpy=True)
opts = lt.Options(print_level=lt.PrintLevel.NONE, stationarity_tolerance=1e-2,
                  max_iterations=200, qp_solver=lt.QPSolver.OSQP_SPARSE)
m_rows = data.A.shape[0] + 2 * data.L.shape[0] + data.Q.shape[0]
popts = _predictor_options(opts, m_rows)
cfg = popts.admm

n = data.Q.shape[0]
A_int = np.concatenate([np.asarray(data.A_full), np.eye(n)], axis=0)
l_int = np.concatenate([np.asarray(data.lbA_full), np.asarray(data.lb)])
u_int = np.concatenate([np.asarray(data.ubA_full), np.asarray(data.ub)])
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
    print(f"{name}: compile+first {tc:6.1f}s  warm best {min(times)*1e3:9.1f} ms",
          flush=True)
    return out


# 1. one full polish bundle (4 rounds budget)
def polish_one(g):
    ws = admm.factorize(jnp.asarray(data.Q, f32), jnp.asarray(A_int, f32),
                        jnp.asarray(l_int, f32), jnp.asarray(u_int, f32),
                        cfg, q_proto=g)
    return admm._polish(ws, g, jnp.zeros((A_int.shape[0],), f32), cfg)


timed("polish bundle (cold seed, <=4 rounds)", jax.jit(jax.vmap(polish_one)),
      jnp.asarray(gs, f32))

# 2. predictor homotopy
b32 = jax.tree.map(lambda a: jnp.asarray(a, f32), batch)
x032 = jnp.asarray(x0b, f32)
pred_fn = jax.jit(jax.vmap(lambda d, k, a: solve(d, popts, x0=a, key=k),
                           in_axes=(0, 0, 0)))
pred = timed("predictor (homotopy)", pred_fn, b32, keys, x032)
print("   pred iters:", np.asarray(pred.stats.iter_total).tolist(), flush=True)

# 3. corrector from the predictor hand-off
b64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), batch)


def corr(d, x, y, rho, outer, ret, qp):
    return correct_and_certify(d, opts, x, y, rho, outer > 0, ret, qp)


corr_fn = jax.jit(jax.vmap(corr, in_axes=(0,) * 7))
cout = timed("corrector (df32)", corr_fn, b64, pred.x, pred.y,
             pred.stats.rho_opt, pred.stats.iter_outer, pred.ret,
             pred.stats.qp_exit_flag)
print("   corr steps:", np.asarray(cout[5]).tolist(), flush=True)
print("   certified:", int((np.asarray(cout[2]) == 0).sum()), "/", B,
      flush=True)
