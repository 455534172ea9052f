"""Identify uncertified lanes of the bench circle fleet (warm-cache TPU run)
and report per-lane stats + corrector-seed active-set sizes on the failures.

Run after a bench circle pass so the chunk executable is cached.
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
from lcqpow_tpu.mixed import solve_batch_mixed

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

opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200,
                  stationarity_tolerance=1e-2,
                  qp_solver=lt.QPSolver.OSQP_SPARSE)
t0 = time.time()
sol = solve_batch_mixed(jax.tree.map(jnp.asarray, batch), opts,
                        x0=jnp.asarray(x0b), key=jax.random.PRNGKey(1),
                        escalate=int(os.environ.get("ESC", "2")),
                        chunk=int(os.environ.get("CH", "32")))
ret = np.asarray(sol.ret)
print(f"solve {time.time()-t0:.1f}s certified {(ret == 0).sum()}/{B}",
      flush=True)
bad = np.nonzero(ret != 0)[0]
iters = np.asarray(sol.stats.iter_total)
sub = np.asarray(sol.stats.subproblem_iter)
cs = np.asarray(sol.stats.corrector_steps)
stages = np.asarray(sol.stats.certified_stage)
print("failing lanes:", bad.tolist())
for i in bad:
    print(f"  lane {i}: ret={ret[i]} iters={iters[i]} sub={sub[i]} "
          f"corr={cs[i]} stage={stages[i]} ref={refs[i].tolist()}")
# corrector-seed active size at the failed iterates
n = data.Q.shape[0]
A_full = np.concatenate([np.asarray(data.A_full), np.eye(n)], axis=0)
l = np.concatenate([np.asarray(data.lbA_full), np.asarray(data.lb)])
u = np.concatenate([np.asarray(data.ubA_full), np.asarray(data.ub)])
eq = (u - l) < 1e-12
has_l = l > -1e19
has_u = u < 1e19
xs = np.asarray(sol.x)
for i in bad:
    Ax = A_full @ xs[i]
    near_low = has_l & (np.abs(Ax - l) <= 1e-5 * (1 + np.abs(l)))
    near_up = has_u & (np.abs(Ax - u) <= 1e-5 * (1 + np.abs(u)))
    viol = (has_l & (Ax < l - 1e-9)) | (has_u & (Ax > u + 1e-9))
    act = eq | near_low | near_up | viol
    print(f"  lane {i}: seed-act={act.sum()} viol={viol.sum()} "
          f"|x|={np.abs(xs[i]).max():.3f}")
