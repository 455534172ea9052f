"""Repro: mixed pipeline on the OptimizeOnCircle N=100 problem."""
import os, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
import jax
if os.environ.get("REPRO_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
t00 = time.time()
def tic(msg):
    print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)
import jax.numpy as jnp
import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu.problems import optimize_on_circle
from lcqpow_tpu.mixed import solve_mixed, _predictor_options
from lcqpow_tpu.solver import solve

N = int(os.environ.get("N", "20"))
STAGES = os.environ.get("STAGES", "f64,pred,mixed").split(",")
data, x0 = optimize_on_circle(N)
opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200,
                  stationarity_tolerance=1e-2,
                  qp_solver=lt.QPSolver.OSQP_SPARSE)

if "f64" in STAGES:
    tic("compiling f64")
    # f64 reference path (SLOW to compile on TPU: f64 is emulated)
    sol64 = jax.jit(lambda d, a: solve(d, opts, x0=a))(data, jnp.asarray(x0))
    print("f64  ret", int(sol64.ret), "x[:2]", np.asarray(sol64.x[:2]),
          "iters", int(sol64.stats.iter_total))

if "pred" in STAGES:
    tic("compiling predictor")
    # f32 predictor alone (size-aware floors, as solve_mixed would build)
    data32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), data)
    popts = _predictor_options(opts, data.nC + 2 * data.nComp + data.nV)
    pred = jax.jit(lambda d, a: solve(d, popts, x0=a))(
        data32, jnp.asarray(x0, jnp.float32))
    print("pred ret", int(pred.ret), "x[:2]", np.asarray(pred.x[:2]),
          "iters", int(pred.stats.iter_total),
          "rho", float(pred.stats.rho_opt),
          "qpflag", int(pred.stats.qp_exit_flag))

if "mixed" in STAGES:
    tic("compiling mixed")
    # full mixed
    solm = jax.jit(lambda d, a: solve_mixed(d, opts, x0=a))(
        data, jnp.asarray(x0))
    print("mixed ret", int(solm.ret), "x[:2]", np.asarray(solm.x[:2]),
          "algo", int(solm.algo_status))
tic("done")
