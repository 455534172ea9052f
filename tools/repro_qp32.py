"""Debug: the circle problem's first inner QP in f32 (predictor path)."""
import os, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu.problems import optimize_on_circle
from lcqpow_tpu.mixed import _predictor_options
from lcqpow_tpu.solver import build_workspace
from lcqpow_tpu.solvers import admm

N = int(os.environ.get("N", "20"))
data, x0 = optimize_on_circle(N)
opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200,
                  stationarity_tolerance=1e-2,
                  qp_solver=lt.QPSolver.OSQP_SPARSE)
popts = _predictor_options(opts)
cfg = popts.admm
print("admm cfg:", cfg)

data32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), data)
ws = build_workspace(data32, popts)
print("Q diag range:", float(jnp.min(jnp.diag(data32.Q))),
      float(jnp.max(jnp.diag(data32.Q))))
print("D range:", float(jnp.min(ws.D)), float(jnp.max(ws.D)))
print("E range:", float(jnp.min(ws.E)), float(jnp.max(ws.E)))
print("c:", float(ws.c))
print("Ps diag range:", float(jnp.min(jnp.diag(ws.Ps))),
      float(jnp.max(jnp.diag(ws.Ps))))

# First QP: zero-penalty-first -> gk = g, warm start from x0.
st0 = admm.init_state(ws, jnp.asarray(x0, jnp.float32), None)
res = admm.solve(ws, data32.g, st0, cfg)
print("status", int(res.status), "iters", int(res.iterations))

# residuals of returned point
x, y = res.x, res.y
Ax = ws.A @ x
rp = float(jnp.max(jnp.abs(Ax - jnp.clip(Ax, ws.l, ws.u))))
rd = float(jnp.max(jnp.abs(ws.P @ x + data32.g + ws.A.T @ y)))
print("rp", rp, "rd", rd)

# what does f64 ADMM do on the same QP?
ws64 = build_workspace(data, opts)
st64 = admm.init_state(ws64, jnp.asarray(x0), None)
res64 = admm.solve(ws64, data.g, st64, opts.admm)
print("f64 status", int(res64.status), "iters", int(res64.iterations))
x64 = np.asarray(res64.x)
print("x[:2] f32", np.asarray(x[:2]), "f64", x64[:2])

# ---- second QP: gk = rho*C@xk + g (rho=0.01), warm from first-QP state ----
print("--- second QP ---")
rho = jnp.float32(0.01)
xk = res.x  # after alpha=1 step from x0
gk = rho * (data32.C @ xk) + data32.g
res2 = admm.solve(ws, gk, res.state, cfg)
print("status", int(res2.status), "iters", int(res2.iterations))
x2, y2 = res2.x, res2.y
Ax = ws.A @ x2
rp = float(jnp.max(jnp.abs(Ax - jnp.clip(Ax, ws.l, ws.u))))
rd = float(jnp.max(jnp.abs(ws.P @ x2 + gk + ws.A.T @ y2)))
print("rp", rp, "rd", rd)

# f64 twin
xk64 = res64.x
gk64 = 0.01 * (data.C @ xk64) + data.g
res2_64 = admm.solve(ws64, gk64, res64.state, opts.admm)
print("f64 status", int(res2_64.status), "iters", int(res2_64.iterations))

# where does f32 rd stand relative to the eps it needs?
cfg_l = cfg
dsc = max(float(jnp.max(jnp.abs(ws.P @ x2))), float(jnp.max(jnp.abs(ws.A.T @ y2))),
          float(jnp.max(jnp.abs(gk))))
print("needs rd <=", cfg_l.eps_abs + cfg_l.eps_rel * dsc)
