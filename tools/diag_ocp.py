"""Diagnose the OCP predictor's inner-solver non-convergence (VERDICT r4
Weak #1): every homotopy pass of the f32 predictor exhausts the full ADMM
budget and neither polish nor plain ADMM ever passes the acceptance test.

Dissects ONE OCP instance on the f32 predictor path:
  * first subproblem: ADMM residual trajectory at several rho / eq-scale
    settings (bypassing the packaged solve loop);
  * polish: seeded active set, KKT residuals, acceptance verdict;
  * homotopy: per-pass qp status / iterations for the first K passes.

Usage: JAX_PLATFORMS=cpu python tools/diag_ocp.py [stage ...]
Stages: admm polish homotopy (default: all)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu import io
from lcqpow_tpu.mixed import _predictor_options
from lcqpow_tpu.solver import build_workspace
from lcqpow_tpu.solvers import admm

REF = "/root/reference/examples/example_data"


def load_f32():
    data = io.load_lcqp_from_files(REF)
    x0 = io.load_x0_from_files(REF)
    data32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), data)
    m_rows = data.nC + 2 * data.nComp + data.nV
    opts = _predictor_options(
        lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200),
        m_rows)
    return data32, jnp.asarray(x0, jnp.float32), opts


def stage_admm():
    data, x0, opts = load_f32()
    for rho, eqs in [(0.1, 1e3), (0.1, 1e1), (1.0, 1e3), (10.0, 1e3),
                     (0.01, 1e3), (0.1, 1e5)]:
        cfg = dataclasses.replace(opts.admm, rho=rho, rho_eq_scale=eqs,
                                  polish=False, max_iter=2000,
                                  check_interval=2000)
        ws = build_workspace(data, opts.replace(admm=cfg))
        st = admm.init_state(ws, x0)
        qs = ws.c * ws.D * data.g

        @jax.jit
        def march(s, k):
            def it(_, s):
                return admm_iter_host(ws, qs, cfg, s)
            s = jax.lax.fori_loop(0, k, it, s)
            xs, zs, ys = s[0], s[1], s[2]
            rp, rd, psc, dsc = admm._residuals(ws, qs, xs, zs, ys)
            return s, (rp, rd)

        s = (st.x, st.z, st.y, ws.rho_vec, ws.rho_inv, ws.Minv)
        hist = []
        prev = 0
        for k in (10, 50, 100, 200, 500, 1000, 2000):
            s, (rp, rd) = march(s, k - prev)
            prev = k
            hist.append((k, float(rp), float(rd)))
        print(f"rho={rho} eq_scale={eqs}: " + "  ".join(
            f"it{k}: rp={rp:.2e} rd={rd:.2e}" for k, rp, rd in hist))


def admm_iter_host(ws, qs, cfg, s):
    xs, zs, ys, rho_vec, rho_inv, Minv = s
    sigma = jnp.asarray(cfg.sigma, ws.P.dtype)
    alpha = jnp.asarray(cfg.alpha, ws.P.dtype)
    rhs = sigma * xs - qs + ws.As.T @ (rho_vec * zs - ys)
    x_t = Minv @ rhs
    z_t = ws.As @ x_t
    x_new = alpha * x_t + (1 - alpha) * xs
    z_rel = alpha * z_t + (1 - alpha) * zs
    z_new = jnp.clip(z_rel + rho_inv * ys, ws.ls, ws.us)
    y_new = ys + rho_vec * (z_rel - z_new)
    return x_new, z_new, y_new, rho_vec, rho_inv, Minv


def stage_polish():
    data, x0, opts = load_f32()
    ws = build_workspace(data, opts)
    cfg = opts.admm
    q = data.g
    y0 = jnp.zeros(ws.A.shape[0], jnp.float32)
    x_po, y_po = admm._polish(ws, q, y0, cfg)
    ok = admm._kkt_ok(ws, q, x_po, y_po, cfg)
    Ax = ws.A @ x_po
    rp = float(jnp.max(jnp.abs(Ax - jnp.clip(Ax, ws.l, ws.u))))
    rd = float(jnp.max(jnp.abs(ws.P @ x_po + q + ws.A.T @ y_po)))
    print(f"polish from zero duals: kkt_ok={bool(ok)} rp={rp:.3e} "
          f"rd={rd:.3e} |x|={float(jnp.max(jnp.abs(x_po))):.3e}")
    print(f"  eps_abs={cfg.eps_abs:.1e} eps_rel={cfg.eps_rel:.1e} "
          f"polish_delta={cfg.polish_delta:.1e}")


def stage_homotopy():
    data, x0, opts = load_f32()
    sol = lt.solve(data, opts, x0=x0)
    print(f"predictor: ret={int(sol.ret)} iters={int(sol.stats.iter_total)} "
          f"outer={int(sol.stats.iter_outer)} "
          f"sub_iters={int(sol.stats.subproblem_iter)} "
          f"rho={float(sol.stats.rho_opt):.3e} "
          f"qp_flag={int(sol.stats.qp_exit_flag)}")
    x = np.asarray(sol.x)
    L = np.asarray(data.L); R = np.asarray(data.R)
    phi = float((L @ x - np.asarray(data.lbL)) @ (R @ x - np.asarray(data.lbR)))
    print(f"  |x|_max={np.abs(x).max():.3e} phi={phi:.3e}")


if __name__ == "__main__":
    stages = sys.argv[1:] or ["admm", "polish", "homotopy"]
    for s in stages:
        print(f"=== {s} ===")
        globals()[f"stage_{s}"]()
