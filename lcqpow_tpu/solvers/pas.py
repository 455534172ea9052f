"""Parametric active-set QP engine (the qpOASES-analogue second tier).

The reference offers two inner-QP backends behind its ``Subsolver`` façade:
qpOASES (parametric active set, ``/root/reference/src/SubsolverQPOASES.cpp``)
and OSQP (ADMM, ``src/SubsolverOSQP.cpp``).  Round 1 shipped a single engine
(:mod:`lcqpow_tpu.solvers.admm`); this module is the promised second tier
(SURVEY.md §7 design table: "a strategy arg selecting jitted inner-solver
implementations behind one signature").

Method — a bounded semismooth/parametric active-set iteration, TPU-shaped:

* the working set is a pair of fixed-size boolean masks ``(low, up)`` over
  the stacked constraint rows — no index lists, no dynamic shapes;
* each pivot round solves the masked equality-KKT system through the cached
  delta-regularized Schur complement with iterative refinement
  (:func:`admm._polish_solve` — the same primitive the ADMM engine uses for
  its polish step, here promoted to *the* iteration);
* mask update is a **block pivot**: all wrong-signed multipliers leave the
  working set and all violated rows enter at once (qpOASES pivots one row at
  a time because each pivot is a cheap rank-1 factorization update on CPU;
  on TPU every KKT solve costs the same fixed matmul bundle, so block pivots
  converge in far fewer, equally-priced rounds);
* convergence is declared by the full KKT test (:func:`admm._kkt_ok`) —
  primal feasibility, stationarity, complementary slackness and dual-sign
  feasibility at machine precision, matching the accuracy contract of a
  qpOASES active-set solve;
* hotstart parity: the warm-start duals seed the initial working set, so
  across homotopy steps (where the active set rarely changes) the typical
  solve is ONE masked KKT solve — the analogue of
  ``qp.hotstart(...)`` with few working-set recalculations
  (``src/SubsolverQPOASES.cpp:154-168``).

Failure semantics: a QP this engine cannot certify within the pivot budget
(including infeasible QPs, which can never pass the KKT test) returns a
non-positive status, which the homotopy driver maps to
``SUBPROBLEM_SOLVER_ERROR`` — observably the same as the reference's
behavior when qpOASES returns an error on an infeasible subproblem
(``src/LCQProblem.cpp:548-551``).  Unlike the ADMM engine it does not
produce Farkas-style infeasibility certificates; use the ADMM tier when
those matter.

The engine shares :class:`admm.QPWorkspace` / :class:`admm.ADMMState` so the
driver dispatches between tiers behind one signature
(``Options.inner_solver``, see :mod:`lcqpow_tpu.options`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..options import ADMMOptions
from . import admm
from .admm import (ADMM_MAX_ITER, ADMM_SOLVED, ADMMResult, ADMMState,
                   QPWorkspace)


def solve(ws: QPWorkspace, q, state: ADMMState,
          cfg: ADMMOptions) -> ADMMResult:
    """Solve ``min 1/2 x'Px + q'x  s.t.  l <= Ax <= u`` by bounded
    parametric active-set iteration from a warm start.

    Same signature and result contract as :func:`admm.solve`; ``iterations``
    counts pivot rounds (the analogue of qpOASES working-set
    recalculations reported through ``stats.subproblem_iter``).
    """
    dtype = ws.P.dtype
    y0 = ws.E * state.y / ws.c          # unscaled warm-start dual
    x0 = ws.D * state.x

    # Initial working set: dual-sign seed (OSQP sign convention: y<0 pushes
    # on the lower bound) plus primal proximity of the warm-start point —
    # rows the iterate already sits on enter even if their dual is ~0.
    Ax0 = ws.A @ x0
    span = 1e-8 * (1.0 + jnp.abs(ws.l))
    near_low = (ws.l > -admm.INFTY) & (Ax0 <= ws.l + span)
    near_up = (ws.u < admm.INFTY) \
        & (Ax0 >= ws.u - 1e-8 * (1.0 + jnp.abs(ws.u)))
    low0 = ws.eq_mask | ((y0 < 0) & (ws.l > -admm.INFTY)) | near_low
    up0 = (((y0 > 0) & (ws.u < admm.INFTY)) | near_up) & ~low0

    max_pivots = int(cfg.pas_max_pivots)

    def kkt_round(low, up):
        x, y = admm._polish_solve(ws, q, low, up, cfg)
        ok = admm._kkt_ok(ws, q, x, y, cfg)
        return x, y, ok

    x0p, y0p, ok0 = kkt_round(low0, up0)

    def cond(c):
        _, _, _, _, ok, it = c
        return ~ok & (it < max_pivots)

    def body(c):
        x, y, low, up, _, it = c
        Ax = ws.A @ x
        # Block pivot: drop wrong-signed multipliers, add violated rows;
        # equality rows never leave.
        low = (low & (y < 0)) | (Ax < ws.l - cfg.polish_delta) | ws.eq_mask
        up = (up & (y > 0)) | (Ax > ws.u + cfg.polish_delta)
        low = low & (ws.l > -admm.INFTY)
        up = up & (ws.u < admm.INFTY) & ~low
        x, y, ok = kkt_round(low, up)
        return x, y, low, up, ok, it + 1

    x, y, low, up, ok, iters = lax.while_loop(
        cond, body, (x0p, y0p, low0, up0, ok0, jnp.zeros((), jnp.int32)))

    status = jnp.where(ok, ADMM_SOLVED, ADMM_MAX_ITER).astype(jnp.int32)
    # Failure-path contract: an uncertified but FINITE iterate is exposed
    # as-is (same as admm.solve's max-iter path); the warm-start point is
    # the fallback only when the iterate went NaN/Inf, so the driver always
    # sees finite values.
    finite = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    x_out = jnp.where(ok | finite, x, x0)
    y_out = jnp.where(ok | finite, y, y0)

    new_state = admm._state_of(ws, x_out, y_out)
    return ADMMResult(x=x_out, y=y_out, status=status,
                      iterations=iters + 1, state=new_state)
