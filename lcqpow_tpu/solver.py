"""The penalty-homotopy driver (sequential convex programming loop).

This is the TPU-native re-design of ``LCQProblem::runSolver``
(``/root/reference/src/LCQProblem.cpp:444-560``): the reference's mutable
object + ``while(true)`` becomes a pure function

    solve(data, options, x0, y0, key) -> Solution

built on ``jax.lax.while_loop`` with an immutable carry.  The exact loop
semantics are preserved (verified against the reference source):

* fused inner/outer loop — an "outer iteration" is an inner iteration in
  which a penalty update fired (``:476-559``);
* ``updateLinearization`` runs **twice** per pass (``:508`` and ``:545``) so
  ``gk`` reflects any penalty update between them;
* both the Leyffer dynamic check (``:499``, ``leyfferCheckPositive``
  ``:1275-1313``) and the stationary-but-not-complementary branch (``:528``)
  can fire a penalty update in the *same* pass;
* the stationarity check (``:511``) uses the ``statk`` computed at the top of
  the pass — i.e. *before* any penalty update of this pass (stale-``rho``
  semantics replicated);
* ``g_tilde`` starts as ``g`` and only picks up the ``rho*g_phi`` term after
  the first penalty update (``initializeSolver`` ``:966-967`` vs
  ``updatePenalty`` ``:1210-1213``) — a reference quirk that matters for
  shifted complementarity bounds and is replicated as-is;
* step perturbation adds ``{-1,0,1}*EPS`` per coordinate (``:1353-1362``) but
  with an explicit ``jax.random`` key instead of ``srand(time(NULL))``
  (``:1016``), making solves deterministic and vmappable;
* exact merit line search ``alpha = min(-lk/qk, 1)`` (``:1217-1237``);
* dual transform ``y_L -= rho*R*x``, ``y_R -= rho*L*x`` (``:1381-1409``) and
  S/M/C/W stationarity typing (``:1412-1482``) on convergence.

``Qk = Q + rho*C`` is never materialized: every use is a matvec, computed as
``Q@v + rho*(C@v)`` so penalty updates are free (the reference instead
rebuilds/patches ``Qk`` per update, ``:1316-1326`` — an artifact of handing a
materialized Hessian to qpOASES).

Everything is shape-static and branchless (``lax.cond``/``jnp.where``), so
``jax.vmap`` turns this scalar solver into a batched one where each instance
carries its own ``done`` flag (see ``batch.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import _config
from .data import LCQPData
from .options import Options
from .solvers import admm, pas

# Inner-engine dispatch (SURVEY.md §7: "a strategy arg selecting jitted
# inner-solver implementations behind one signature").  Both engines share
# QPWorkspace/ADMMState, so the choice is a trace-time constant.
_INNER_ENGINES = {"admm": admm.solve, "pas": pas.solve}
from .stats import Stats, Trajectories
from .types import AlgorithmStatus, PrintLevel, QPSolver, ReturnValue


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Solution:
    """Result of one LCQP solve.

    ``y`` follows the mode-dependent reference layout
    (``src/LCQProblem.cpp:888-960``): ``[y_box(nV); y_A(nC); y_L; y_R]`` for
    qpOASES-parity modes, ``[y_A; y_L; y_R]`` otherwise.
    """

    x: jnp.ndarray            # (nV,)
    y: jnp.ndarray            # (nDuals,)
    ret: jnp.ndarray          # () int32 ReturnValue
    algo_status: jnp.ndarray  # () int32 AlgorithmStatus
    stats: Stats

    @property
    def success(self):
        return self.ret == int(ReturnValue.SUCCESSFUL_RETURN)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Carry:
    """while_loop carry of the homotopy driver (internal)."""

    xk: jnp.ndarray
    yk: jnp.ndarray          # (m_int,) LCQPow sign, internal order [A;L;R;box]
    pk: jnp.ndarray
    statk: jnp.ndarray
    gk: jnp.ndarray
    g_tilde: jnp.ndarray
    rho: jnp.ndarray
    alphak: jnp.ndarray
    st: admm.ADMMState
    hist: jnp.ndarray        # (nhist,) Leyffer phi ring buffer
    hist_n: jnp.ndarray      # () int32 entries currently valid
    inner: jnp.ndarray       # () int32
    outer: jnp.ndarray
    total: jnp.ndarray
    sub_iters: jnp.ndarray   # accumulated inner-QP iterations
    qp_flag: jnp.ndarray     # last inner-QP status
    qp_iter_k: jnp.ndarray   # iterations of the most recent QP solve
    done: jnp.ndarray        # () bool
    qp_streak: jnp.ndarray   # () int32 consecutive inner budget exhaustions
    streak_stat0: jnp.ndarray  # () stationarity when the streak started
    streak_phi0: jnp.ndarray   # () |phi| when the streak started
    ret: jnp.ndarray         # () int32 ReturnValue
    algo: jnp.ndarray        # () int32 AlgorithmStatus
    key: jax.Array
    traj: Optional[Trajectories]
    # Best-iterate tracking (Options.keep_best_iterate): the homotopy can
    # COLLAPSE in f32 (inner-ADMM divergence compounds until the iterate
    # pins at the box bounds with every equality row violated — observed on
    # the perturbed circle fleet on TPU), and the reference's contract of
    # returning the final iterate then hands downstream consumers garbage.
    x_best: jnp.ndarray
    y_best: jnp.ndarray
    score_best: jnp.ndarray  # () feasibility-first quality score


def _phi(data: LCQPData, x):
    """phi(x) = (Lx-lbL)'(Rx-lbR), evaluated in PRODUCT form.

    The reference evaluates the cached quadratic expansion
    ``phi_const + g_phi'x + 1/2 x'Cx`` (``getPhi``,
    ``src/LCQProblem.cpp:1172-1185``) — fine in f64, but near the solution
    the expansion's O(1) terms cancel catastrophically, so its f32 noise
    floor is ~n*eps32*scale (~2e-5 at the circle problem's nV=202): spurious
    Leyffer "no progress" firings pumped rho to the cap on ~1/3 of the
    bench's perturbed circle lanes.  The product form is cancellation-free
    (each satisfied pair contributes ~|small|*|O(1)| with only relative
    error) and costs two matvecs that XLA fuses with the neighboring
    constraint evaluations."""
    sL = data.L @ x - data.lbL
    sR = data.R @ x - data.lbR
    return jnp.dot(sL, sR)


def _obj(data: LCQPData, x):
    return jnp.dot(data.g, x) + 0.5 * (x @ (data.Q @ x))


def _merit(data: LCQPData, x, rho):
    """g'x + 1/2 x'Qk x — replicates ``getMerit`` (``:1188-1196``) including
    its omission of the ``rho*(g_phi'x + phi_const)`` terms."""
    return jnp.dot(data.g, x) + 0.5 * (x @ (data.Q @ x)) \
        + 0.5 * rho * (x @ (data.C @ x))


def _determine_stationarity(data: LCQPData, x, yL, yR, compl_tol):
    """Vectorized ``determineStationarityType`` (``src/LCQProblem.cpp:1412-1453``).

    Weak set uses raw ``Lx, Rx <= tol`` — not shifted by lbL/lbR — replicated
    as-is (see SURVEY.md §7 hard parts).
    """
    Lx = data.L @ x
    Rx = data.R @ x
    weak = (Lx <= compl_tol) & (Rx <= compl_tol)
    prod = yL * yR
    mn = jnp.minimum(yL, yR)
    s_fail = weak & (mn < 0)
    mc_fail = weak & (jnp.abs(prod) >= compl_tol) & (mn <= 0)
    w_flag = mc_fail & (prod <= compl_tol)
    return jnp.where(
        jnp.any(w_flag), int(AlgorithmStatus.W_STATIONARY_SOLUTION),
        jnp.where(
            ~jnp.any(s_fail), int(AlgorithmStatus.S_STATIONARY_SOLUTION),
            jnp.where(~jnp.any(mc_fail),
                      int(AlgorithmStatus.M_STATIONARY_SOLUTION),
                      int(AlgorithmStatus.C_STATIONARY_SOLUTION)))
    ).astype(jnp.int32)


def build_workspace(data: LCQPData, options: Options) -> admm.QPWorkspace:
    """Assemble the internal constraint system and factorize once.

    Internal row order: ``[A (nC); L; R; box (nV)]``.  Box rows are always
    materialized (+/-INFTY bounds when absent) so all solver modes share one
    shape; loose rows receive a negligible ADMM penalty in ``factorize``.
    """
    n = data.nV
    eye = jnp.eye(n, dtype=data.Q.dtype)
    A_int = jnp.concatenate([data.A_full, eye], axis=0)
    l_int = jnp.concatenate([data.lbA_full, data.lb])
    u_int = jnp.concatenate([data.ubA_full, data.ub])
    return admm.factorize(data.Q, A_int, l_int, u_int, options.admm,
                          q_proto=data.g)


def solve(data: LCQPData, options: Options = Options(),
          x0: Optional[jnp.ndarray] = None,
          y0: Optional[jnp.ndarray] = None,
          key: Optional[jax.Array] = None) -> Solution:
    """Solve a single LCQP instance.  Pure and jittable; ``options`` is
    static.  For batches, ``vmap`` over ``(data, x0, y0, key)``."""
    n = data.nV
    nC, nK = data.nC, data.nComp
    m0 = nC + 2 * nK            # stacked constraint rows (A; L; R)
    m_int = m0 + n              # + box rows
    dtype = data.Q.dtype
    cfg = options.admm
    nhist = max(int(options.n_dynamic_penalty), 1)

    if key is None:
        key = jax.random.PRNGKey(options.seed)

    ws = build_workspace(data, options)

    # --- initial iterates (setInitialGuess, LCQProblem.ipp:133-158) ---------
    xk0 = jnp.zeros((n,), dtype) if x0 is None else jnp.asarray(x0, dtype)
    if y0 is None:
        yk0 = jnp.zeros((m_int,), dtype)
        have_y0 = False
    else:
        y0 = jnp.asarray(y0, dtype).reshape(-1)
        if y0.shape[0] == n + m0:
            # Reference qpOASES layout [box; A; L; R] -> internal [A; L; R; box].
            yk0 = jnp.concatenate([y0[n:], y0[:n]])
        elif y0.shape[0] == m0:
            yk0 = jnp.concatenate([y0, jnp.zeros((n,), dtype)])
        else:
            raise ValueError(f"y0 must have length {m0} or {n + m0}")
        have_y0 = True

    # ADMM warm start (OSQP sign is the negative of the LCQPow convention,
    # src/SubsolverOSQP.cpp:196-199).
    st0 = admm.init_state(ws, xk0 if x0 is not None else None,
                          -yk0 if have_y0 else None)

    rho0 = jnp.asarray(options.initial_penalty_parameter, dtype)
    g_tilde0 = data.g          # NOT g + rho0*g_phi — reference quirk, see above.

    # --- first QP (runSolver :452-467) --------------------------------------
    if options.solve_zero_penalty_first:
        gk0 = data.g
    else:
        gk0 = rho0 * (data.C @ xk0) + g_tilde0
    inner_solve = _INNER_ENGINES[options.inner_solver]

    def qp_failed(status):
        # Reference semantics: any non-positive subsolver exit is fatal
        # (src/LCQProblem.cpp:548-551, exit flag <= 0).  With
        # tolerate_inner_maxiter only infeasibility certificates abort;
        # a MAX-ITER exit continues from the best iterate (see options.py).
        if options.tolerate_inner_maxiter:
            return (status == admm.ADMM_PRIMAL_INFEASIBLE) \
                | (status == admm.ADMM_DUAL_INFEASIBLE) | (status == 0)
        return status <= 0

    res0 = inner_solve(ws, gk0, st0, cfg)
    yk_full0 = -res0.y
    pk0 = res0.x - xk0
    init_failed = qp_failed(res0.status)

    stat_tol = options.stationarity_tolerance
    compl_tol = options.complementarity_tolerance
    beta = options.penalty_update_factor

    store = options.store_steps
    T = options.max_iterations + 2
    if store:
        traj0 = Trajectories(
            x_steps=jnp.full((T, n), jnp.nan, dtype),
            inner_iters=jnp.zeros((T,), jnp.int32),
            subproblem_iters=jnp.zeros((T,), jnp.int32),
            accu_subproblem_iters=jnp.zeros((T,), jnp.int32),
            step_length=jnp.full((T,), jnp.nan, dtype),
            step_size=jnp.full((T,), jnp.nan, dtype),
            stat_vals=jnp.full((T,), jnp.nan, dtype),
            obj_vals=jnp.full((T,), jnp.nan, dtype),
            phi_vals=jnp.full((T,), jnp.nan, dtype),
            merit_vals=jnp.full((T,), jnp.nan, dtype),
        )
    else:
        traj0 = None

    i32 = lambda v: jnp.asarray(v, jnp.int32)

    carry0 = _Carry(
        xk=xk0, yk=yk_full0, pk=pk0,
        statk=jnp.zeros((n,), dtype), gk=gk0, g_tilde=g_tilde0, rho=rho0,
        alphak=jnp.ones((), dtype), st=res0.state,
        hist=jnp.zeros((nhist,), dtype), hist_n=i32(0),
        inner=i32(0), outer=i32(0), total=i32(0),
        sub_iters=res0.iterations, qp_flag=res0.status,
        qp_iter_k=res0.iterations,
        done=jnp.asarray(init_failed),
        qp_streak=i32(0),
        streak_stat0=jnp.asarray(jnp.inf, dtype),
        streak_phi0=jnp.asarray(jnp.inf, dtype),
        ret=jnp.where(init_failed,
                      i32(int(ReturnValue.SUBPROBLEM_SOLVER_ERROR)),
                      i32(int(ReturnValue.SUCCESSFUL_RETURN))),
        algo=i32(int(AlgorithmStatus.PROBLEM_NOT_SOLVED)),
        key=key, traj=traj0,
        x_best=xk0, y_best=yk_full0,
        score_best=jnp.asarray(jnp.inf, dtype),
    )
    # An initial-QP failure means the loop never runs but ret must be the
    # error (runSolver :456-466); encode by flagging done with ret set above
    # — if the loop runs, ret starts as SUCCESSFUL and is overwritten on exit.

    def Qk_mv(rho, v):
        return data.Q @ v + rho * (data.C @ v)

    def body(c: _Carry) -> _Carry:
        # 1. updateStep (:479, :1240-1243)
        xk = c.xk + c.alphak * c.pk

        # 2. updateStationarity (:482, :1246-1272): Qk xk + g_tilde - Aint'yk
        #    (box block of yk is exactly zero in modes without box duals).
        A_int_t_y = ws.A.T @ c.yk
        statk = Qk_mv(c.rho, xk) + c.g_tilde - A_int_t_y

        phi_k = _phi(data, xk)

        # Best-iterate tracking (see _Carry): feasibility-first score so a
        # later infeasible/collapsed pass can never displace an earlier
        # feasible one; among feasible passes, stationarity+complementarity
        # decide.  One extra (m, n) matvec per pass.
        if options.keep_best_iterate:
            Axk = ws.A @ xk
            viol = jnp.max(jnp.maximum(Axk - jnp.clip(Axk, ws.l, ws.u), 0.0)
                           + jnp.maximum(jnp.clip(Axk, ws.l, ws.u) - Axk,
                                         0.0))
            score = viol * 1e6 + jnp.max(jnp.abs(statk)) + jnp.abs(phi_k)
            better = jnp.isfinite(score) & (score < c.score_best)
            x_best = jnp.where(better, xk, c.x_best)
            y_best = jnp.where(better, c.yk, c.y_best)
            score_best = jnp.where(better, score, c.score_best)
        else:
            x_best, y_best, score_best = c.x_best, c.y_best, c.score_best

        # 3./4. printIteration / storeSteps at index `total` (:485-490).
        # Column layout, header cadence and level gating replicate
        # printIteration/printHeader (src/LCQProblem.cpp:1528-1637): INNER
        # prints every pass with a header every 10 inner iterations; OUTER
        # prints only rows where innerIter == 0 (the pass right after a
        # penalty update) with a header every 10 outer iterations.
        # Backends without host-callback support (the tunneled-TPU
        # transport) would crash AT RUN TIME on jax.debug.print; degrade to
        # silent there (warning emitted once at trace time).
        print_level = options.print_level
        if print_level > PrintLevel.NONE and not _config.supports_debug_print():
            import warnings
            warnings.warn(
                "iteration printing disabled: this backend does not support "
                "host callbacks (jax.debug.print)", stacklevel=2)
            print_level = PrintLevel.NONE
        if print_level == PrintLevel.INNER_LOOP_ITERATES:
            _hline = ("------+-------+------------+------------+------------"
                      "+------------+------------+-------")
            lax.cond(
                c.inner % 10 == 0,
                lambda: jax.debug.print(
                    _hline + "\n outer | inner |  station   |  complem   |"
                    "    rho     |   norm p   |   alpha    | sub it\n"
                    + _hline),
                lambda: None)
            jax.debug.print(
                "{:6d} | {:5d} | {:10.3e} | {:10.3e} | {:10.3e} | "
                "{:10.3e} | {:10.3e} | {:6d}",
                c.outer, c.inner, jnp.max(jnp.abs(statk)), phi_k, c.rho,
                jnp.max(jnp.abs(c.pk)), c.alphak, c.qp_iter_k)
        elif print_level == PrintLevel.OUTER_LOOP_ITERATES:
            _hline = ("------+------------+------------+------------"
                      "+------------")
            is_outer_row = c.inner == 0
            lax.cond(
                is_outer_row & (c.outer % 10 == 0),
                lambda: jax.debug.print(
                    _hline + "\n outer |  station   |  complem   |"
                    "    rho     |   norm p\n" + _hline),
                lambda: None)
            lax.cond(
                is_outer_row,
                lambda: jax.debug.print(
                    "{:6d} | {:10.3e} | {:10.3e} | {:10.3e} | {:10.3e}",
                    c.outer, jnp.max(jnp.abs(statk)), phi_k, c.rho,
                    jnp.max(jnp.abs(c.pk))),
                lambda: None)
        if store:
            t = c.traj
            idx = c.total
            traj = Trajectories(
                x_steps=t.x_steps.at[idx].set(xk),
                inner_iters=t.inner_iters.at[idx].set(c.inner),
                subproblem_iters=t.subproblem_iters.at[idx].set(c.qp_iter_k),
                accu_subproblem_iters=t.accu_subproblem_iters.at[idx].set(
                    c.sub_iters),
                step_length=t.step_length.at[idx].set(c.alphak),
                step_size=t.step_size.at[idx].set(jnp.max(jnp.abs(c.pk))),
                stat_vals=t.stat_vals.at[idx].set(jnp.max(jnp.abs(statk))),
                obj_vals=t.obj_vals.at[idx].set(_obj(data, xk)),
                phi_vals=t.phi_vals.at[idx].set(phi_k),
                merit_vals=t.merit_vals.at[idx].set(_merit(data, xk, c.rho)),
            )
        else:
            traj = c.traj

        # 5. counters (:493-496)
        total = c.total + 1
        inner = c.inner + 1

        # 6. Leyffer dynamic penalty (:499-505, :1275-1313)
        rho, g_tilde = c.rho, c.g_tilde
        outer = c.outer
        hist, hist_n = c.hist, c.hist_n
        if options.n_dynamic_penalty > 0:
            nh = options.n_dynamic_penalty
            warmup = hist_n < nh
            compl_ok_now = phi_k < compl_tol
            progress = jnp.any(phi_k < options.eta_dynamic_penalty * hist) \
                & ~warmup
            fired = ~warmup & ~compl_ok_now & ~progress
            # push: append while warming up, else ring-shift.
            hist_push = jnp.where(
                warmup,
                hist.at[jnp.clip(hist_n, 0, nh - 1)].set(phi_k),
                jnp.roll(hist, -1).at[nh - 1].set(phi_k))
            hist_n_push = jnp.minimum(hist_n + 1, nh)
            # updatePenalty clears the history (:1200-1202).
            hist = jnp.where(fired, jnp.zeros_like(hist), hist_push)
            hist_n = jnp.where(fired, 0, hist_n_push)
            rho = jnp.where(fired, rho * beta, rho)
            g_tilde = jnp.where(fired, data.g + rho * data.g_phi, g_tilde)
            outer = outer + jnp.where(fired, 1, 0).astype(jnp.int32)
            inner = jnp.where(fired, 0, inner).astype(jnp.int32)

        # 7. updateLinearization #1 (:508)
        gk = rho * (data.C @ xk) + g_tilde

        # 8. termination / penalty branch (:511-534).  Note: statk is the
        #    (possibly stale w.r.t. this pass's Leyffer update) top-of-pass
        #    value — replicated.
        stat_ok = jnp.max(jnp.abs(statk)) < stat_tol
        compl_ok = phi_k < compl_tol
        converged = stat_ok & compl_ok

        # transformDuals (:1381-1409) on the converged duals.
        yk = c.yk
        yL = yk[nC:nC + nK] - rho * (data.R @ xk)
        yR = yk[nC + nK:m0] - rho * (data.L @ xk)
        yk_conv = yk.at[nC:nC + nK].set(yL).at[nC + nK:m0].set(yR)
        algo_conv = _determine_stationarity(data, xk, yL, yR, compl_tol)
        yk = jnp.where(converged, yk_conv, yk)
        algo = jnp.where(converged, algo_conv, c.algo).astype(jnp.int32)
        done = converged
        ret = jnp.where(converged,
                        int(ReturnValue.SUCCESSFUL_RETURN), c.ret)

        # stationary but not complementary -> penalty update (:528-533)
        pen2 = stat_ok & ~compl_ok
        rho = jnp.where(pen2, rho * beta, rho)
        g_tilde = jnp.where(pen2, data.g + rho * data.g_phi, g_tilde)
        outer = outer + jnp.where(pen2, 1, 0).astype(jnp.int32)
        inner = jnp.where(pen2, 0, inner).astype(jnp.int32)
        if options.n_dynamic_penalty > 0:
            hist = jnp.where(pen2, jnp.zeros_like(hist), hist)
            hist_n = jnp.where(pen2, 0, hist_n).astype(jnp.int32)

        # 9./10. failure terminations (:537-542)
        hit_iter = ~done & (total > options.max_iterations)
        ret = jnp.where(hit_iter, int(ReturnValue.MAX_ITERATIONS_REACHED), ret)
        done = done | hit_iter
        hit_rho = ~done & (rho > options.max_penalty_parameter)
        ret = jnp.where(hit_rho, int(ReturnValue.MAX_PENALTY_REACHED), ret)
        done = done | hit_rho

        # 11.-14. next-step computation (:545-558), skipped once done.
        def continue_branch(args):
            xk, yk, st, gk, g_tilde, rho, key, sub_iters = args
            # updateLinearization #2 (:545) — reflects any rho change above.
            gk = rho * (data.C @ xk) + g_tilde
            res = inner_solve(ws, gk, st, cfg)
            # Never step onto a non-finite inner result (belt to the ADMM
            # engine's own breakdown guard): hold position instead — and
            # keep the PREVIOUS warm-start state too, or the poisoned state
            # would seed every later inner solve with NaN.
            pt_ok = jnp.all(jnp.isfinite(res.x)) & jnp.all(jnp.isfinite(res.y))
            xnew = jnp.where(pt_ok, res.x, xk)
            yk_new = jnp.where(pt_ok, -res.y, yk)
            st_next = jax.tree.map(lambda a, b: jnp.where(pt_ok, a, b),
                                   res.state, st)
            pk = xnew - xk
            qp_fail = qp_failed(res.status)
            # perturbStep (:554-555, :1353-1362).  The reference perturbs by
            # +/-EPS (f64 machine eps); the dtype-relative generalization
            # keeps the escape-from-saddle mechanism alive in float32, where
            # +/-2.2e-16 would round to a no-op.
            key, sub = jax.random.split(key)
            if options.perturb_step:
                r = jax.random.randint(sub, (n,), -1, 2).astype(dtype)
                xk = xk + r * jnp.finfo(dtype).eps
            # getOptimalStepLength (:558, :1217-1237)
            qk_val = pk @ Qk_mv(rho, pk)
            lk_val = pk @ (Qk_mv(rho, xk) + g_tilde)
            alphak = jnp.where((qk_val > 0) & (lk_val < 0),
                               jnp.minimum(-lk_val / qk_val, 1.0),
                               1.0).astype(dtype)
            return (xk, yk_new, pk, alphak, st_next, key,
                    sub_iters + res.iterations, res.status,
                    res.iterations, qp_fail)

        def done_branch(args):
            xk, yk, st, gk, g_tilde, rho, key, sub_iters = args
            return (xk, yk, c.pk, c.alphak, st, key, sub_iters,
                    c.qp_flag, c.qp_iter_k, jnp.asarray(False))

        (xk, yk_next, pk, alphak, st, key, sub_iters, qp_flag, qp_iter_k,
         qp_fail) = lax.cond(done, done_branch, continue_branch,
                             (xk, yk, c.st, gk, g_tilde, rho, c.key,
                              c.sub_iters))
        yk = jnp.where(done, yk, yk_next)
        ret = jnp.where(qp_fail, int(ReturnValue.SUBPROBLEM_SOLVER_ERROR), ret)
        done = done | qp_fail

        # Persistent inner-failure hand-off (tolerant mode only): a run of
        # budget-exhausted inner solves WHILE the stationarity residual is
        # blowing up means every further pass steps on garbage — the
        # measured failure mode: stat 1e1 -> 1e5 over ~70 passes while the
        # iterate collapsed to the origin (perturbed-circle lane 8).  Stop
        # the homotopy at the last sane iterate instead; in the mixed
        # pipeline the df32 corrector continues from it (its KKT solves do
        # not go through the inner ADMM), and standalone callers see an
        # honest MAX_ITERATIONS_REACHED.  BOTH degradation terms are
        # essential: benign exhaustion runs where the homotopy still
        # converges must NOT hand off — the OCP workload runs at the full
        # inner budget on EVERY pass with stationarity fluctuating 100x
        # while phi falls monotonically 21 -> 0.6, so only the combination
        # "stationarity blew up AND complementarity stopped improving"
        # separates collapse from hard-but-healthy progress.  Non-tolerant
        # mode (the reference contract) aborts on the FIRST exhaustion.
        if options.tolerate_inner_maxiter:
            exhausted = qp_flag == admm.ADMM_MAX_ITER
            stat_now = jnp.max(jnp.abs(statk))
            abs_phi = jnp.abs(phi_k)
            streak_started = exhausted & (c.qp_streak == 0)
            qp_streak = jnp.where(
                done, c.qp_streak,
                jnp.where(exhausted, c.qp_streak + 1, 0)).astype(jnp.int32)
            inf_ = jnp.asarray(jnp.inf, dtype)
            streak_stat0 = jnp.where(
                done, c.streak_stat0,
                jnp.where(streak_started, stat_now,
                          jnp.where(exhausted, c.streak_stat0, inf_)))
            streak_phi0 = jnp.where(
                done, c.streak_phi0,
                jnp.where(streak_started, abs_phi,
                          jnp.where(exhausted, c.streak_phi0, inf_)))
            stall = ~done & (qp_streak >= 3) \
                & (stat_now > 10.0 * jnp.maximum(streak_stat0, stat_tol)) \
                & (abs_phi >= 0.9 * streak_phi0)
            ret = jnp.where(stall, int(ReturnValue.MAX_ITERATIONS_REACHED),
                            ret)
            done = done | stall
        else:
            qp_streak = c.qp_streak
            streak_stat0 = c.streak_stat0
            streak_phi0 = c.streak_phi0

        return _Carry(xk=xk, yk=yk, pk=pk, statk=statk, gk=gk,
                      g_tilde=g_tilde, rho=rho, alphak=alphak, st=st,
                      hist=hist, hist_n=hist_n, inner=inner, outer=outer,
                      total=total, sub_iters=sub_iters, qp_flag=qp_flag,
                      qp_iter_k=qp_iter_k, done=done, qp_streak=qp_streak,
                      streak_stat0=streak_stat0, streak_phi0=streak_phi0,
                      ret=ret.astype(jnp.int32), algo=algo, key=key,
                      traj=traj, x_best=x_best, y_best=y_best,
                      score_best=score_best)

    final = lax.while_loop(lambda c: ~c.done, body, carry0)

    # On an iteration-budget failure hand over the BEST tracked iterate, not
    # the final one: an f32 collapse (see _Carry.x_best) otherwise feeds the
    # mixed pipeline's corrector garbage it rightly refuses to certify.
    # MAX_PENALTY / SUBPROBLEM failures keep the reference's final-iterate
    # contract (src/LCQProblem.cpp runSolver exit paths) — those exits carry
    # diagnostic meaning in the final point.
    if options.keep_best_iterate:
        swap = (final.ret == int(ReturnValue.MAX_ITERATIONS_REACHED)) \
            & jnp.isfinite(final.score_best)
        final = dataclasses.replace(
            final,
            xk=jnp.where(swap, final.x_best, final.xk),
            yk=jnp.where(swap, final.y_best, final.yk))

    # Assemble the mode-dependent dual layout (src/LCQProblem.cpp:888-960).
    y_A_full = final.yk[:m0]
    y_box = final.yk[m0:]
    if options.uses_box_duals:
        y_out = jnp.concatenate([y_box, y_A_full])
    else:
        y_out = y_A_full

    stats = Stats(
        iter_total=final.total,
        iter_outer=final.outer,
        subproblem_iter=final.sub_iters,
        rho_opt=final.rho,
        solution_status=final.algo,
        qp_exit_flag=final.qp_flag,
        trajectories=final.traj,
    )
    return Solution(x=final.xk, y=y_out, ret=final.ret,
                    algo_status=final.algo, stats=stats)
