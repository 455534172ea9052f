"""One-call solve API (parity with the reference's MATLAB mex entry).

The reference's MATLAB interface is a single function

    [x, y, stats] = LCQPow(Q, g, L, R, lbL, ubL, lbR, ubR, {A, lbA, ubA},
                           {lb, ub}, {params})

(``/root/reference/interfaces/matlab/LCQPow.m:30-38``; mex implementation
``interfaces/matlab/LCQPow.cpp:570-1092``).  There is no MATLAB on TPU, but
the calling convention is the most ergonomic way to fire off one solve, so
this module provides the same shape of entry point for Python:

    x, y, stats = lcqpow(Q, g, L, R, lbL, ubL, lbR, ubR,
                         A=A, lbA=lbA, ubA=ubA, params={"x0": x0, ...})

``params`` accepts the mex parameter names (camelCase, ``LCQPow.cpp:679-854``)
as well as this package's snake_case option names.  ``stats`` is a dict with
the mex stats-struct fields (``LCQPow.cpp:952-1092``): ``iters_total``,
``iters_outer``, ``iters_subproblem``, ``rho_opt``, ``elapsed_time``,
``exit_flag``, ``solution_type``, ``qp_exit_flag`` — plus the per-iterate
trajectory fields (``xSteps``, ``innerIters``, ``subproblemIters``,
``accuSubproblemIters``, ``stepLength``, ``stepSize``, ``statVals``,
``objVals``, ``phiVals``, ``meritVals``) when ``storeSteps`` is on.  Note the
reference mex has a field-indexing bug where ``xSteps`` clobbers
``qp_exit_flag`` (``LCQPow.cpp:1014,1069``) — not replicated.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import numpy as np

from .data import make_lcqp
from .options import ADMMOptions, Options
from .solver import solve
from .mixed import solve_mixed
from .types import PrintLevel, QPSolver

# mex param name (LCQPow.cpp:679-854) -> Options field.
_PARAM_MAP = {
    "stationarityTolerance": "stationarity_tolerance",
    "complementarityTolerance": "complementarity_tolerance",
    "initialPenaltyParameter": "initial_penalty_parameter",
    "penaltyUpdateFactor": "penalty_update_factor",
    "maxPenaltyParameter": "max_penalty_parameter",
    "maxRho": "max_penalty_parameter",
    "solveZeroPenaltyFirst": "solve_zero_penalty_first",
    "perturbStep": "perturb_step",
    "maxIterations": "max_iterations",
    "nDynamicPenalty": "n_dynamic_penalty",
    "etaDynamicPenalty": "eta_dynamic_penalty",
    "printLevel": "print_level",
    "storeSteps": "store_steps",
    "qpSolver": "qp_solver",
    "innerSolver": "inner_solver",  # TPU extension: engine strategy arg
    "seed": "seed",
}


# Disposition of every OSQP settings field the reference mex accepts
# (interfaces/matlab/LCQPow.cpp:488-565, 22 fields) on the TPU-native ADMM
# engine.  "Mapped" fields go to the named ADMMOptions field; "ignored"
# fields are structurally meaningless here (each with the reason) and are
# accepted silently for drop-in parity.  See README.md for the same table
# with the reference file:line citations.
_OSQP_FIELD_MAP = {
    # OSQP field        -> ADMMOptions field
    "rho": "rho",
    "sigma": "sigma",
    "alpha": "alpha",
    "eps_abs": "eps_abs",
    "eps_rel": "eps_rel",
    "eps_prim_inf": "eps_prim_inf",
    "eps_dual_inf": "eps_dual_inf",
    "max_iter": "max_iter",
    "polish": "polish",
    "polish_refine_iter": "polish_refine_iter",
    "delta": "polish_delta",             # OSQP's polish regularization
    "adaptive_rho": "adaptive_rho",
    "adaptive_rho_tolerance": "adaptive_rho_tolerance",
    "check_termination": "check_interval",
}
_OSQP_FIELDS_IGNORED = {
    "adaptive_rho_interval":  # we adapt at the check_termination cadence
        "rho adaptation runs at the check_interval cadence",
    "adaptive_rho_fraction":  # OSQP's is wall-clock-based
        "time-based adaptation has no meaning inside a lockstep jitted batch",
    "scaled_termination":
        "termination is always tested on unscaled residuals",
    "scaling":
        "Ruiz equilibration is always on (fixed sweep count)",
    "linsys_solver":
        "single matmul-only TPU KKT operator; no alternative backends",
    "time_limit":
        "no wall-clock branching inside compiled code",
    "verbose":
        "per-lane inner-iteration printing is meaningless in a batch",
    "warm_start":
        "warm starting is structural: ADMM state always carries across "
        "homotopy steps",
}

# The reference mex's qpOASES_options fields (LCQPow.cpp:347-482).  The
# qpOASES engine itself has no TPU counterpart — its role (machine-precision
# active-set solves with hotstarts) is played by the polish-first ADMM and
# the PAS engine — so ALL of these are accepted-but-ignored; unknown keys
# still fail loudly.
_QPOASES_FIELDS_IGNORED = frozenset({
    "printLevel", "enableRamping", "enableFarBounds", "enableFlippingBounds",
    "enableRegularisation", "enableFullLITests", "enableNZCTests",
    "enableDriftCorrection", "enableCholeskyRefactorisation",
    "enableEqualities", "terminationTolerance", "boundTolerance",
    "boundRelaxation", "epsNum", "epsDen", "maxPrimalJump", "maxDualJump",
    "initialRamping", "finalRamping", "initialFarBounds", "growFarBounds",
    "initialStatusBounds", "epsFlipping", "numRegularisationSteps",
    "epsRegularisation", "numRefinementSteps", "epsIterRef", "epsLITests",
    "epsNZCTests",
})


def options_from_params(params: Optional[dict]) -> Tuple[Options,
                                                         Optional[np.ndarray],
                                                         Optional[np.ndarray]]:
    """Build :class:`Options` from a mex-style ``params`` dict.

    Returns ``(options, x0, y0)`` — the reference passes the initial guess
    inside ``params`` too (``LCQPow.cpp:807-853``).  Unknown keys raise
    ``KeyError`` (the mex warns and ignores; failing loudly is safer for a
    Python API).  The nested ``OSQP_options`` dict configures the inner ADMM
    engine (role of the reference's OSQPSettings passthrough) with the
    complete per-field disposition in :data:`_OSQP_FIELD_MAP` /
    :data:`_OSQP_FIELDS_IGNORED`; the reference's ``qpOASES_options`` has no
    TPU counterpart — all its 29 mex-accepted fields are accepted-but-ignored
    (:data:`_QPOASES_FIELDS_IGNORED`), unknown keys raise.
    """
    params = dict(params or {})
    x0 = params.pop("x0", None)
    y0 = params.pop("y0", None)
    if x0 is not None:
        x0 = np.asarray(x0, np.float64).reshape(-1)
    if y0 is not None:
        y0 = np.asarray(y0, np.float64).reshape(-1)

    admm_kw = {}
    osqp_opts = params.pop("OSQP_options", None) or {}
    for k, v in osqp_opts.items():
        if k in _OSQP_FIELD_MAP:
            admm_kw[_OSQP_FIELD_MAP[k]] = v
        elif k not in _OSQP_FIELDS_IGNORED:
            raise KeyError(f"unknown OSQP_options field: {k!r}")
    for k in params.pop("qpOASES_options", None) or {}:
        if k not in _QPOASES_FIELDS_IGNORED:
            raise KeyError(f"unknown qpOASES_options field: {k!r}")

    kw = {}
    for k, v in params.items():
        field = _PARAM_MAP.get(k, k)
        if field == "print_level":
            v = PrintLevel(int(v))
        elif field == "qp_solver":
            v = QPSolver(int(v))
        if field not in {f.name for f in dataclasses.fields(Options)}:
            raise KeyError(f"unknown LCQPow parameter: {k!r}")
        kw[k if k == field else field] = v
    opts = Options(**kw)
    if admm_kw:
        opts = opts.replace(admm=dataclasses.replace(opts.admm, **admm_kw))
    return opts, x0, y0


def lcqpow(Q, g, L, R, lbL=None, ubL=None, lbR=None, ubR=None,
           A=None, lbA=None, ubA=None, lb=None, ub=None,
           params: Optional[dict] = None, *, mixed: bool = False):
    """Solve one LCQP with the mex calling convention; returns
    ``(x, y, stats_dict)``.  Set ``mixed=True`` for the mixed-precision
    pipeline (recommended on TPU hardware without native float64)."""
    opts, x0, y0 = options_from_params(params)
    data = make_lcqp(Q, g, L, R, lbL=lbL, ubL=ubL, lbR=lbR, ubR=ubR,
                     A=A, lbA=lbA, ubA=ubA, lb=lb, ub=ub)
    import jax
    base = solve_mixed if mixed else solve
    if x0 is None and y0 is None:
        fn, args = (lambda d: base(d, opts)), (data,)
    elif y0 is None:
        fn, args = (lambda d, a: base(d, opts, x0=a)), (data, x0)
    elif x0 is None:
        fn, args = (lambda d, b: base(d, opts, y0=b)), (data, y0)
    else:
        fn, args = (lambda d, a, b: base(d, opts, x0=a, y0=b)), (data, x0, y0)
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    t1 = time.perf_counter()
    sol = compiled(*args)
    sol.x.block_until_ready()
    t2 = time.perf_counter()

    stats = {
        "iters_total": int(sol.stats.iter_total),
        "iters_outer": int(sol.stats.iter_outer),
        "iters_subproblem": int(sol.stats.subproblem_iter),
        "rho_opt": float(sol.stats.rho_opt),
        # mex parity: total wall clock (interfaces/matlab/LCQPow.cpp:882-916);
        # the compile/solve split makes the stat meaningful vs the reference
        # (which has no compile stage): compare its runtime to
        # elapsed_time_solve.
        "elapsed_time": t2 - t0,
        "elapsed_time_compile": t1 - t0,
        "elapsed_time_solve": t2 - t1,
        "exit_flag": int(sol.ret),
        "solution_type": int(sol.algo_status),
        "qp_exit_flag": int(sol.stats.qp_exit_flag),
    }
    traj = sol.stats.trim().trajectories
    if traj is not None:
        stats.update({
            "xSteps": np.asarray(traj.x_steps),
            "innerIters": np.asarray(traj.inner_iters),
            "subproblemIters": np.asarray(traj.subproblem_iters),
            "accuSubproblemIters": np.asarray(traj.accu_subproblem_iters),
            "stepLength": np.asarray(traj.step_length),
            "stepSize": np.asarray(traj.step_size),
            "statVals": np.asarray(traj.stat_vals),
            "objVals": np.asarray(traj.obj_vals),
            "phiVals": np.asarray(traj.phi_vals),
            "meritVals": np.asarray(traj.merit_vals),
        })
    return np.asarray(sol.x), np.asarray(sol.y), stats


LCQPow = lcqpow  # reference-style name
