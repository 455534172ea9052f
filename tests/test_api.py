"""Tests for the one-call API, the mex-style params map, and the ADMM_TPU
mode — the scenarios of the reference's option-sweep example tests:

* ``/root/reference/test/examples/warm_up_OSQP_options.cpp:56-63``
  (OSQP sub-option passthrough)
* ``/root/reference/test/examples/warm_up_qpOASES_options.cpp:54-60``
  (qpOASES sub-option passthrough)
* ``/root/reference/test/warm_up_shifted.cpp:30-46`` (shifted bounds
  lbL = lbR = 1 — the scenario that stresses the g_tilde quirk)
* ``/root/reference/test/examples/test_max_penalty.cpp:49,75-79``
  (maxPenaltyParameter forces MAX_PENALTY_REACHED)
* ``/root/reference/interfaces/matlab/LCQPow.cpp:679-854`` (params parsing
  incl. x0/y0)
"""

import numpy as np
import pytest

import lcqpow_tpu as lt
from lcqpow_tpu.api import lcqpow, options_from_params

WARM_UP = dict(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
               L=[[1., 0.]], R=[[0., 1.]])
S_POINTS = np.array([[1., 0.], [0., 1.]])


def assert_warmup_solution(x, atol=1e-8):
    d = np.min(np.max(np.abs(S_POINTS - np.asarray(x)[None, :]), axis=1))
    assert d < atol, x


def test_one_call_basic():
    x, y, stats = lcqpow(**WARM_UP, params={"printLevel": 0})
    assert_warmup_solution(x)
    assert stats["exit_flag"] == int(lt.ReturnValue.SUCCESSFUL_RETURN)
    assert stats["solution_type"] == int(
        lt.AlgorithmStatus.S_STATIONARY_SOLUTION)
    for k in ("iters_total", "iters_outer", "iters_subproblem", "rho_opt",
              "elapsed_time", "exit_flag", "solution_type", "qp_exit_flag"):
        assert k in stats, k
    # qpOASES-parity default mode: duals are [box(nV); L; R].
    assert y.shape == (2 + 2,)


def test_osqp_options_passthrough():
    """warm_up_OSQP_options.cpp: OSQP settings dict + OSQP_SPARSE mode +
    x0 in params."""
    x, y, stats = lcqpow(
        **WARM_UP,
        params={"printLevel": 0, "qpSolver": 2, "x0": [1.0, 1.0],
                "OSQP_options": {"verbose": False, "polish": True,
                                 "eps_abs": 1e-7, "max_iter": 2000}})
    assert_warmup_solution(x)
    assert stats["exit_flag"] == 0
    # OSQP-parity mode: no box-dual block.
    assert y.shape == (2,)


def test_osqp_options_reach_admm_config():
    opts, _, _ = options_from_params(
        {"OSQP_options": {"eps_abs": 3e-7, "max_iter": 1234,
                          "verbose": True}})
    assert opts.admm.eps_abs == 3e-7
    assert opts.admm.max_iter == 1234


def test_qpoases_options_accepted():
    """warm_up_qpOASES_options.cpp: a qpOASES options dict is accepted (its
    knobs are print-level things with no TPU counterpart) and the solve runs
    in a qpOASES-parity mode with x0/y0 from params."""
    x, y, stats = lcqpow(
        **WARM_UP,
        params={"printLevel": 0, "qpSolver": 1,
                "x0": [1.0, 1.0], "y0": [0.0, 0.0, 0.0, 0.0],
                "qpOASES_options": {"printLevel": 5}})
    assert_warmup_solution(x)
    assert stats["exit_flag"] == 0
    assert y.shape == (4,)


def test_unknown_param_raises():
    with pytest.raises(KeyError):
        options_from_params({"definitelyNotAKnob": 1})


def test_suboption_disposition_complete():
    """Every OSQP/qpOASES sub-option the reference mex accepts
    (interfaces/matlab/LCQPow.cpp:347-482 qpOASES, :488-565 OSQP) has an
    explicit disposition: mapped to an ADMMOptions field or documented as
    ignored; anything outside the known sets fails loudly."""
    import dataclasses
    from lcqpow_tpu.api import (_OSQP_FIELD_MAP, _OSQP_FIELDS_IGNORED,
                                _QPOASES_FIELDS_IGNORED)
    from lcqpow_tpu.options import ADMMOptions

    osqp_22 = {"rho", "sigma", "alpha", "eps_abs", "eps_rel", "eps_prim_inf",
               "eps_dual_inf", "max_iter", "polish", "polish_refine_iter",
               "delta", "adaptive_rho", "adaptive_rho_tolerance",
               "adaptive_rho_interval", "adaptive_rho_fraction",
               "check_termination", "scaled_termination", "scaling",
               "linsys_solver", "time_limit", "verbose", "warm_start"}
    covered = set(_OSQP_FIELD_MAP) | set(_OSQP_FIELDS_IGNORED)
    assert covered == osqp_22, covered ^ osqp_22
    # Mapped targets must be real ADMMOptions fields.
    admm_fields = {f.name for f in dataclasses.fields(ADMMOptions)}
    assert set(_OSQP_FIELD_MAP.values()) <= admm_fields
    assert len(_QPOASES_FIELDS_IGNORED) == 29
    # Mapped fields actually land.
    opts, _, _ = options_from_params(
        {"OSQP_options": {"delta": 1e-7, "check_termination": 10,
                          "adaptive_rho": True, "scaling": 10}})
    assert opts.admm.polish_delta == 1e-7
    assert opts.admm.check_interval == 10
    assert opts.admm.adaptive_rho is True
    # Unknown sub-keys raise.
    with pytest.raises(KeyError):
        options_from_params({"OSQP_options": {"not_a_field": 1}})
    with pytest.raises(KeyError):
        options_from_params({"qpOASES_options": {"notAKnob": 1}})


def test_params_x0_steers_solution():
    # With solveZeroPenaltyFirst the initial QP ignores x0 (it may jump to
    # either S-point); disabling it makes the steering deterministic.
    x1, _, _ = lcqpow(**WARM_UP, params={"printLevel": 0,
                                         "solveZeroPenaltyFirst": False,
                                         "x0": [2.0, 0.0]})
    x2, _, _ = lcqpow(**WARM_UP, params={"printLevel": 0,
                                         "solveZeroPenaltyFirst": False,
                                         "x0": [0.0, 2.0]})
    np.testing.assert_allclose(x1, [1., 0.], atol=1e-8)
    np.testing.assert_allclose(x2, [0., 1.], atol=1e-8)


def test_warm_up_shifted():
    """warm_up_shifted.cpp: g = (-4,-4), lbL = lbR = 1 (shifted
    complementarity (x1-1) ⟂ (x2-1)); solutions (2,1)/(1,2)."""
    x, y, stats = lcqpow(
        Q=[[2., 0.], [0., 2.]], g=[-4., -4.],
        L=[[1., 0.]], R=[[0., 1.]], lbL=[1.0], lbR=[1.0],
        params={"printLevel": 0, "qpSolver": 2,
                "x0": [1.0, 1.0], "y0": [0.0, 0.0, 0.0, 0.0]})
    assert stats["exit_flag"] == 0
    pts = np.array([[2., 1.], [1., 2.]])
    d = np.min(np.max(np.abs(pts - x[None, :]), axis=1))
    assert d < 1e-7, x
    # Complementarity in the shifted sense.
    assert abs((x[0] - 1.0) * (x[1] - 1.0)) < 1e-10


def test_max_rho_alias_forces_failure():
    """test_max_penalty.cpp: maxPenaltyParameter = 1 must fail with
    MAX_PENALTY_REACHED (both the canonical name and the maxRho alias)."""
    for key in ("maxPenaltyParameter", "maxRho"):
        x, y, stats = lcqpow(**WARM_UP,
                             params={"printLevel": 0, key: 1.0,
                                     "x0": [1.0, 1.0]})
        assert stats["exit_flag"] == int(lt.ReturnValue.MAX_PENALTY_REACHED)


def test_store_steps_trajectories():
    x, y, stats = lcqpow(**WARM_UP, params={"printLevel": 0,
                                            "storeSteps": True})
    T = stats["iters_total"]
    for k in ("xSteps", "innerIters", "subproblemIters",
              "accuSubproblemIters", "stepLength", "stepSize", "statVals",
              "objVals", "phiVals", "meritVals"):
        assert k in stats, k
        assert stats[k].shape[0] == T, (k, stats[k].shape, T)
    assert np.all(np.isfinite(stats["xSteps"]))
    # The reference mex bug (xSteps clobbering qp_exit_flag,
    # LCQPow.cpp:1014,1069) is NOT replicated:
    assert isinstance(stats["qp_exit_flag"], int)


def test_admm_tpu_mode_with_box_constraints():
    """QPSolver.ADMM_TPU: OSQP-style dual layout but box constraints are
    supported (capability extension; the reference's OSQP mode rejects
    boxes, src/LCQProblem.cpp:929-957)."""
    data = lt.make_lcqp(**WARM_UP, lb=[-1.0, -1.0], ub=[0.75, 2.0])
    opts = lt.Options(print_level=lt.PrintLevel.NONE,
                      qp_solver=lt.QPSolver.ADMM_TPU)
    sol = lt.solve(data, opts)
    assert int(sol.ret) == 0
    x = np.asarray(sol.x)
    assert np.all(x <= np.array([0.75, 2.0]) + 1e-10)
    assert np.all(x >= -1.0 - 1e-10)
    assert abs(x[0] * x[1]) < 1e-10          # complementarity
    # OSQP-style dual layout: no box block.
    assert sol.y.shape == (2,)


def test_admm_tpu_via_compat_object():
    """The object API accepts ADMM_TPU without the sparse-mode protocol and
    with box constraints."""
    from lcqpow_tpu.compat import LCQProblem

    lcqp = LCQProblem(2, 0, 1)
    lcqp.set_options(lt.Options(print_level=lt.PrintLevel.NONE,
                                qp_solver=lt.QPSolver.ADMM_TPU))
    ret = lcqp.load_lcqp(**WARM_UP, lb=[0.0, 0.0], ub=[10.0, 10.0])
    assert ret == lt.ReturnValue.SUCCESSFUL_RETURN
    ret = lcqp.run_solver()
    assert ret == lt.ReturnValue.SUCCESSFUL_RETURN
    assert_warmup_solution(lcqp.get_primal_solution())


def test_one_call_mixed_pipeline():
    x, y, stats = lcqpow(**WARM_UP, params={"printLevel": 0}, mixed=True)
    assert stats["exit_flag"] == 0
    assert_warmup_solution(x, atol=1e-9)
