"""Mixed-precision (f32 predictor + f64 corrector) solve tests.

The contract: :func:`lcqpow_tpu.solve_mixed` must reproduce the pure-f64
solver's certified answers — solutions within the reference-default
stationarity/complementarity tolerances (``/root/reference/src/Options.cpp:
297-298``) — while running its homotopy in float32.
"""

import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu.problems import random_lcqp, warm_up

OPTS = lt.Options(print_level=lt.PrintLevel.NONE)


def test_mixed_warm_up_matches_f64():
    sol = lt.solve_mixed(warm_up(), OPTS)
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.asarray(sol.x)
    assert sol.x.dtype == np.float64
    xs = np.sort(x)
    np.testing.assert_allclose(xs, [0., 1.], atol=1e-10)
    # f64 certificate: the stationarity residual of the warm-up problem.
    y = np.asarray(sol.y)
    assert abs(2 * x[0] - 2 - y[0] - y[2]) <= OPTS.stationarity_tolerance
    assert abs(2 * x[1] - 2 - y[1] - y[3]) <= OPTS.stationarity_tolerance
    assert int(sol.algo_status) == lt.AlgorithmStatus.S_STATIONARY_SOLUTION


def test_mixed_random_family_certified():
    for seed in range(4):
        data = random_lcqp(seed, nV=6, nC=2, nComp=2)
        sol = lt.solve_mixed(data, OPTS)
        assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN, seed
        x = np.asarray(sol.x)
        phi = (np.asarray(data.L) @ x) @ (np.asarray(data.R) @ x)
        assert abs(phi) < OPTS.complementarity_tolerance * 10, (seed, phi)


def test_mixed_agrees_with_f64_solver():
    # Same problem, both paths: the solutions must agree to f64 accuracy
    # (they follow the same homotopy; the landing point of this strictly
    # convex instance is unique per branch).
    data = random_lcqp(11, nV=6, nC=1, nComp=2)
    s64 = lt.solve(data, OPTS)
    smx = lt.solve_mixed(data, OPTS)
    assert int(s64.ret) == int(smx.ret) == 0
    np.testing.assert_allclose(np.asarray(smx.x), np.asarray(s64.x),
                               atol=5e-8)


def test_mixed_batch():
    problems = [random_lcqp(s, nV=6, nC=2, nComp=2) for s in range(8)]
    batch = lt.stack_lcqps(problems)
    sol = lt.solve_batch_mixed(batch, OPTS)
    ok = np.asarray(sol.ret) == 0
    assert ok.all(), np.asarray(sol.ret)
    assert sol.x.shape == (8, 6)


def test_mixed_failure_propagates():
    # maxPenaltyParameter=1 must still fail (test_max_penalty semantics).
    sol = lt.solve_mixed(warm_up(), OPTS.replace(max_penalty_parameter=1.0),
                         x0=np.array([1., 1.]))
    assert int(sol.ret) == lt.ReturnValue.MAX_PENALTY_REACHED
