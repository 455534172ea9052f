"""End-to-end solver tests on the warm-up problem family.

Mirrors the reference's gtest suite and option-sweep example tests
(SURVEY.md §4): ``SolverTest.RunWarmUp``
(``/root/reference/test/RunUnitTests.cpp:505-551``), the ``test/examples/``
variants (with-A, binary/shifted bounds, store-steps, max-penalty failure,
OSQP mode) and ``OutputStatisticsTest.CheckQPReturnFlag`` (``:463-502``).
"""

import numpy as np
import pytest

import lcqpow_tpu as lt


def warm_up_data():
    # examples/warm_up.cpp:32-42: Q=2I, g=(-2,-2), x1 ⟂ x2.
    return lt.make_lcqp(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
                        L=[[1., 0.]], R=[[0., 1.]])


OPTS = lt.Options(print_level=lt.PrintLevel.NONE)


@pytest.mark.tpu_smoke
def test_run_warm_up():
    """RunWarmUp: repeated solves land on one of the two S-stationary points
    and satisfy the LCQP stationarity residual (RunUnitTests.cpp:528-547).
    The reference repeats 100x against srand(time) nondeterminism; here the
    perturbation PRNG is explicit, so distinct seeds play that role."""
    data = warm_up_data()
    tol = OPTS.stationarity_tolerance
    for seed in range(10):
        sol = lt.solve(data, OPTS.replace(seed=seed))
        assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
        x = np.asarray(sol.x)
        y = np.asarray(sol.y)  # [y_box(2); y_L; y_R]
        s1 = abs(x[0] - 1) <= tol and abs(x[1]) <= tol
        s2 = abs(x[1] - 1) <= tol and abs(x[0]) <= tol
        assert s1 or s2, f"seed {seed}: x={x}"
        assert abs(2 * x[0] - 2 - y[0] - y[2]) <= tol
        assert abs(2 * x[1] - 2 - y[1] - y[3]) <= tol
        assert int(sol.algo_status) == lt.AlgorithmStatus.S_STATIONARY_SOLUTION


def test_warm_up_with_initial_guess():
    # examples/warm_up.cpp:37-38 passes x0=(1,1), y0=0.
    sol = lt.solve(warm_up_data(), OPTS, x0=np.array([1., 1.]),
                   y0=np.zeros(4))
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.sort(np.asarray(sol.x))
    np.testing.assert_allclose(x, [0., 1.], atol=1e-8)


@pytest.mark.tpu_smoke
def test_warm_up_with_linear_constraint():
    # test/examples/warm_up_w_A.cpp:35-37: A=[1,-1], lbA=-0.5, ubA=inf.
    data = lt.make_lcqp(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
                        L=[[1., 0.]], R=[[0., 1.]],
                        A=[[1., -1.]], lbA=[-0.5], ubA=[np.inf])
    sol = lt.solve(data, OPTS)
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.asarray(sol.x)
    assert x[0] - x[1] >= -0.5 - 1e-9
    # Complementarity holds.
    assert abs(x[0] * x[1]) < OPTS.complementarity_tolerance * 10


def test_warm_up_binary_shifted_bounds():
    # test/examples/warm_up_binary.cpp:37-46: generalized complementarity
    #   0 <= x1 ⟂ x2 >= 0  and  0 <= x1 ⟂ 0.5 - x1 >= 0   (lbR = -0.5 on
    # R=[-1,0] row), i.e. x1 in {0, 0.5}.
    data = lt.make_lcqp(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
                        L=[[1., 0.], [1., 0.]], R=[[0., 1.], [-1., 0.]],
                        lbL=[0., 0.], lbR=[0., -0.5])
    sol = lt.solve(data, OPTS, x0=np.array([0., 0.]))
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.asarray(sol.x)
    # x1 must end on one of its two binary-feasible values.
    assert min(abs(x[0]), abs(x[0] - 0.5)) < 1e-6, x
    # phi at solution is (within tolerance) zero.
    phi = (x[0] - 0) * (x[1] - 0) + (x[0] - 0) * (-x[0] + 0.5)
    assert abs(phi) < 1e-6


@pytest.mark.tpu_smoke
def test_max_penalty_reached():
    # test/examples/test_max_penalty.cpp:49,75-79: with maxPenaltyParameter=1
    # the warm-up solve must FAIL with MAX_PENALTY_REACHED.
    sol = lt.solve(warm_up_data(),
                   OPTS.replace(max_penalty_parameter=1.0),
                   x0=np.array([1., 1.]), y0=np.zeros(4))
    assert int(sol.ret) == lt.ReturnValue.MAX_PENALTY_REACHED


def test_infeasible_qp_reports_solver_error():
    # RunUnitTests.cpp:463-502: contradictory bounds on the A row =>
    # SUBPROBLEM_SOLVER_ERROR and a nonzero qp exit flag in the stats.
    data = lt.make_lcqp(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
                        L=[[1., 0.]], R=[[0., 1.]],
                        A=[[1., 0.]], lbA=[0.], ubA=[-1.])
    sol = lt.solve(data, OPTS)
    assert int(sol.ret) == lt.ReturnValue.SUBPROBLEM_SOLVER_ERROR
    assert int(sol.stats.qp_exit_flag) != 0


def test_store_steps_trajectories():
    # test/examples/warm_up_store_steps.cpp:49 + OutputStatistics tracking
    # vectors (include/OutputStatistics.hpp:217-226).
    sol = lt.solve(warm_up_data(), OPTS.replace(store_steps=True))
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    stats = sol.stats.trim()
    t = stats.trajectories
    n = int(stats.iter_total)
    assert t.x_steps.shape == (n, 2)
    assert np.all(np.isfinite(np.asarray(t.x_steps)))
    assert np.all(np.isfinite(np.asarray(t.phi_vals)))
    # phi at the last recorded iterate is complementarity-feasible.
    assert np.asarray(t.phi_vals)[-1] < OPTS.complementarity_tolerance
    # step lengths lie in (0, 1].
    sl = np.asarray(t.step_length)
    assert np.all((sl > 0) & (sl <= 1.0))


@pytest.mark.tpu_smoke
def test_osqp_mode_dual_layout():
    # OSQP mode: no box-dual block; nDuals = nC + 2*nComp
    # (src/LCQProblem.cpp:929-935), duals follow the same LCQPow sign
    # convention (OSQP duals negated, src/SubsolverOSQP.cpp:196-199).
    sol = lt.solve(warm_up_data(),
                   OPTS.replace(qp_solver=lt.QPSolver.OSQP_SPARSE))
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    assert sol.y.shape == (2,)
    x = np.sort(np.asarray(sol.x))
    np.testing.assert_allclose(x, [0., 1.], atol=1e-7)


def test_solve_without_zero_penalty_first():
    sol = lt.solve(warm_up_data(),
                   OPTS.replace(solve_zero_penalty_first=False))
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.sort(np.asarray(sol.x))
    np.testing.assert_allclose(x, [0., 1.], atol=1e-7)


def test_compat_object_api_and_mode_protocol():
    # LoadDataTest.DenseToSparse (RunUnitTests.cpp:413-460): load dense,
    # switch modes, solve with sparse and dense enums.
    Q = [[2., 0.], [0., 2.]]
    lcqp = lt.LCQProblem(2, 0, 1)
    lcqp.set_options(OPTS.replace(qp_solver=lt.QPSolver.QPOASES_SPARSE))
    ret = lcqp.load_lcqp(Q, [-2., -2.], [[1., 0.]], [[0., 1.]])
    assert ret == lt.ReturnValue.SUCCESSFUL_RETURN
    # sparse enum without switching -> protocol error
    assert lcqp.run_solver() == lt.ReturnValue.DENSE_SPARSE_MISSMATCH
    assert lcqp.switch_to_sparse_mode() == lt.ReturnValue.SUCCESSFUL_RETURN
    assert lcqp.run_solver() == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.sort(lcqp.get_primal_solution())
    np.testing.assert_allclose(x, [0., 1.], atol=1e-7)
    assert lcqp.get_number_of_duals() == 2 + 0 + 2
    # back to dense
    assert lcqp.switch_to_dense_mode() == lt.ReturnValue.SUCCESSFUL_RETURN
    lcqp.set_options(OPTS.replace(qp_solver=lt.QPSolver.QPOASES_DENSE))
    assert lcqp.run_solver() == lt.ReturnValue.SUCCESSFUL_RETURN
    stats = lcqp.get_output_statistics()
    assert int(stats.iter_total) > 0
    assert float(stats.rho_opt) > 0


def test_compat_osqp_rejects_box():
    # initializeSolver :929-957 rejects box constraints in OSQP mode.
    lcqp = lt.LCQProblem(2, 0, 1)
    lcqp.set_options(OPTS.replace(qp_solver=lt.QPSolver.OSQP_SPARSE))
    ret = lcqp.load_lcqp([[2., 0.], [0., 2.]], [-2., -2.],
                         [[1., 0.]], [[0., 1.]],
                         lb=[0., 0.], ub=[10., 10.])
    assert ret == lt.ReturnValue.SUCCESSFUL_RETURN
    lcqp.switch_to_sparse_mode()
    assert lcqp.run_solver() == lt.ReturnValue.INVALID_OSQP_BOX_CONSTRAINTS


def test_invalid_lower_complementarity_bound():
    # src/LCQProblem.cpp:747-768 rejects -inf lower complementarity bounds.
    with pytest.raises(lt.LCQPError):
        lt.make_lcqp(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
                     L=[[1., 0.]], R=[[0., 1.]], lbL=[-np.inf])


def test_invalid_objective_linear_term():
    # The reference rejects an unusable objective linear term at load
    # (INVALID_OBJECTIVE_LINEAR_TERM, src/LCQProblem.cpp:104-109); the
    # dense analogue is a non-finite entry in g.
    with pytest.raises(lt.LCQPError) as ei:
        lt.make_lcqp(Q=[[2., 0.], [0., 2.]], g=[np.nan, -2.],
                     L=[[1., 0.]], R=[[0., 1.]])
    assert ei.value.code == lt.ReturnValue.INVALID_OBJECTIVE_LINEAR_TERM


def test_invalid_hessian_entries():
    # Reference analogue of rejecting a null Hessian (src/LCQProblem.cpp:98-102).
    with pytest.raises(lt.LCQPError) as ei:
        lt.make_lcqp(Q=[[np.inf, 0.], [0., 2.]], g=[-2., -2.],
                     L=[[1., 0.]], R=[[0., 1.]])
    assert ei.value.code == lt.ReturnValue.INVALID_ARGUMENT


def test_box_constrained_warm_up():
    # Box constraints are handled by qpOASES-parity modes
    # (setLB/setUB, LCQProblem.ipp:54-112).  Cap x <= 0.7.
    data = lt.make_lcqp(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
                        L=[[1., 0.]], R=[[0., 1.]],
                        lb=[-1., -1.], ub=[0.7, 0.7])
    sol = lt.solve(data, OPTS)
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.sort(np.asarray(sol.x))
    np.testing.assert_allclose(x, [0., 0.7], atol=1e-7)
    # Box dual of the capped coordinate appears in the box block and renders
    # the point stationary: 2x - 2 - y_box - y_compl = 0.
    y = np.asarray(sol.y)
    x = np.asarray(sol.x)
    assert abs(2 * x[0] - 2 - y[0] - y[2]) <= 1e-7
    assert abs(2 * x[1] - 2 - y[1] - y[3]) <= 1e-7
