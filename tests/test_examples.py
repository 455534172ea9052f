"""Canonical-workload integration tests.

Mirrors the reference examples (SURVEY.md §6): ``OptimizeOnCircle``
(``/root/reference/examples/OptimizeOnCircle.cpp``) with its known
global/local solutions, and the file-loading path
(``examples/solve_lcqp_from_file.cpp``) exercised via a write/read round
trip plus — when the reference mount is present — the actual
``examples/example_data`` OCP instance (nV=151, nC=50, nComp=100).
"""

import os

import numpy as np
import pytest

import lcqpow_tpu as lt
from lcqpow_tpu import io
from lcqpow_tpu.problems import optimize_on_circle, warm_up, random_lcqp

REF_DATA = "/root/reference/examples/example_data"


def test_optimize_on_circle():
    data, x0 = optimize_on_circle(100)
    opts = lt.Options(print_level=lt.PrintLevel.NONE,
                      qp_solver=lt.QPSolver.OSQP_SPARSE,
                      stationarity_tolerance=1e-2)
    sol = lt.solve(data, opts, x0=x0)
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.asarray(sol.x)[:2]
    # OptimizeOnCircle.cpp:144-145: global ~(0.1811,-0.9835),
    # other local ~(0.9764,-0.2183).
    d_glob = np.linalg.norm(x - [0.1811, -0.9835])
    d_loc = np.linalg.norm(x - [0.9764, -0.2183])
    assert min(d_glob, d_loc) < 5e-3, x
    # Solution lies on the unit circle (within discretization).
    assert abs(np.linalg.norm(x) - 1.0) < 2e-3


def test_file_roundtrip(tmp_path):
    # Write a problem in the reference's txt format, reload, solve.
    d = str(tmp_path)
    data = warm_up()
    io.write_vector(os.path.join(d, "Q.txt"), np.asarray(data.Q).ravel())
    io.write_vector(os.path.join(d, "g.txt"), np.asarray(data.g))
    io.write_vector(os.path.join(d, "L.txt"), np.asarray(data.L).ravel())
    io.write_vector(os.path.join(d, "R.txt"), np.asarray(data.R).ravel())
    loaded = io.load_lcqp_from_files(d)
    np.testing.assert_allclose(np.asarray(loaded.Q), np.asarray(data.Q))
    np.testing.assert_allclose(np.asarray(loaded.C), np.asarray(data.C))
    sol = lt.solve(loaded, lt.Options(print_level=lt.PrintLevel.NONE))
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference example_data not mounted")
def test_solve_lcqp_from_reference_files():
    # examples/solve_lcqp_from_file.cpp:59-160 — the OCP instance
    # (nV=151, nC=50, nComp=100) must load and solve.
    data = io.load_lcqp_from_files(REF_DATA)
    assert (data.nV, data.nC, data.nComp) == (151, 50, 100)
    x0 = io.load_x0_from_files(REF_DATA)
    opts = lt.Options(print_level=lt.PrintLevel.NONE,
                      qp_solver=lt.QPSolver.QPOASES_SPARSE)
    sol = lt.solve(data, opts, x0=x0)
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    # Converged complementarity.
    x = np.asarray(sol.x)
    phi = (np.asarray(data.L) @ x - np.asarray(data.lbL)) @ \
          (np.asarray(data.R) @ x - np.asarray(data.lbR))
    # The solver's own convergence test is the *signed* phi < tol
    # (complementarityCheck, src/LCQProblem.cpp:1156-1158); assert a small
    # absolute value here (phi can converge from slightly below zero with
    # shifted bounds).
    assert abs(phi) < 1e-8
    assert int(sol.algo_status) == lt.AlgorithmStatus.S_STATIONARY_SOLUTION


def test_compat_load_from_files(tmp_path):
    d = str(tmp_path)
    data = warm_up()
    io.write_vector(os.path.join(d, "Q.txt"), np.asarray(data.Q).ravel())
    io.write_vector(os.path.join(d, "g.txt"), np.asarray(data.g))
    io.write_vector(os.path.join(d, "L.txt"), np.asarray(data.L).ravel())
    io.write_vector(os.path.join(d, "R.txt"), np.asarray(data.R).ravel())
    lcqp = lt.LCQProblem()
    assert lcqp.load_lcqp_from_files(d) == lt.ReturnValue.SUCCESSFUL_RETURN
    lcqp.set_options(lt.Options(print_level=lt.PrintLevel.NONE))
    assert lcqp.run_solver() == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.sort(lcqp.get_primal_solution())
    np.testing.assert_allclose(x, [0., 1.], atol=1e-7)


def test_random_lcqp_family():
    # Randomized solvable instances (BASELINE.md randomized-batch config).
    opts = lt.Options(print_level=lt.PrintLevel.NONE)
    for seed in range(3):
        data = random_lcqp(seed, nV=6, nC=2, nComp=2)
        sol = lt.solve(data, opts)
        assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN, seed
        # Complementarity satisfied at the solution.
        x = np.asarray(sol.x)
        phi = (np.asarray(data.L) @ x) @ (np.asarray(data.R) @ x)
        assert abs(phi) < 1e-8


def test_example_scripts_run():
    """Run every example script in-process (the reference's test.sh model:
    examples double as integration tests, ``test.sh:14-21``)."""
    import os
    import runpy

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ["warm_up", "warm_up_binary", "warm_up_w_A", "warm_up_osqp",
                 "warm_up_sparse", "test_max_penalty",
                 "optimize_on_circle_store_steps"]:
        runpy.run_path(os.path.join(root, "examples", name + ".py"),
                       run_name="__main__")
