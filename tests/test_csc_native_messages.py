"""Tests for the CSC ingestion utilities, the native host runtime, and the
message handler — mirroring the reference's Utilities CSC tests
(``/root/reference/test/RunUnitTests.cpp:265-410``: randomized round-trip
property test + upper-triangular extraction) and ``MessageHandler``
(``src/MessageHandler.cpp``).
"""

import os

import numpy as np
import pytest

import lcqpow_tpu as lt
from lcqpow_tpu import native
from lcqpow_tpu.ops import csc


# ---------------------------------------------------------------- CSC layer
def test_csc_dense_roundtrip_randomized():
    # RunUnitTests.cpp:265-375: 100-trial randomized CSC<->dense round trip.
    rng = np.random.default_rng(42)
    for _ in range(100):
        m = int(rng.integers(1, 12))
        n = int(rng.integers(1, 12))
        A = rng.normal(size=(m, n))
        A[rng.random(size=(m, n)) < 0.6] = 0.0   # sparsify
        M = csc.dense_to_csc(A)
        assert M.nnz == np.count_nonzero(A)
        back = csc.csc_to_dense(M)
        np.testing.assert_array_equal(back, A)


def test_csc_drops_exact_zeros():
    # dns_to_csc keeps entries with v>0 || v<0 (src/Utilities.cpp:632).
    A = np.array([[0.0, 1.0], [-2.0, 0.0]])
    M = csc.dense_to_csc(A)
    assert M.nnz == 2
    np.testing.assert_array_equal(csc.csc_to_dense(M), A)


def test_csc_upper_triangular():
    # copyCSC upper-triangular extraction (src/Utilities.cpp:512-583),
    # RunUnitTests.cpp:378-410.
    A = np.array([[4., 1., 0.],
                  [1., 5., 2.],
                  [0., 2., 6.]])
    U = csc.csc_upper_triangular(csc.dense_to_csc(A))
    np.testing.assert_array_equal(csc.csc_to_dense(U), np.triu(A))


def test_csc_validation_errors():
    with pytest.raises(ValueError):
        csc.create_csc(2, 2, 1, [1.0], [5], [0, 1])        # row idx out of range
    with pytest.raises(ValueError):
        csc.create_csc(2, 2, 1, [1.0], [0], [1, 1])        # indptr[0] != 0
    with pytest.raises(ValueError):
        csc.create_csc(2, 2, 2, [1.0], [0], [0, 1])        # nnz mismatch


def test_scipy_sparse_interop():
    sp = pytest.importorskip("scipy.sparse")
    A = np.array([[2., 0.], [0., 2.]])
    M = csc.CSCMatrix.from_scipy(sp.csc_matrix(A))
    np.testing.assert_array_equal(M.toarray(), A)
    # And through the compat load path.
    lcqp = lt.LCQProblem(2, 0, 1)
    lcqp.set_options(lt.Options(print_level=lt.PrintLevel.NONE,
                                qp_solver=lt.QPSolver.QPOASES_SPARSE))
    ret = lcqp.load_lcqp(sp.csc_matrix(A), [-2., -2.],
                         sp.csc_matrix([[1., 0.]]), sp.csc_matrix([[0., 1.]]))
    assert ret == lt.ReturnValue.SUCCESSFUL_RETURN
    # Sparse load puts the object directly in sparse mode (CSC overload).
    assert lcqp.run_solver() == lt.ReturnValue.SUCCESSFUL_RETURN
    np.testing.assert_allclose(np.sort(lcqp.get_primal_solution()),
                               [0., 1.], atol=1e-7)


# ---------------------------------------------------------- native runtime
def test_native_library_builds():
    assert native.available(), \
        "native host library failed to build (g++ expected in this image)"


def test_native_read_write_roundtrip(tmp_path):
    p = str(tmp_path / "v.txt")
    vals = np.array([1.5, -2.25e-13, 3e7, 0.0, -1.0])
    assert native.write_doubles_native(p, vals)
    got = native.read_doubles_native(p)
    np.testing.assert_array_equal(got, vals)


def test_native_read_matches_python_reader(tmp_path):
    # Messy whitespace, reference-style.
    p = str(tmp_path / "messy.txt")
    with open(p, "w") as f:
        f.write("1.0  2.5\n\t-3e-2\n\n4\n")
    from lcqpow_tpu.io import read_vector
    np.testing.assert_array_equal(read_vector(p), [1.0, 2.5, -0.03, 4.0])


def test_native_csc_to_dense_matches_numpy():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(9, 5))
    A[rng.random(size=A.shape) < 0.5] = 0.0
    M = csc.dense_to_csc(A)
    out = native.csc_to_dense_native(M.m, M.n, M.indptr, M.indices, M.data)
    if out is not None:
        np.testing.assert_array_equal(out, A)


def test_native_pack_padded():
    out = native.pack_padded_native(
        [np.ones((2, 2)), 2 * np.ones((1, 3))], 3, 4, fill=-1.0)
    if out is None:
        pytest.skip("native unavailable")
    assert out.shape == (2, 3, 4)
    np.testing.assert_array_equal(out[0, :2, :2], 1.0)
    np.testing.assert_array_equal(out[1, :1, :3], 2.0)
    assert (out[0, 2:, :] == -1).all() and (out[0, :2, 2:] == -1).all()


# ------------------------------------------------------------ messages
def test_messages_cover_all_return_values():
    for rv in lt.ReturnValue:
        assert lt.message(rv), rv


def test_solution_banner_format():
    s = lt.solution_banner(lt.AlgorithmStatus.S_STATIONARY_SOLUTION)
    assert "S-Stationary solution found" in s
    lines = [l for l in s.splitlines() if l]
    assert lines[0].startswith("#") and lines[-1].startswith("#")
    assert len(lines[0]) == len(lines[1]) == len(lines[2])
    assert "not been solved" in lt.solution_banner(
        lt.AlgorithmStatus.PROBLEM_NOT_SOLVED)


def test_compat_prints_banner_on_success(capsys):
    lcqp = lt.LCQProblem(2, 0, 1)
    lcqp.set_options(lt.Options(print_level=lt.PrintLevel.OUTER_LOOP_ITERATES))
    lcqp.load_lcqp([[2., 0.], [0., 2.]], [-2., -2.], [[1., 0.]], [[0., 1.]])
    assert lcqp.run_solver() == lt.ReturnValue.SUCCESSFUL_RETURN
    out = capsys.readouterr().out
    assert "Stationary solution found" in out


def test_compat_prints_message_on_failure(capsys):
    lcqp = lt.LCQProblem(2, 0, 1)
    lcqp.set_options(lt.Options(
        print_level=lt.PrintLevel.OUTER_LOOP_ITERATES,
        max_penalty_parameter=1.0))
    lcqp.load_lcqp([[2., 0.], [0., 2.]], [-2., -2.], [[1., 0.]], [[0., 1.]])
    assert lcqp.run_solver() == lt.ReturnValue.MAX_PENALTY_REACHED
    assert "maximum penalty" in capsys.readouterr().out
