"""Unit tests for the dense kernel layer.

Mirrors the reference's ``UtilitiesTest`` hand-computed assertions
(``/root/reference/test/RunUnitTests.cpp:33-246``) plus randomized property
tests for the matmul-only factorization helpers (``ops/chol.py``), which play
the role of the reference's CSC round-trip property test (``:265-375``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import lcqpow_tpu  # noqa: F401  (configures x64)
from lcqpow_tpu.ops import linalg
from lcqpow_tpu.ops.chol import spd_inverse, tri_inv_lower


def test_matrix_multiplication():
    # RunUnitTests.cpp:33-57
    A = jnp.array([[1., 2., 3.], [4., 5., 6.]])
    b = jnp.array([1., 2., 3.])
    np.testing.assert_allclose(linalg.matrix_multiplication(A, b),
                               [14., 32.])


def test_transposed_matrix_multiplication():
    # RunUnitTests.cpp:60-78
    A = jnp.array([[1., 2.], [3., 4.], [5., 6.]])
    b = jnp.array([1., 2., 3.])
    np.testing.assert_allclose(linalg.transposed_matrix_multiplication(A, b),
                               [22., 28.])


def test_matrix_symmetrization_product():
    # RunUnitTests.cpp:81-104: C = L'R + R'L is symmetric and matches the
    # identity 1/2 x'Cx = (Lx)'(Rx).
    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.normal(size=(3, 4)))
    R = jnp.asarray(rng.normal(size=(3, 4)))
    C = linalg.matrix_symmetrization_product(L, R)
    np.testing.assert_allclose(C, C.T, atol=1e-14)
    x = jnp.asarray(rng.normal(size=4))
    np.testing.assert_allclose(0.5 * x @ C @ x, (L @ x) @ (R @ x), rtol=1e-12)


def test_affine_linear_transformation():
    # RunUnitTests.cpp:107-129: d = alpha*A*b + c
    A = jnp.array([[2., 0.], [0., 3.]])
    b = jnp.array([1., 1.])
    c = jnp.array([10., 20.])
    np.testing.assert_allclose(
        linalg.affine_linear_transformation(2.0, A, b, c), [14., 26.])


def test_weighted_matrix_add():
    A = jnp.ones((2, 2))
    B = jnp.eye(2)
    np.testing.assert_allclose(
        linalg.weighted_matrix_add(2.0, A, -1.0, B),
        [[1., 2.], [2., 1.]])


def test_weighted_vector_add():
    a = jnp.array([1., 2.])
    b = jnp.array([3., 4.])
    np.testing.assert_allclose(
        linalg.weighted_vector_add(1.0, a, -1.0, b), [-2., -2.])


def test_quadratic_form_product():
    # RunUnitTests.cpp:190-204
    Q = jnp.array([[2., 1.], [1., 2.]])
    p = jnp.array([1., 1.])
    assert float(linalg.quadratic_form_product(Q, p)) == pytest.approx(6.0)


def test_dot_product():
    assert float(linalg.dot_product(jnp.array([1., 2., 3.]),
                                    jnp.array([4., 5., 6.]))) == 32.0


def test_max_abs_is_infinity_norm():
    # RunUnitTests.cpp:224-246 — the reference's MaxAbs computes the infinity
    # norm (despite its doc comment claiming "1-norm"); behavior replicated.
    a = jnp.array([1., -7., 3.])
    assert float(linalg.max_abs(a)) == 7.0


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 17, 64])
def test_tri_inv_lower(n):
    # Use Cholesky factors of SPD matrices — the only triangular matrices the
    # solver ever inverts (a *random* dense triangular matrix has cond ~2^n
    # and no method inverts it accurately).
    rng = np.random.default_rng(n)
    B = rng.normal(size=(n, n))
    L = np.linalg.cholesky(B @ B.T + n * np.eye(n))
    W = tri_inv_lower(jnp.asarray(L))
    np.testing.assert_allclose(np.asarray(W) @ L, np.eye(n), atol=1e-10)


@pytest.mark.parametrize("n", [2, 5, 30])
def test_spd_inverse(n):
    rng = np.random.default_rng(n)
    B = rng.normal(size=(n, n))
    M = B @ B.T + n * np.eye(n)
    Minv = spd_inverse(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(Minv) @ M, np.eye(n), atol=1e-10)


def test_spd_inverse_batched():
    rng = np.random.default_rng(7)
    B = rng.normal(size=(4, 6, 6))
    M = B @ np.swapaxes(B, -1, -2) + 6 * np.eye(6)
    Minv = spd_inverse(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(Minv) @ M,
                               np.broadcast_to(np.eye(6), (4, 6, 6)),
                               atol=1e-10)
