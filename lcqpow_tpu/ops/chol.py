"""Matmul-only dense factorization helpers.

TPU-first rationale: the MXU wants matmuls; sequential triangular solves are
slow on TPU, the platform's f64 LU decomposition is unimplemented
(``jnp.linalg.inv`` fails to compile for f64), and ``lax.linalg``'s
TriangularSolve is pathologically slow for the TPU compiler to build inside
``while_loop`` bodies.  So inverses are built from a Cholesky factor with a
**log-depth nilpotent series**: for lower-triangular ``L = D(I - N)`` with
``N`` strictly lower (hence nilpotent, ``N^n = 0``),

    L^-1 = (I - N)^-1 D^-1 = (sum_{k<n} N^k) D^-1,

and the partial sums double per squaring step: ``S_{2m} = (I + N^m) S_m``.
``ceil(log2(n))`` matmul pairs give the *exact* inverse — no iteration-count
tuning, pure MXU work, cheap to compile anywhere.

These helpers back the inner ADMM engine's KKT operator and the polish step
(``lcqpow_tpu/solvers/admm.py``) — the role the reference delegates to
qpOASES'/OSQP's LAPACK/QDLDL factorizations
(``/root/reference/src/SubsolverQPOASES.cpp:144-160``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def tri_inv_lower(L: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of a lower-triangular matrix via log-depth squaring.

    Works on the trailing two dims (vmap/batch friendly).  Cost:
    ``2*ceil(log2(n))`` matmuls.
    """
    n = L.shape[-1]
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    eye = jnp.eye(n, dtype=L.dtype)
    # L = D(I - N)  =>  N = I - D^-1 L  (strictly lower, nilpotent).
    N = eye - L / d[..., :, None]
    S = eye + N
    if n > 2:
        steps = math.ceil(math.log2(n)) - 1
        P = N
        for _ in range(steps):
            P = P @ P
            S = S + P @ S
    # L^-1 = (I-N)^-1 D^-1 = S D^-1  (scale columns).
    return S / d[..., None, :]


def spd_inverse(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a symmetric positive-definite matrix: ``W'W`` with
    ``W = chol(M)^-1``.  Batched over leading dims."""
    L = lax.linalg.cholesky(M)
    W = tri_inv_lower(L)
    return W.mT @ W


def spd_inverse_factor(M: jnp.ndarray) -> jnp.ndarray:
    """Return ``W = chol(M)^-1`` so that ``M^-1 = W'W`` (useful when solves
    should be applied as two GEMMs for better rounding behavior)."""
    return tri_inv_lower(lax.linalg.cholesky(M))
