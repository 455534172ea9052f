"""Dense linear-algebra kernels (the reference's ``Utilities`` layer).

Reference: ``/root/reference/src/Utilities.cpp:38-265`` implements hand-rolled
single-threaded loops (MatrixMultiplication, TransponsedMatrixMultiplication,
MatrixSymmetrizationProduct, AffineLinearTransformation, QuadraticFormProduct,
DotProduct, MaxAbs, Weighted{Matrix,Vector}Add) plus CSC-sparse twins.

On TPU these become jnp expressions: XLA maps the contractions onto the MXU
and fuses the elementwise tails, and every function is ``vmap``-compatible so
a batch of LCQP instances runs as one large batched contraction.  The CSC
twins are intentionally *not* replicated — CSC gather/scatter is hostile to
the TPU memory system; one canonical dense/blocked representation is used
instead (see SURVEY.md §7 design translation table).

All functions operate on the trailing dimensions, so they work unbatched
(as written) and batched (via ``jax.vmap``).
"""

from __future__ import annotations

import jax.numpy as jnp


def matrix_multiplication(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``A @ b`` (reference ``Utilities::MatrixMultiplication``,
    ``src/Utilities.cpp:38-47``)."""
    return A @ b


def transposed_matrix_multiplication(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``A.T @ b`` (reference ``TransponsedMatrixMultiplication``,
    ``src/Utilities.cpp:62-72``)."""
    return A.T @ b


def matrix_symmetrization_product(L: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """``C = L'R + R'L`` (reference ``MatrixSymmetrizationProduct``,
    ``src/Utilities.cpp:104-116``).  This is the complementarity Hessian:
    ``1/2 x'Cx = (Lx)'(Rx)``."""
    LtR = L.T @ R
    return LtR + LtR.T


def affine_linear_transformation(alpha, A: jnp.ndarray, b: jnp.ndarray,
                                 c: jnp.ndarray) -> jnp.ndarray:
    """``d = alpha*A@b + c`` (reference ``AffineLinearTransformation``,
    ``src/Utilities.cpp:176-186``)."""
    return alpha * (A @ b) + c


def weighted_matrix_add(alpha, A, beta, B) -> jnp.ndarray:
    """``alpha*A + beta*B`` (reference ``WeightedMatrixAdd``,
    ``src/Utilities.cpp:202-206``)."""
    return alpha * A + beta * B


def weighted_vector_add(alpha, a, beta, b) -> jnp.ndarray:
    """``alpha*a + beta*b`` (reference ``WeightedVectorAdd``,
    ``src/Utilities.cpp:208-211``)."""
    return alpha * a + beta * b


def quadratic_form_product(Q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """``p'Qp`` (reference ``QuadraticFormProduct``,
    ``src/Utilities.cpp:214-225``)."""
    return p @ (Q @ p)


def dot_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a'b`` (reference ``DotProduct``, ``src/Utilities.cpp:244-250``)."""
    return jnp.dot(a, b)


def max_abs(a: jnp.ndarray) -> jnp.ndarray:
    """Infinity norm ``max_i |a_i|``.

    The reference's ``MaxAbs`` (``src/Utilities.cpp:253-265``) computes the
    infinity norm although its doc comment says "1-norm"; the behavior (not
    the comment) is replicated — it feeds the stationarity check
    (``src/LCQProblem.cpp:1151-1153``).
    """
    return jnp.max(jnp.abs(a), axis=-1)
