"""Double-word float32 ("double-single") arithmetic on the VPU.

Why this exists: TPU v5e-class chips have no native float64 — XLA emulates
it at ~1 GFLOP/s (measured ~1000x slower than f32 on this part), which makes
any f64 inner loop the whole runtime.  The reference's default tolerances
(complementarityTolerance ~2.2e-13, stationarityTolerance ~2.2e-10,
``/root/reference/src/Options.cpp:297-298``) are far beyond f32, so the
certification/correction stage of the mixed-precision pipeline needs ~1e-14
accuracy *somewhere*.

The TPU-native answer is classical **error-free transformations** (Dekker
1971, Knuth TAOCP v2): represent a value as an unevaluated sum ``hi + lo`` of
two float32s (~48-bit effective mantissa, unit roundoff ~2^-48 ~ 3.6e-15) and
implement +,-,*,dot with sequences of exact f32 operations.  Every op is a
handful of VPU-elementwise f32 instructions — batched, fused by XLA, running
at f32 speed.  This module provides the vector/matrix kernels the corrector
needs (:mod:`lcqpow_tpu.mixed`): df add/sub/mul, tree-reduced dot/matvec, and
residual evaluation for mixed-precision iterative refinement.

Notes:
- All functions are shape-polymorphic over leading batch dims and operate on
  ``(hi, lo)`` pairs of equal-shape f32 arrays.
- ``two_prod`` uses Dekker splitting (no FMA primitive is exposed through
  jnp); the 4097-split is exact for f32 (12 = ceil(24/2) high bits).
- On CPU/GPU (or under x64 for testing) the same code runs unchanged; tests
  validate each kernel against numpy float64.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

_SPLIT = jnp.float32(4097.0)  # 2^12 + 1 (Dekker split constant for f32)


def _fence(x):
    """Anti-contraction fence for a rounded product.

    EFTs rely on products being ROUNDED before the compensating add/sub;
    backend codegen (XLA:CPU's LLVM, and TPU's FMA units) contracts
    ``fl(a*b) + c`` into ``fma(a, b, c)``, silently changing the rounding and
    corrupting the double-word invariant (observed: jit results off by one
    ulp of hi while eager execution was exact).  ``lax.optimization_barrier``
    does NOT survive to codegen (it is expanded before fusion), so the fence
    routes the value through a select on a runtime predicate (``x == x``,
    true for non-NaN) — the compiler cannot see a raw multiply feeding the
    add, and the select is a single cheap VPU op."""
    return jnp.where(x == x, x, jnp.zeros_like(x))


class DF(NamedTuple):
    """A double-word float32 value/array: represented value = hi + lo."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return self.hi.shape


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def from_f32(x) -> DF:
    x = _f32(x)
    return DF(x, jnp.zeros_like(x))


def from_f64(x) -> DF:
    """Split a float64 (or anything castable) into hi+lo f32 words.
    Used at ingestion; exact to df32 precision."""
    hi = jnp.asarray(x).astype(jnp.float32)
    lo = (jnp.asarray(x) - hi.astype(jnp.asarray(x).dtype)).astype(jnp.float32)
    return DF(hi, lo)


def to_f32(a: DF):
    return a.hi + a.lo


def to_f64(a: DF):
    """Recombine in float64 (for host-side checks; do not use on the TPU hot
    path)."""
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


# ------------------------------------------------------------ scalar EFTs
def two_sum(a, b) -> DF:
    """Knuth TwoSum: a + b = s + e exactly (6 flops, branchless).  Pure
    add/sub chain — no contraction hazard, no fence needed."""
    a, b = _f32(a), _f32(b)
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return DF(s, e)


def fast_two_sum(a, b) -> DF:
    """Dekker FastTwoSum, requires |a| >= |b| (3 flops)."""
    s = a + b
    return DF(s, b - (s - a))


def _split(a):
    # Fence the scaled value: contracting ``fl(4097*a) - a`` into an FMA
    # would skip the rounding Dekker's split depends on.
    t = _fence(_SPLIT * a)
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b) -> DF:
    """Dekker TwoProd: a * b = p + e exactly (17 flops, FMA-free).

    Only ``p`` needs fencing: contraction inside the ``e`` tail
    (e.g. ``ah*bh - p -> fma``) is exact and harmless, but any later
    ``p + c`` MUST see the rounded product."""
    a, b = _f32(a), _f32(b)
    p = _fence(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return DF(p, e)


# ------------------------------------------------------------- df ops
def add(a: DF, b: DF) -> DF:
    """df + df (Dekker add22, ~11 flops)."""
    s = two_sum(a.hi, b.hi)
    e = s.lo + (a.lo + b.lo)
    return fast_two_sum(s.hi, e)


def add_f32(a: DF, b) -> DF:
    s = two_sum(a.hi, _f32(b))
    return fast_two_sum(s.hi, s.lo + a.lo)


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def mul(a: DF, b: DF) -> DF:
    """df * df (~25 flops)."""
    p = two_prod(a.hi, b.hi)
    e = p.lo + (a.hi * b.lo + a.lo * b.hi)
    return fast_two_sum(p.hi, e)


def mul_f32(a: DF, b) -> DF:
    b = _f32(b)
    p = two_prod(a.hi, b)
    return fast_two_sum(p.hi, p.lo + a.lo * b)


def scale(a: DF, s) -> DF:  # alias
    return mul_f32(a, s)


def abs_(a: DF) -> DF:
    neg_mask = a.hi < 0
    return DF(jnp.where(neg_mask, -a.hi, a.hi),
              jnp.where(neg_mask, -a.lo, a.lo))


def where(mask, a: DF, b: DF) -> DF:
    return DF(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


# -------------------------------------------------- reductions & linalg
def sum_(a: DF, axis: int = -1) -> DF:
    """Tree-reduced df sum along one axis (log2(n) df-adds on halved
    tensors — VPU-friendly, error growth O(log n) in df units)."""
    hi, lo = a.hi, a.lo
    axis = axis % hi.ndim
    n = hi.shape[axis]
    while n > 1:
        half = n // 2
        sl_a = [slice(None)] * hi.ndim
        sl_b = [slice(None)] * hi.ndim
        sl_r = [slice(None)] * hi.ndim
        sl_a[axis] = slice(0, half)
        sl_b[axis] = slice(half, 2 * half)
        sl_r[axis] = slice(2 * half, n)
        s = add(DF(hi[tuple(sl_a)], lo[tuple(sl_a)]),
                DF(hi[tuple(sl_b)], lo[tuple(sl_b)]))
        if n % 2:
            hi = jnp.concatenate([s.hi, hi[tuple(sl_r)]], axis=axis)
            lo = jnp.concatenate([s.lo, lo[tuple(sl_r)]], axis=axis)
            n = half + 1
        else:
            hi, lo = s.hi, s.lo
            n = half
    return DF(jnp.squeeze(hi, axis), jnp.squeeze(lo, axis))


def dot(a, b, axis: int = -1) -> DF:
    """Accurate dot product of two f32 tensors along ``axis``
    (compensated: products via TwoProd, tree-summed in df — the classic
    ~2^-48 'dot2' algorithm)."""
    p = two_prod(a, b)
    return sum_(p, axis=axis)


def matvec(A, x) -> DF:
    """``A @ x`` with df accuracy.  ``A``: (..., m, n) f32, ``x``: (..., n)
    f32 -> DF (..., m)."""
    return dot(A, x[..., None, :], axis=-1)


def matvec_t(A, y) -> DF:
    """``A.T @ y``.  ``A``: (..., m, n), ``y``: (..., m) -> DF (..., n)."""
    return dot(A, y[..., :, None], axis=-2)


def df_matvec(A, x: DF) -> DF:
    """``A @ x`` where x is df: hi and lo parts get their own compensated
    matvec; lo contributes at f32 accuracy (sufficient: |lo| <= eps|x|)."""
    main = matvec(A, x.hi)
    corr = jnp.einsum("...mn,...n->...m", A, x.lo,
                      preferred_element_type=jnp.float32)
    return add(main, DF(corr, jnp.zeros_like(corr)))


def df_matvec_t(A, y: DF) -> DF:
    main = matvec_t(A, y.hi)
    corr = jnp.einsum("...mn,...m->...n", A, y.lo,
                      preferred_element_type=jnp.float32)
    return add(main, DF(corr, jnp.zeros_like(corr)))


def split_mat(M64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a float64 matrix into (hi, lo) f32 words — exact to df32
    precision.  Done once at ingestion."""
    hi = jnp.asarray(M64).astype(jnp.float32)
    lo = (jnp.asarray(M64) - hi.astype(jnp.asarray(M64).dtype)).astype(
        jnp.float32)
    return hi, lo


def split_matvec(Mhi, Mlo, x: DF) -> DF:
    """``(Mhi + Mlo) @ (x.hi + x.lo)`` to df accuracy: one compensated
    matvec for the leading term plus two f32 correction matvecs (the
    ``Mlo@x.lo`` term is below df precision and dropped)."""
    main = matvec(Mhi, x.hi)
    corr = jnp.einsum("...mn,...n->...m", Mhi, x.lo,
                      preferred_element_type=jnp.float32) \
        + jnp.einsum("...mn,...n->...m", Mlo, x.hi,
                     preferred_element_type=jnp.float32)
    return add(main, DF(corr, jnp.zeros_like(corr)))


def split_matvec_t(Mhi, Mlo, y: DF) -> DF:
    """``(Mhi + Mlo).T @ (y.hi + y.lo)`` to df accuracy."""
    main = matvec_t(Mhi, y.hi)
    corr = jnp.einsum("...mn,...m->...n", Mhi, y.lo,
                      preferred_element_type=jnp.float32) \
        + jnp.einsum("...mn,...m->...n", Mlo, y.hi,
                     preferred_element_type=jnp.float32)
    return add(main, DF(corr, jnp.zeros_like(corr)))


def df_dot(a: DF, b: DF) -> DF:
    """Accurate dot of two df vectors (drops the lo*lo term)."""
    main = dot(a.hi, b.hi)
    corr = jnp.sum(a.hi * b.lo + a.lo * b.hi, axis=-1)
    return add(main, DF(corr, jnp.zeros_like(corr)))


def max_abs(a: DF, axis=None):
    """f32 upper estimate of max|a| (certificates compare against tolerances
    >> 2^-48, so the hi word dominates; lo only shifts the boundary by
    O(eps^2))."""
    return jnp.max(jnp.abs(a.hi + a.lo), axis=axis)
