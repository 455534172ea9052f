"""Double-word float32 arithmetic: every kernel validated against numpy
float64 ground truth.  These run on CPU but the code is dtype-identical on
TPU (pure f32 ops)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lcqpow_tpu.ops import df32

RNG = np.random.default_rng(0)


def _rand(*shape, scale=1.0):
    return (RNG.normal(size=shape) * scale).astype(np.float32)


def test_two_sum_exact():
    a = _rand(1000)
    b = _rand(1000, scale=1e-6)
    s = df32.two_sum(a, b)
    # Exactness: hi+lo == a+b in f64.
    np.testing.assert_array_equal(
        np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64),
        a.astype(np.float64) + b.astype(np.float64))


def test_two_prod_exact():
    a = _rand(1000)
    b = _rand(1000)
    p = df32.two_prod(a, b)
    np.testing.assert_array_equal(
        np.asarray(p.hi, np.float64) + np.asarray(p.lo, np.float64),
        a.astype(np.float64) * b.astype(np.float64))


def test_add_mul_accuracy():
    a64 = RNG.normal(size=1000) * 3.0
    b64 = RNG.normal(size=1000)
    a = df32.from_f64(a64)
    b = df32.from_f64(b64)
    s = df32.add(a, b)
    m = df32.mul(a, b)
    # Near-cancellation the RELATIVE error of add22 is unbounded; the
    # guarantee is absolute: ~2^-48 * max(|a|,|b|).
    np.testing.assert_allclose(np.asarray(df32.to_f64(s)), a64 + b64,
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(df32.to_f64(m)), a64 * b64,
                               rtol=5e-13, atol=1e-18)


def test_dot_cancellation():
    # A dot product with heavy cancellation: plain f32 gets ~1e-2 absolute
    # error, df32 must stay ~1e-12.
    n = 512
    a = _rand(n, scale=100.0)
    b = _rand(n, scale=100.0)
    exact = np.dot(a.astype(np.float64), b.astype(np.float64))
    d = df32.dot(jnp.asarray(a), jnp.asarray(b))
    err_df = abs(float(df32.to_f64(d)) - exact)
    err_f32 = abs(float(jnp.dot(jnp.asarray(a), jnp.asarray(b))) - exact)
    assert err_df < 1e-8, err_df           # |terms| ~ 1e4 -> rel ~1e-12
    assert err_df < max(err_f32, 1e-9) , (err_df, err_f32)


def test_matvec_accuracy():
    m, n = 14, 22
    A = _rand(m, n)
    x = _rand(n)
    exact = A.astype(np.float64) @ x.astype(np.float64)
    got = np.asarray(df32.to_f64(df32.matvec(jnp.asarray(A), jnp.asarray(x))))
    np.testing.assert_allclose(got, exact, rtol=1e-11, atol=1e-12)


def test_matvec_batched():
    B, m, n = 16, 6, 9
    A = _rand(B, m, n)
    x = _rand(B, n)
    exact = np.einsum("bmn,bn->bm", A.astype(np.float64), x.astype(np.float64))
    got = np.asarray(df32.to_f64(df32.matvec(jnp.asarray(A), jnp.asarray(x))))
    np.testing.assert_allclose(got, exact, rtol=1e-10, atol=1e-11)
    # Transposed flavor.
    y = _rand(B, m)
    exact_t = np.einsum("bmn,bm->bn", A.astype(np.float64),
                        y.astype(np.float64))
    got_t = np.asarray(df32.to_f64(
        df32.matvec_t(jnp.asarray(A), jnp.asarray(y))))
    np.testing.assert_allclose(got_t, exact_t, rtol=1e-10, atol=1e-11)


def test_df_matvec_df_operand():
    m, n = 8, 8
    A = _rand(m, n)
    x64 = RNG.normal(size=n)
    x = df32.from_f64(x64)
    exact = A.astype(np.float64) @ x64
    got = np.asarray(df32.to_f64(df32.df_matvec(jnp.asarray(A), x)))
    np.testing.assert_allclose(got, exact, rtol=1e-11, atol=1e-12)


def test_sum_odd_lengths():
    for n in (1, 2, 3, 7, 13):
        a = _rand(n)
        s = df32.sum_(df32.from_f32(jnp.asarray(a)))
        np.testing.assert_allclose(float(df32.to_f64(s)),
                                   a.astype(np.float64).sum(),
                                   rtol=1e-11, atol=1e-12)


def test_residual_cancellation_regime():
    # The corrector's use case: r = b - A@x where x ~ A^-1 b, so r ~ eps.
    # df32 must resolve r to ~1e-12 absolute even though |A@x| ~ 1.
    n = 12
    A64 = RNG.normal(size=(n, n)) + 5 * np.eye(n)
    x64 = RNG.normal(size=n)
    b64 = A64 @ x64
    A = jnp.asarray(A64.astype(np.float32))
    b = df32.from_f64(b64)
    x = df32.from_f64(x64)
    # r = b - A x computed in df32 from SPLIT inputs: the f32 truncation of
    # A itself dominates; compare against the f64 result with the same
    # truncated A.
    Ax = df32.df_matvec(A, x)
    r = df32.sub(b, Ax)
    exact = b64 - np.asarray(A, np.float64) @ x64
    np.testing.assert_allclose(np.asarray(df32.to_f64(r)), exact,
                               atol=5e-12)


def test_jit_matches_eager():
    # Regression: backend FMA contraction silently corrupted df32 under jit
    # (eager exact, jit off by ~1 ulp of hi) until rounded products were
    # fenced.  Verify the fundamental ops agree jitted vs eager AND vs f64.
    import jax

    a = jnp.full((64,), np.float32(0.9310774))
    b = jnp.float32(0.01)
    f = lambda a: df32.mul_f32(df32.DF(a, jnp.zeros_like(a)), b)
    e = f(a)
    j = jax.jit(f)(a)
    truth = np.float64(np.asarray(a)[0]) * np.float64(b)
    for r in (e, j):
        np.testing.assert_array_equal(np.asarray(df32.to_f64(r))[0], truth)

    A = _rand(32, 9, 7)
    x = _rand(32, 7)
    exact = np.einsum("bmn,bn->bm", A.astype(np.float64),
                      x.astype(np.float64))
    got = np.asarray(df32.to_f64(
        jax.jit(df32.matvec)(jnp.asarray(A), jnp.asarray(x))))
    np.testing.assert_allclose(got, exact, rtol=1e-10, atol=1e-11)


def test_where_and_abs():
    a = df32.from_f64(np.array([1.5, -2.5]))
    b = df32.from_f64(np.array([10.0, 20.0]))
    w = df32.where(np.array([True, False]), a, b)
    np.testing.assert_allclose(np.asarray(df32.to_f64(w)), [1.5, 20.0])
    np.testing.assert_allclose(np.asarray(df32.to_f64(df32.abs_(a))),
                               [1.5, 2.5])
