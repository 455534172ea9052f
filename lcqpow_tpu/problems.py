"""Canonical LCQP workloads.

These are the reference's example problems, re-generated programmatically
(no data copied): the 2-variable warm-up LCQP (``examples/warm_up.cpp:32-42``),
the unit-circle projection with complementarity-encoded vertex selection
(``examples/OptimizeOnCircle.cpp:28-99``), and a random strictly-convex LCQP
family used for batched benchmarking (BASELINE.md "10k-instance randomized
batch" config).
"""

from __future__ import annotations

import numpy as np

from .data import LCQPData, make_lcqp


def warm_up(dtype=None) -> LCQPData:
    """min ||x - (1,1)||^2  s.t.  0 <= x1 ⟂ x2 >= 0.
    Solutions: (1,0) and (0,1), both S-stationary
    (``test/RunUnitTests.cpp:505-547``)."""
    return make_lcqp(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
                     L=[[1., 0.]], R=[[0., 1.]], dtype=dtype)


def optimize_on_circle(N: int = 100, x_ref=(0.5, -0.6), dtype=None,
                       as_numpy: bool = False):
    """Project ``x_ref`` onto the unit circle discretized as N vertices with
    complementarity-based vertex selection (``examples/OptimizeOnCircle.cpp``):

        min (x-x_ref)' W (x-x_ref),  W = [[17,-15],[-15,17]]
        s.t. cos_i x1 + sin_i x2 + lambda_i = 1        (i < N)
             sum_i theta_i = 1
             0 <= lambda_i ⟂ theta_i >= 0

    Returns ``(data, x0)``.  For N=100 the global solution is
    x* ~ (0.1811, -0.9835); another local solution ~ (0.9764, -0.2183)
    (``OptimizeOnCircle.cpp:144-145``).
    """
    nV = 2 + 2 * N
    nC = N + 1
    nComp = N

    Q = np.zeros((nV, nV))
    Q[:2, :2] = [[17., -15.], [-15., 17.]]
    # Tiny regularization on the lifted variables (OptimizeOnCircle.cpp:67-68).
    for i in range(2, nV):
        Q[i, i] = 5e-12

    g = np.zeros(nV)
    g[:2] = -(np.array([[17., -15.], [-15., 17.]]) @ np.asarray(x_ref))

    A = np.zeros((nC, nV))
    L = np.zeros((nComp, nV))
    R = np.zeros((nComp, nV))
    lbA = np.zeros(nC)
    ubA = np.zeros(nC)
    x0 = np.zeros(nV)
    x0[:2] = x_ref

    for i in range(N):
        A[i, 0] = np.cos(2 * np.pi * i / N)
        A[i, 1] = np.sin(2 * np.pi * i / N)
        A[i, 2 + 2 * i] = 1.0       # lambda_i
        A[N, 3 + 2 * i] = 1.0       # sum theta = 1
        L[i, 2 + 2 * i] = 1.0
        R[i, 3 + 2 * i] = 1.0
        lbA[i] = 1.0
        ubA[i] = 1.0
        x0[2 + 2 * i] = 1.0
        x0[3 + 2 * i] = 1.0
    lbA[N] = 1.0
    ubA[N] = 1.0

    data = make_lcqp(Q, g, L, R, A=A, lbA=lbA, ubA=ubA, dtype=dtype,
                     as_numpy=as_numpy)
    return data, x0


def random_lcqp(key: np.random.Generator | int, nV: int = 8, nC: int = 2,
                nComp: int = 2, dtype=None, as_numpy: bool = False) -> LCQPData:
    """Random strictly-convex LCQP with complementarity between selected
    coordinate pairs — the warm-up-class randomized family used for
    throughput benchmarking."""
    rng = np.random.default_rng(key) if isinstance(key, int) else key
    B = rng.normal(size=(nV, nV)) / np.sqrt(nV)
    Q = B @ B.T + np.eye(nV)
    g = rng.normal(size=nV)
    # Complementarity between disjoint coordinate pairs.
    idx = rng.permutation(nV)[:2 * nComp]
    L = np.zeros((nComp, nV))
    R = np.zeros((nComp, nV))
    L[np.arange(nComp), idx[:nComp]] = 1.0
    R[np.arange(nComp), idx[nComp:]] = 1.0
    A = rng.normal(size=(nC, nV)) / np.sqrt(nV) if nC else None
    lbA = -np.abs(rng.normal(size=nC)) - 0.5 if nC else None
    ubA = np.abs(rng.normal(size=nC)) + 0.5 if nC else None
    return make_lcqp(Q, g, L, R, A=A, lbA=lbA, ubA=ubA, dtype=dtype,
                     as_numpy=as_numpy)
