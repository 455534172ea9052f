"""Pallas TPU kernel: batched inverse of small SPD matrices.

The hottest op in the whole framework is inverting one small (m x m,
m ~ 10-50) SPD matrix **per batch lane** — the active-set Schur complement of
every polish/KKT solve (``solvers/admm.py:_polish_solve``,
``mixed.py:kkt_solve_pass``; the role the reference delegates to LAPACK/QDLDL
factorizations, ``/root/reference/src/SubsolverQPOASES.cpp:144-160``).
Measured on TPU v5e at (4096, 14, 14) float32:

* ``lax.linalg.cholesky`` route:        ~6.7 ms   (sequential column loop)
* matmul-only block recursion
  (``chol.block_spd_inverse``):         ~1.1 ms   (log-depth, many small ops)
* this kernel:                          ~0.03 ms  (bandwidth-bound)

Design: the batch axis is laid out **last** — the kernel operates on
``(m, m, BT)`` VMEM blocks so every elementwise op vectorizes the batch over
the 128-wide lanes while the tiny matrix dims live in sublanes/loop.  One
grid step = one batch tile; the whole Gauss-Jordan elimination (unrolled over
the static ``m``) runs register/VMEM-resident with a single HBM read and
write per tile.  No pivoting: inputs are Ruiz-equilibrated and
delta-regularized SPD by construction, and callers wrap the result in
iterative refinement.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel applicability bounds (fall back to the block recursion outside).
MAX_M = 48          # unrolled GJ steps; VMEM ~ 4 * m*m*BT*4B
_LANE = 128


def _gj_kernel(m: int, s_ref, inv_ref):
    """Gauss-Jordan inverse of (m, m, BT) — batch in lanes, unrolled in m.

    All masks are built from in-kernel iotas (Pallas kernels must not capture
    array constants).
    """
    M = s_ref[:]
    dt = M.dtype
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)        # (m, 1)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 0)     # (m, m, 1)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 1)
    I = jnp.broadcast_to(jnp.where(rows3 == cols3,
                                   jnp.asarray(1.0, dt),
                                   jnp.asarray(0.0, dt)), M.shape)
    for k in range(m):
        r = 1.0 / M[k, k, :]                      # (BT,)
        rowM = M[k] * r                           # (m, BT)
        rowI = I[k] * r
        # Elimination factors: column k, zeroed at the pivot row.
        f = jnp.where(rows2 != k, M[:, k, :], jnp.asarray(0.0, dt))
        M = M - f[:, None, :] * rowM[None, :, :]
        I = I - f[:, None, :] * rowI[None, :, :]
        M = jnp.where(rows3 == k, rowM[None, :, :], M)
        I = jnp.where(rows3 == k, rowI[None, :, :], I)
    inv_ref[:] = I


@functools.partial(jax.jit, static_argnames=("block_lanes",))
def spd_inverse_pallas(S: jnp.ndarray, block_lanes: int = 512) -> jnp.ndarray:
    """Batched SPD inverse via the Gauss-Jordan kernel.

    ``S``: (B, m, m) float32, each lane SPD (regularized).  Returns
    (B, m, m).  The batch is transposed to lane-major layout around the
    kernel (XLA transposes are bandwidth-bound and fuse with neighbors).
    """
    B, m = S.shape[0], S.shape[-1]
    bt = min(block_lanes, max(_LANE, -(-B // _LANE) * _LANE))
    Bp = -(-B // bt) * bt

    St = jnp.transpose(S, (1, 2, 0))              # (m, m, B)
    if Bp != B:
        St = jnp.pad(St, ((0, 0), (0, 0), (0, Bp - B)))
        # Identity in the padding keeps the (unused) GJ pivots nonzero.
        ar = jnp.arange(m)
        St = St.at[ar, ar, B:].set(1.0)

    # Index map zeros derived from i so every returned index is i32 even
    # under jax_enable_x64 (literal 0 would trace as i64 and Mosaic rejects
    # the mixed-width index tuple).
    imap = lambda i: (i * 0, i * 0, i)
    out = pl.pallas_call(
        functools.partial(_gj_kernel, m),
        grid=(Bp // bt,),
        in_specs=[pl.BlockSpec((m, m, bt), imap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, m, bt), imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, m, Bp), S.dtype),
    )(St)
    return jnp.transpose(out[:, :, :B], (2, 0, 1))


def pallas_applicable(shape, dtype) -> bool:
    """Kernel applicability: f32 batch of small matrices on a TPU backend."""
    return (jax.default_backend() == "tpu"
            and jnp.dtype(dtype) == jnp.float32
            and len(shape) >= 3
            and 1 <= shape[-1] <= MAX_M
            and shape[-1] == shape[-2])
