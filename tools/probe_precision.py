"""Probe: f32 matmul accuracy on this TPU under DEFAULT vs HIGHEST precision.

Measures relative error vs a float64 reference for the contraction shapes the
solver's hot path uses (batched matvec, mat-mat, Schur-style products), to
decide whether XLA:TPU's DEFAULT f32 matmul (reduced-precision bf16 passes on
the MXU) explains the round-2 on-chip failures (VERDICT r2 Missing #2).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)

rng = np.random.default_rng(0)


def relerr(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) - b))
                 / (np.max(np.abs(b)) + 1e-300))


for name, shape_a, shape_b in [
    ("matvec 14x8 @ 8", (14, 8), (8,)),
    ("matvec 505x202 @ 202", (505, 202), (202,)),
    ("matmat 505x202 @ 202x505", (505, 202), (202, 505)),
    ("batched matvec (128,505,202)@(128,202)", (128, 505, 202), (128, 202)),
]:
    A = rng.normal(size=shape_a)
    B = rng.normal(size=shape_b)
    ref = np.einsum("...ij,...j->...i", A, B) if B.ndim < A.ndim \
        else np.einsum("...ij,...jk->...ik", A, B)
    A32 = jnp.asarray(A, jnp.float32)
    B32 = jnp.asarray(B, jnp.float32)
    for prec in ["default", "highest"]:
        with jax.default_matmul_precision(prec):
            if B.ndim < A.ndim:
                out = jax.jit(lambda a, b: jnp.einsum("...ij,...j->...i", a, b))(A32, B32)
            else:
                out = jax.jit(lambda a, b: a @ b)(A32, B32)
        print(f"{name:45s} {prec:8s} relerr {relerr(out, ref):.3e}")
