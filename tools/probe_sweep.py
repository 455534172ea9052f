"""Micro-bench: blocked-sweep SPD inverse block size at the polish shapes.

The circle-class polish/corrector KKT solves build one (chunk, m, m) Schur
inverse per active-set round (m=505 -> ~2.1 GFLOP each at chunk 8); the
sweep's block size trades sequential fori_loop steps (16 at block 32) against
per-step matmul size (the MXU wants the K dim >= 128).  Run on the chip:

    python tools/probe_sweep.py            # default shapes
    SHAPE=8,505 BLOCKS=32,64,128 python tools/probe_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lcqpow_tpu.ops.chol import sweep_spd_inverse, _jacobi_scale

B, M = (int(v) for v in os.environ.get("SHAPE", "8,505").split(","))
blocks = [int(v) for v in os.environ.get("BLOCKS", "32,64,128").split(",")]

rng = np.random.default_rng(0)
A = rng.normal(size=(B, M, M)).astype(np.float32)
S = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + M * np.eye(M, dtype=np.float32))

for blk in blocks:
    fn = jax.jit(lambda X, b=blk: sweep_spd_inverse(_jacobi_scale(X)[0], b))
    t0 = time.time()
    out = fn(S)
    jax.block_until_ready(out)
    tc = time.time() - t0
    times = []
    for _ in range(5):
        t0 = time.time()
        out = fn(S)
        _ = np.asarray(out.ravel()[0])
        times.append(time.time() - t0)
    gf = 2 * B * M ** 3 / 1e9
    t = min(times)
    err = float(jnp.max(jnp.abs(
        jnp.eye(M) - _jacobi_scale(S)[0] @ out)))
    print(f"block={blk:4d}: compile {tc:5.1f}s  best {t*1e3:8.2f} ms  "
          f"{gf/t:7.1f} GFLOP/s  resid {err:.2e}", flush=True)
