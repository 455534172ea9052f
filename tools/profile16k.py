"""Diagnose the 16k-batch cliff: time predictor vs corrector separately
across batch sizes.  Diagnostics to stderr/stdout; run on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu.problems import random_lcqp
from lcqpow_tpu.mixed import (_predictor_options, correct_and_certify,
                              solve_mixed)
from lcqpow_tpu.solver import solve


def log(*a):
    print(*a, flush=True)


def make_batch(B):
    import dataclasses
    rng = np.random.default_rng(0)
    problems = [random_lcqp(rng, nV=8, nC=2, nComp=2, as_numpy=True)
                for _ in range(64)]
    base = jax.tree.map(lambda *xs: np.stack(xs), *problems)
    reps_needed = -(-B // 64)
    batch = jax.tree.map(
        lambda x: np.tile(x, (reps_needed,) + (1,) * (x.ndim - 1))[:B], base)
    batch = dataclasses.replace(
        batch, g=batch.g + 0.01 * rng.normal(size=(B, 8)))
    return jax.tree.map(jnp.asarray, batch)


def bench_fn(fn, args, label, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    log(f"  {label}: compile+first {time.time()-t0:.2f}s")
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    log(f"  {label}: best {min(times)*1e3:.1f} ms  times={['%.3f' % t for t in times]}")
    return out, min(times)


opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200)

for B in (4096, 8192, 16384):
    log(f"=== batch {B} ===")
    batch = make_batch(B)
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    # stage 1: predictor only (f32)
    popts = _predictor_options(opts)
    batch32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), batch)
    pred_fn = jax.jit(jax.vmap(lambda d, k: solve(d, popts, key=k),
                               in_axes=(0, 0)))
    pred, t_pred = bench_fn(pred_fn, (batch32, keys), "predictor(f32)")

    # stage 2: corrector only, from predictor outputs
    batch64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), batch)

    def corr(d, x, y, rho, outer, ret, qp):
        return correct_and_certify(d, opts, x, y, rho, outer > 0, ret, qp)

    corr_fn = jax.jit(jax.vmap(corr, in_axes=(0, 0, 0, 0, 0, 0, 0)))
    cargs = (batch64, pred.x, pred.y, pred.stats.rho_opt,
             pred.stats.iter_outer, pred.ret, pred.stats.qp_exit_flag)
    cout, t_corr = bench_fn(corr_fn, cargs, "corrector(df32)")

    # full pipeline
    full_fn = jax.jit(jax.vmap(lambda d, k: solve_mixed(d, opts, key=k),
                               in_axes=(0, 0)))
    sol, t_full = bench_fn(full_fn, (batch, keys), "full mixed")
    ok = int((np.asarray(sol.ret) == 0).sum())
    log(f"  certified {ok}/{B}; pred {t_pred*1e3:.0f}ms + corr "
        f"{t_corr*1e3:.0f}ms vs full {t_full*1e3:.0f}ms")
