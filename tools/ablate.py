"""Performance ablation harness for the headline warm-up-class benchmark.

Times individual pipeline stages and option variants on the current backend
so optimization work targets the real bottleneck.  Diagnostics only — the
official number comes from bench.py.

Usage: python tools/ablate.py [stage ...]
Stages: pred32 (f32 predictor only), mixed (full pipeline), corr (corrector
cost = mixed - pred), variants (polish/refine knob sweep).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import lcqpow_tpu as lt
from lcqpow_tpu.problems import random_lcqp

B = int(os.environ.get("LCQPOW_BENCH_BATCH", "4096"))


def make_batch():
    rng = np.random.default_rng(0)
    problems = [random_lcqp(rng, nV=8, nC=2, nComp=2) for _ in range(64)]
    base = lt.stack_lcqps(problems)
    reps_needed = -(-B // 64)
    batch = jax.tree.map(
        lambda x: np.tile(np.asarray(x), (reps_needed,) + (1,) * (x.ndim - 1))[:B],
        base)
    g = np.asarray(batch.g) + 0.01 * rng.normal(size=(B, 8))
    return dataclasses.replace(batch, g=jnp.asarray(g))


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    t = min(times)
    print(f"{name:40s} {t*1e3:9.1f} ms  ({B/t:8.0f}/s)  compile {compile_s:.1f}s")
    return out, t


def main():
    stages = sys.argv[1:] or ["pred32", "mixed"]
    batch = make_batch()
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200)

    if "pred32" in stages:
        from lcqpow_tpu.mixed import _predictor_options
        from lcqpow_tpu.solver import solve
        popts = _predictor_options(opts)
        b32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), batch)
        fn = jax.jit(jax.vmap(lambda d, k: solve(d, popts, key=k).x))
        sol, _ = timeit("predictor f32", fn, b32, keys)

    if "mixed" in stages:
        from lcqpow_tpu.mixed import solve_mixed
        fn = jax.jit(jax.vmap(lambda d, k: solve_mixed(d, opts, key=k)))
        sol, _ = timeit("mixed full", fn, batch, keys)
        ok = np.asarray(sol.ret) == 0
        print(f"   certified {ok.sum()}/{B}; "
              f"iters mean {np.mean(np.asarray(sol.stats.iter_total)):.1f} "
              f"max {np.max(np.asarray(sol.stats.iter_total))}")

    if "variants" in stages:
        from lcqpow_tpu.mixed import _predictor_options
        from lcqpow_tpu.solver import solve
        b32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), batch)
        for rounds in (0, 1, 3):
            popts = _predictor_options(opts)
            popts = popts.replace(admm=dataclasses.replace(
                popts.admm, polish_active_set_rounds=rounds))
            fn = jax.jit(jax.vmap(lambda d, k: solve(d, popts, key=k)))
            sol, _ = timeit(f"pred32 polish_rounds={rounds}", fn, b32, keys)
            ok = np.asarray(sol.ret) == 0
            print(f"   ok {ok.sum()}/{B} "
                  f"iters max {np.max(np.asarray(sol.stats.iter_total))}")


if __name__ == "__main__":
    main()


def micro():
    """Micro-timings of the inner-solver pieces on the bench shapes."""
    import dataclasses as dc
    from lcqpow_tpu.mixed import _predictor_options
    from lcqpow_tpu.solver import build_workspace
    from lcqpow_tpu.solvers import admm
    from lcqpow_tpu.ops.chol import spd_inverse

    batch = make_batch()
    b32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), batch)
    opts = _predictor_options(lt.Options(print_level=lt.PrintLevel.NONE))
    cfg = opts.admm

    ws = jax.jit(jax.vmap(lambda d: build_workspace(d, opts)))(b32)
    jax.block_until_ready(ws.Minv)
    n = ws.P.shape[-1]
    m = ws.A.shape[-2]
    print(f"shapes: B={B} n={n} m={m}")

    q = b32.g
    st = jax.jit(jax.vmap(lambda w: admm.init_state(w)))(ws)

    timeit("factorize (workspace)", jax.jit(jax.vmap(
        lambda d: build_workspace(d, opts).Minv)), b32)

    y0 = jnp.zeros((B, m), jnp.float32)
    timeit("polish (1+3 rounds)", jax.jit(jax.vmap(
        lambda w, qq, yy: admm._polish(w, qq, yy, cfg))), ws, q, y0)

    cfg1 = dc.replace(cfg, polish_active_set_rounds=0)
    timeit("polish_solve x1", jax.jit(jax.vmap(
        lambda w, qq, yy: admm._polish(w, qq, yy, cfg1))), ws, q, y0)

    S = jnp.tile(jnp.eye(m, dtype=jnp.float32), (B, 1, 1)) \
        + 0.1 * ws.A @ ws.A.mT
    timeit("spd_inverse (B,m,m)", jax.jit(spd_inverse), S)
    from jax import lax as jlax
    timeit("cholesky (B,m,m)", jax.jit(jlax.linalg.cholesky), S)

    def admm25(w, qq, s):
        qs = w.c * w.D * qq
        def it(_, sxy):
            xs, zs, ys = sxy
            rhs = cfg.sigma * xs - qs + w.As.T @ (w.rho_vec * zs - ys)
            x_t = w.Minv @ rhs
            z_t = w.As @ x_t
            x_new = cfg.alpha * x_t + (1 - cfg.alpha) * xs
            z_rel = cfg.alpha * z_t + (1 - cfg.alpha) * zs
            z_new = jnp.clip(z_rel + w.rho_inv * ys, w.ls, w.us)
            y_new = ys + w.rho_vec * (z_rel - z_new)
            return x_new, z_new, y_new
        return jlax.fori_loop(0, 25, it, (s.x, s.z, s.y))

    timeit("admm x25", jax.jit(jax.vmap(admm25)), ws, q, st)

    timeit("full admm.solve", jax.jit(jax.vmap(
        lambda w, qq, s: admm.solve(w, qq, s, cfg).x)), ws, q, st)
