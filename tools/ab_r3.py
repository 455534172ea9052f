"""Round-3 on-chip A/B: isolate the remaining warm-up predictor slowdown.

Variants of the f32 predictor at the headline batch, each reporting time,
certified count, and the accumulated inner-QP (ADMM) iteration counters —
the canary for whether polish-first accepts (round 1: ~0; round 2: 17-28).
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import lcqpow_tpu as lt
from lcqpow_tpu.mixed import _predictor_options
from lcqpow_tpu.problems import random_lcqp
from lcqpow_tpu.solver import solve

B = int(os.environ.get("LCQPOW_BENCH_BATCH", "4096"))


def make_batch():
    rng = np.random.default_rng(0)
    problems = [random_lcqp(rng, nV=8, nC=2, nComp=2, as_numpy=True)
                for _ in range(64)]
    base = jax.tree.map(lambda *xs: np.stack(xs), *problems)
    reps_needed = -(-B // 64)
    batch = jax.tree.map(
        lambda x: np.tile(x, (reps_needed,) + (1,) * (x.ndim - 1))[:B], base)
    batch = dataclasses.replace(
        batch, g=batch.g + 0.01 * rng.normal(size=(B, 8)))
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), batch)


def run(name, popts, batch, keys, reps=3):
    fn = jax.jit(jax.vmap(lambda d, k: solve(d, popts, key=k)))
    t0 = time.time()
    sol = fn(batch, keys)
    jax.block_until_ready(sol.x)
    tc = time.time() - t0
    times = []
    for r in range(reps):
        # Fresh PRNG keys per rep + a scalar READBACK inside the timed
        # region: on the tunneled-TPU transport block_until_ready can return
        # before execution finishes (measured: 0.1 ms "timings" for a 600 ms
        # solve), so only a device->host readback gives honest wall clock.
        kr = jax.random.split(jax.random.PRNGKey(100 + r), B)
        t0 = time.time()
        sol = fn(batch, kr)
        _ = int(np.asarray(sol.ret[0]))
        times.append(time.time() - t0)
    t = min(times)
    ok = int((np.asarray(sol.ret) == 0).sum())
    sub = np.asarray(sol.stats.subproblem_iter)
    it = np.asarray(sol.stats.iter_total)
    print(f"{name:35s} {t*1e3:8.1f} ms ({B/t:8.0f}/s) ok {ok}/{B} "
          f"sub-iters mean {sub.mean():5.1f} max {sub.max():4d} "
          f"homotopy mean {it.mean():4.1f}  compile {tc:.0f}s", flush=True)
    return t


def main():
    # ONE variant per process: the tunneled-TPU transport's timing behavior
    # changes after the first device->host readback, so timing a second
    # variant in the same process is not comparable to bench.py's numbers.
    batch = make_batch()
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200)
    p0 = _predictor_options(opts)

    # NB: adaptive_rho is OFF in the predictor defaults since round 3 —
    # "adapt-on" is the opt-in variant now.
    variants = {
        "current": p0,
        "adapt-on": p0.replace(
            admm=dataclasses.replace(p0.admm, adaptive_rho=True)),
        "precond-1e-5": p0.replace(
            admm=dataclasses.replace(p0.admm, polish_precond_delta=1e-5)),
        "rounds-1": p0.replace(
            admm=dataclasses.replace(p0.admm, polish_active_set_rounds=1)),
        "drop-murty": p0.replace(
            admm=dataclasses.replace(p0.admm, polish_drop_rule="murty")),
        "drop-single": p0.replace(
            admm=dataclasses.replace(p0.admm, polish_drop_rule="single")),
        "check-50": p0.replace(
            admm=dataclasses.replace(p0.admm, check_interval=50)),
    }
    name = sys.argv[1] if len(sys.argv) > 1 else "current"
    run(name, variants[name], batch, keys)


if __name__ == "__main__":
    main()
