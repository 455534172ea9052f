"""Headline benchmark: batched warm-up-class LCQP solves per second per chip.

North star (BASELINE.md / BASELINE.json): >= 10,000 batched warm-up-class
solves/sec/chip at matched optimality gap.  ``vs_baseline`` is measured
throughput divided by that target.  Every counted solve is certified in
float64 against the reference-default stationarity/complementarity tolerances
(/root/reference/src/Options.cpp:297-298) — the "matched optimality gap"
condition — by the mixed-precision pipeline (f32 homotopy predictor + f64
corrector, lcqpow_tpu/mixed.py).

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.

Environment knobs:
  LCQPOW_BENCH_BATCH   batch size (default 4096)
  LCQPOW_BENCH_REPS    timed repetitions (default 3)
  LCQPOW_BENCH_MODE    "mixed" (default) | "f64" (pure-f64 reference path)
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
    import jax
    # This JAX build ignores the JAX_COMPILATION_CACHE_DIR env var; the
    # config key must be set explicitly.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    import lcqpow_tpu as lt
    from lcqpow_tpu.problems import random_lcqp

    B = int(os.environ.get("LCQPOW_BENCH_BATCH", "4096"))
    reps = int(os.environ.get("LCQPOW_BENCH_REPS", "3"))
    mode = os.environ.get("LCQPOW_BENCH_MODE", "mixed")

    log(f"devices: {jax.devices()}")
    log(f"x64: {jax.config.jax_enable_x64}, batch: {B}, mode: {mode}")

    # Warm-up-class instances: small strictly convex LCQPs with
    # complementarity pairs (BASELINE.json randomized-batch config).
    # Fleet assembly stays entirely in NumPy (as_numpy=True): on the
    # tunneled-TPU transport any device->host readback during setup would
    # flip the process into a ~33 ms-per-launch synchronous dispatch mode.
    rng = np.random.default_rng(0)
    problems = [random_lcqp(rng, nV=8, nC=2, nComp=2, as_numpy=True)
                for _ in range(64)]
    base = jax.tree.map(lambda *xs: np.stack(xs), *problems)
    # Tile to the full batch (distinct leading-axis data per lane).
    reps_needed = -(-B // 64)
    batch = jax.tree.map(
        lambda x: np.tile(x, (reps_needed,) + (1,) * (x.ndim - 1))[:B],
        base)
    # Perturb the gradients so every lane is a distinct instance.
    import dataclasses
    batch = dataclasses.replace(
        batch, g=batch.g + 0.01 * rng.normal(size=(B, 8)))
    batch = jax.tree.map(jax.numpy.asarray, batch)

    # The warm-up class converges in ~15 homotopy iterations; 200 bounds the
    # lockstep loop without changing outcomes.
    opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=200)

    if mode == "mixed":
        from lcqpow_tpu.mixed import solve_mixed
        step = lambda d, k: solve_mixed(d, opts, key=k)
    else:
        from lcqpow_tpu.solver import solve
        step = lambda d, k: solve(d, opts, key=k)
    fn = jax.jit(jax.vmap(step, in_axes=(0, 0)))
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    t0 = time.time()
    sol = fn(batch, keys)
    jax.block_until_ready(sol.x)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    # Timed reps BEFORE any device->host readback: on the tunneled-TPU
    # transport, the first host readback permanently switches the process
    # into a synchronous dispatch mode costing ~33 ms per program launch
    # (~10% of a rep here).  block_until_ready only waits — it does not
    # read — so the timing loop stays in async mode; all verification
    # readbacks happen below, after timing.
    times = []
    for r in range(reps):
        t0 = time.time()
        sol = fn(batch, keys)
        jax.block_until_ready(sol.x)
        times.append(time.time() - t0)
    t = min(times)

    ok = np.asarray(sol.ret) == 0
    n_ok = int(ok.sum())
    log(f"certified {n_ok}/{B}; mean iters "
        f"{float(np.mean(np.asarray(sol.stats.iter_total))):.1f}")

    # Independent host-side audit of the optimality gap on a sample.
    xs = np.asarray(sol.x, dtype=np.float64)
    max_phi = 0.0
    for i in range(0, B, max(1, B // 64)):
        L = np.asarray(batch.L[i], np.float64)
        R = np.asarray(batch.R[i], np.float64)
        max_phi = max(max_phi, abs((L @ xs[i]) @ (R @ xs[i])))
    log(f"max |phi| on sample: {max_phi:.3e}")
    # Only certified solves count toward the throughput claim.
    throughput = n_ok / t
    log(f"times: {[f'{x:.3f}' for x in times]}; best {t:.3f}s "
        f"-> {throughput:.0f} certified solves/s")

    print(json.dumps({
        "metric": "warmup_class_solves_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "solves/s",
        "vs_baseline": round(throughput / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
