"""Headline benchmark: batched warm-up-class LCQP solves per second per chip.

North star (BASELINE.md / BASELINE.json): >= 10,000 batched warm-up-class
solves/sec/chip at matched optimality gap.  ``vs_baseline`` is measured
throughput divided by that target.

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.

Environment knobs:
  LCQPOW_BENCH_BATCH   batch size (default 4096)
  LCQPOW_BENCH_REPS    timed repetitions (default 3)
  LCQPOW_TPU_NO_X64=1  run in float32
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import numpy as np

    import lcqpow_tpu as lt
    from lcqpow_tpu.problems import random_lcqp
    from lcqpow_tpu.solver import solve

    B = int(os.environ.get("LCQPOW_BENCH_BATCH", "4096"))
    reps = int(os.environ.get("LCQPOW_BENCH_REPS", "3"))

    log(f"devices: {jax.devices()}")
    log(f"x64: {jax.config.jax_enable_x64}, batch: {B}")

    # Warm-up-class instances: small strictly convex LCQPs with
    # complementarity pairs (BASELINE.json randomized-batch config).
    rng = np.random.default_rng(0)
    problems = [random_lcqp(rng, nV=8, nC=2, nComp=2) for _ in range(64)]
    base = lt.stack_lcqps(problems)
    # Tile to the full batch (distinct leading-axis data per lane).
    reps_needed = -(-B // 64)
    batch = jax.tree.map(
        lambda x: np.tile(np.asarray(x), (reps_needed,) + (1,) * (x.ndim - 1))[:B],
        base)
    # Perturb the gradients so every lane is a distinct instance.
    g = np.asarray(batch.g) + 0.01 * rng.normal(size=(B, 8))
    import dataclasses
    batch = dataclasses.replace(batch, g=jax.numpy.asarray(g))

    opts = lt.Options(print_level=lt.PrintLevel.NONE)

    fn = jax.jit(jax.vmap(lambda d, k: solve(d, opts, key=k),
                          in_axes=(0, 0)))
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    t0 = time.time()
    sol = fn(batch, keys)
    jax.block_until_ready(sol.x)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    ok = int(np.sum(np.asarray(sol.ret) == 0))
    log(f"solved {ok}/{B}; mean iters "
        f"{float(np.mean(np.asarray(sol.stats.iter_total))):.1f}")

    # Optimality-gap check on a sample: complementarity + stationarity.
    xs = np.asarray(sol.x)
    phis = []
    for i in range(0, B, max(1, B // 64)):
        L = np.asarray(batch.L[i]); R = np.asarray(batch.R[i])
        phis.append(abs((L @ xs[i]) @ (R @ xs[i])))
    log(f"max |phi| on sample: {max(phis):.3e}")

    times = []
    for r in range(reps):
        t0 = time.time()
        sol = fn(batch, keys)
        jax.block_until_ready(sol.x)
        times.append(time.time() - t0)
    t = min(times)
    throughput = B / t
    log(f"times: {[f'{x:.3f}' for x in times]}; best {t:.3f}s "
        f"-> {throughput:.0f} solves/s")

    print(json.dumps({
        "metric": "warmup_class_solves_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "solves/s",
        "vs_baseline": round(throughput / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
