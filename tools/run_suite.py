"""Sharded CPU-suite runner: parallel pytest shards + cache-crash fallback.

Why this exists (VERDICT r4 Weak #6 / next-round #7): the full suite in one
process runs ~29 min cache-less.  The persistent compile cache cuts that to
~13 min, but this jax build's XLA:CPU executable serializer can segfault
deterministically on specific executables (see tests/conftest.py), so cache
writes were made opt-in.  Sharding the suite into separate processes

* lets the cache be ON per shard (a serializer crash kills one shard, whose
  retry then runs cache-less — the suite still completes);
* bounds each process's memory-map count (the round-1 vm.max_map_count
  crash) independently of suite growth;
* overlaps shards across host cores.

Shards are balanced by measured per-file durations (the --durations=25
profile of a cache-warm run).  Exit code is non-zero iff any test failed
after retries.

Usage: python tools/run_suite.py [-j N] [extra pytest args...]
"""

import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Measured cache-warm durations (s) per test file; see module docstring.
_WEIGHTS = {
    "test_mixed.py": 290,
    "test_examples.py": 160,
    "test_pas.py": 50,
    "test_solver_warmup.py": 50,
    "test_batch.py": 40,
    "test_sharding.py": 40,
    "test_multihost.py": 40,
    "test_csc_native_messages.py": 30,
    "test_api.py": 25,
    "test_admm_adaptive.py": 15,
    "test_df32.py": 10,
    "test_options.py": 5,
    "test_linalg.py": 5,
}


def make_shards(n: int):
    """Greedy longest-processing-time partition of the test files."""
    files = sorted(
        (f for f in os.listdir(os.path.join(REPO, "tests"))
         if f.startswith("test_") and f.endswith(".py")),
        key=lambda f: -_WEIGHTS.get(f, 20))
    shards = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in files:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += _WEIGHTS.get(f, 20)
    return [s for s in shards if s]


def run_shard(idx: int, files, extra, results):
    paths = [os.path.join("tests", f) for f in files]
    base = [sys.executable, "-m", "pytest", "-q", *extra, *paths]
    env = dict(os.environ, LCQPOW_TPU_TEST_CACHE="1")
    t0 = time.time()
    p = subprocess.run(base, cwd=REPO, env=env)
    rc = p.returncode
    if rc < 0 or rc in (134, 139):
        # Killed by a signal — the known XLA:CPU cache-serializer crash
        # profile.  Retry once with the persistent cache fully off.
        print(f"[shard {idx}] crashed (rc={rc}); retrying cache-less",
              file=sys.stderr, flush=True)
        env["LCQPOW_TPU_TEST_CACHE"] = "0"
        p = subprocess.run(base, cwd=REPO, env=env)
        rc = p.returncode
    results[idx] = rc
    print(f"[shard {idx}] rc={rc} in {time.time() - t0:.0f}s "
          f"({', '.join(files)})", file=sys.stderr, flush=True)


def main():
    args = sys.argv[1:]
    jobs = 2
    if args[:1] == ["-j"]:
        jobs = int(args[1])
        args = args[2:]
    elif args and args[0].startswith("-j"):
        jobs = int(args[0][2:])
        args = args[1:]
    shards = make_shards(jobs)
    results = {}
    threads = [threading.Thread(target=run_shard, args=(i, s, args, results))
               for i, s in enumerate(shards)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bad = {i: rc for i, rc in results.items() if rc != 0}
    print(f"[suite] {len(shards)} shards in {time.time() - t0:.0f}s; "
          f"failures: {bad or 'none'}", file=sys.stderr, flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
