"""Multi-host (multi-process) correctness: 2 CPU processes, one global mesh.

The reference is strictly single-process (SURVEY.md §2); multi-host sharding
is new TPU-native capability, so its test has no reference counterpart — the
oracle is: the global fleet solved through ``jax.distributed`` +
``host_local_batch_to_global`` + ``solve_batch_sharded`` must match the
single-process solution of the same fleet.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
except Exception as e:  # pragma: no cover - environment without distributed
    print("DISTRIBUTED_UNSUPPORTED", e)
    sys.exit(42)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np
import lcqpow_tpu as lt
from lcqpow_tpu.parallel import fleet_summary, make_mesh, \
    solve_batch_sharded
from lcqpow_tpu.parallel.distributed import host_local_batch_to_global
from lcqpow_tpu.problems import random_lcqp, warm_up

mesh = make_mesh()          # global mesh over 2*2 = 4 devices
local_B = 2
# Per-host local shard: host 0 gets warm_ups, host 1 gets random instances
# padded to the warm-up shape (heterogeneous global fleet).
from lcqpow_tpu.data import pad_lcqp
if pid == 0:
    probs = [warm_up() for _ in range(local_B)]
else:
    probs = [random_lcqp(500 + i, nV=2, nC=0, nComp=1) for i in range(local_B)]
local = lt.stack_lcqps([pad_lcqp(p, 2, 0, 1) for p in probs])
global_batch = host_local_batch_to_global(local, mesh)
opts = lt.Options(print_level=lt.PrintLevel.NONE, max_iterations=100)
sol = solve_batch_sharded(global_batch, opts, mesh=mesh)
jax.block_until_ready(sol.x)
summary = fleet_summary(sol)
assert summary["total"] == local_B * nproc, summary
assert summary["solved"] == local_B * nproc, summary
# Single-process ground truth of THIS host's shard, compared against the
# global result's addressable part.
ref = lt.solve_batch(local, opts)
# The global batch is sharded by host order: host pid owns rows
# [pid*local_B, (pid+1)*local_B).  Fully-addressable gather:
mine = np.asarray(
    jax.jit(lambda s: s, out_shardings=None)(sol.x)[
        pid * local_B:(pid + 1) * local_B])
np.testing.assert_allclose(mine, np.asarray(ref.x), atol=1e-9)
print("WORKER_OK", pid)
"""


@pytest.mark.skipif(os.environ.get("LCQPOW_TPU_TEST_TPU", "0") == "1",
                    reason="multi-process CPU test")
def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = "51723"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # The worker script lives in tmp_path, so sys.path[0] is the tmp dir —
    # the repo root must come via PYTHONPATH (appended: the environment may
    # carry required entries, e.g. the axon TPU plugin's site dir).
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process solve timed out")
        outs.append((p.returncode, out))
    if any(rc == 42 for rc, _ in outs):
        pytest.skip("jax.distributed unsupported in this environment")
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    assert "WORKER_OK 0" in outs[0][1]
    assert "WORKER_OK 1" in outs[1][1]
