"""Instance batching.

The reference is strictly single-problem, single-threaded; its scaling story
is per-problem sparsity (SURVEY.md §2 parallelism inventory: none).  On TPU
the scaling axis is *batching*: thousands of independent LCQP instances are
solved in lockstep by ``vmap``-ing the homotopy driver — every inner ADMM
matvec becomes one large batched MXU contraction, and per-instance ``done``
flags let finished instances idle inside the shared ``while_loop`` (JAX's
batching rule for ``while_loop`` masks carries of finished lanes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .data import LCQPData, stack_lcqps, pad_lcqp
from .options import Options
from .solver import Solution, solve
from .types import PrintLevel


def chunked_call(vf, args, batch: int, chunk: int, sync: bool = True):
    """Host-side loop over ONE compiled chunk executable.

    ``vf`` is an (unjitted) width-``chunk``-agnostic vmapped callable;
    ``args`` a tuple of batch-leading pytrees.  The batch is padded to a
    chunk multiple by repeating leading lanes, dispatched chunk by chunk,
    and the results concatenated on device and trimmed.

    Deliberately NOT a device-side ``lax.map``: wrapping the chunk in a
    device loop rebuilds the full-fleet program, which overwhelms the
    remote TPU compile worker at exactly the medium/large shapes chunking
    exists for (round-2 boundary: circle N=100 — m=505 — compiled at width
    8 and died at 16; the smaller post-compression program compiles up to
    width 64 there, and 32 is the tuned default).  Shared by
    :func:`solve_batch`, :func:`mixed.solve_batch_mixed` and ``bench.py``.

    ``sync`` (default on): a scalar device->host readback after each chunk
    dispatch, bounding the in-flight execution queue to depth 1.  On the
    tunneled-TPU transport an unbounded async queue of medium-shape chunk
    executions crashed the remote worker (round-3 bench: 16 queued circle
    chunks died at the first ``block_until_ready``; one chunk standalone
    ran fine).  Costs one ~30 ms transport round trip per chunk — noise
    next to a medium-shape chunk's execution time.  Values are unchanged;
    the results still differ from a full-width vmap only by f32 summation
    order (tests assert agreement to tight tolerances, not bitwise).
    """
    import numpy as np

    # The per-chunk sync readback requires fully-addressable outputs; on a
    # multi-host fleet the shards live on non-addressable devices and
    # np.asarray would raise (ADVICE r4 #1).  The readback exists only to
    # bound the tunneled single-chip transport's dispatch queue, which is
    # not the multi-host topology, so skip it there.
    if jax.process_count() > 1:
        sync = False

    nch = -(-batch // chunk)
    pad = nch * chunk - batch

    def padded(a):
        return jnp.concatenate([a, a[:pad]], axis=0) if pad else a

    pargs = jax.tree.map(padded, tuple(args))
    # Accept an ALREADY-jitted callable and dispatch through it directly:
    # wrapping it in a fresh ``jax.jit`` would create a new Python-level
    # wrapper whose trace cache starts empty, so every caller-side reuse of
    # one compiled chunk executable (the escalation retries in
    # ``mixed._escalate_failed``) would re-trace the full program — tens of
    # seconds for the medium-shape pipeline even on a persistent-cache hit.
    vfj = vf if isinstance(vf, jax.stages.Wrapped) else jax.jit(vf)
    outs = []
    for i in range(nch):
        o = vfj(*jax.tree.map(lambda a: a[i * chunk:(i + 1) * chunk], pargs))
        if sync:
            _ = np.asarray(jax.tree.leaves(o)[0].ravel()[0])
        outs.append(o)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[:batch],
                        *outs)


def solve_batch(data: LCQPData, options: Options = Options(),
                x0: Optional[jnp.ndarray] = None,
                y0: Optional[jnp.ndarray] = None,
                key: Optional[jax.Array] = None,
                chunk: Optional[int] = None) -> Solution:
    """Solve a batch of LCQPs (leading batch axis on every leaf of ``data``
    and on ``x0``/``y0`` if given).  Returns a batched :class:`Solution`.

    Iteration printing is force-disabled (interleaved per-lane output is
    meaningless); per-instance statistics are returned instead.

    ``chunk``: process the fleet as a host-side loop over one compiled
    chunk-width executable — bounds compile-time and memory working set for
    medium/large per-instance shapes (see :func:`chunked_call` for the
    measured rationale).
    """
    options = options.replace(print_level=PrintLevel.NONE)
    leaf = jax.tree.leaves(data)[0]
    batch = leaf.shape[0]
    if key is None:
        key = jax.random.PRNGKey(options.seed)
    keys = jax.random.split(key, batch)
    # vmap requires every mapped input's batch axis to share one sharding;
    # match the per-instance keys to the (possibly mesh-sharded) data.
    from jax.sharding import NamedSharding, PartitionSpec
    sh = getattr(leaf, "sharding", None)
    if isinstance(sh, NamedSharding) and len(sh.spec) and sh.spec[0] is not None:
        keys = jax.device_put(
            keys, NamedSharding(sh.mesh, PartitionSpec(sh.spec[0])))

    # x0/y0 presence is static; build the matching positional vmap.  The
    # vmapped solve runs under jit so XLA propagates any mesh sharding on the
    # inputs through the whole batched program (eager vmap would instead
    # require identical shardings on every mapped input).
    sig = []
    args = [data, keys]
    if x0 is not None:
        args.append(jnp.asarray(x0))
        sig.append("x0")
    if y0 is not None:
        args.append(jnp.asarray(y0))
        sig.append("y0")

    def single(d, k, *rest):
        kwz = dict(zip(sig, rest))
        return solve(d, options, x0=kwz.get("x0"), y0=kwz.get("y0"), key=k)

    vf = jax.vmap(single, in_axes=(0,) * (2 + len(sig)))
    if chunk is not None and 0 < chunk < batch:
        return chunked_call(vf, tuple(args), batch, chunk)
    return jax.jit(vf)(*args)


def solve_many(problems, options: Options = Options(),
               key: Optional[jax.Array] = None) -> Solution:
    """Convenience: stack a list of equally-shaped :class:`LCQPData` (padding
    first with :func:`pad_lcqp` if needed) and solve as one batch."""
    problems = list(problems)
    nV = max(p.nV for p in problems)
    nC = max(p.nC for p in problems)
    nK = max(p.nComp for p in problems)
    padded = [pad_lcqp(p, nV, nC, nK) for p in problems]
    return solve_batch(stack_lcqps(padded), options, key=key)
