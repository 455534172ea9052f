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


def solve_batch(data: LCQPData, options: Options = Options(),
                x0: Optional[jnp.ndarray] = None,
                y0: Optional[jnp.ndarray] = None,
                key: Optional[jax.Array] = None) -> Solution:
    """Solve a batch of LCQPs (leading batch axis on every leaf of ``data``
    and on ``x0``/``y0`` if given).  Returns a batched :class:`Solution`.

    Iteration printing is force-disabled (interleaved per-lane output is
    meaningless); per-instance statistics are returned instead.
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
    if x0 is not None and y0 is not None:
        vf = jax.jit(jax.vmap(
            lambda d, k, a, b: solve(d, options, x0=a, y0=b, key=k),
            in_axes=(0, 0, 0, 0)))
        return vf(data, keys, x0, y0)
    if x0 is not None:
        vf = jax.jit(jax.vmap(lambda d, k, a: solve(d, options, x0=a, key=k),
                              in_axes=(0, 0, 0)))
        return vf(data, keys, x0)
    if y0 is not None:
        vf = jax.jit(jax.vmap(lambda d, k, b: solve(d, options, y0=b, key=k),
                              in_axes=(0, 0, 0)))
        return vf(data, keys, y0)
    vf = jax.jit(jax.vmap(lambda d, k: solve(d, options, key=k),
                          in_axes=(0, 0)))
    return vf(data, keys)


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
