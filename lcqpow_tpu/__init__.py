"""lcqpow_tpu — a TPU-native solver framework for Quadratic Programs with
linear Complementarity Constraints (LCQPs).

A from-scratch JAX/XLA re-design with the capabilities of the reference C++
solver LCQPow (nosnoc/LCQPow): the same penalty-homotopy / sequential convex
programming algorithm, options, statistics, stationarity classification and
workloads — built TPU-first:

* one immutable, fixed-shape, dense problem pytree (:class:`LCQPData`);
* a pure, jittable homotopy driver on ``lax.while_loop`` (:func:`solve`);
* a batched inner convex-QP engine (OSQP-style ADMM) whose KKT operator is
  Cholesky-factorized **once** per problem and reused across the entire
  homotopy — the TPU analogue of the reference's factorize-once + hotstart;
* instance batching via ``vmap`` (:func:`solve_batch`) and multi-chip /
  multi-host scaling via ``jax.sharding`` over a device mesh
  (:mod:`lcqpow_tpu.parallel`);
* a reference-compatible object API (:class:`LCQProblem`) for drop-in ports
  of existing LCQPow scripts.

Quick start::

    import lcqpow_tpu as lt
    data = lt.make_lcqp(Q=[[2,0],[0,2]], g=[-2,-2], L=[[1,0]], R=[[0,1]])
    sol = lt.solve(data, lt.Options(print_level=lt.PrintLevel.NONE))
    print(sol.x, lt.AlgorithmStatus(int(sol.algo_status)))
"""

from . import _config  # noqa: F401  (enables x64 unless LCQPOW_TPU_NO_X64=1)

from .constants import EPS, INFTY, ZERO
from .types import AlgorithmStatus, PrintLevel, QPSolver, ReturnValue
from .options import ADMMOptions, Options
from .data import LCQPData, LCQPError, make_lcqp, pad_lcqp, stack_lcqps
from .stats import Stats, Trajectories
from .solver import Solution, solve
from .batch import solve_batch
from .mixed import solve_mixed, solve_batch_mixed
from .compat import LCQProblem
from .audit import audit_solution
from .messages import message, print_message, print_solution, solution_banner
from . import io
from . import messages
from . import ops
from . import parallel

__version__ = "0.2.0"

__all__ = [
    "EPS", "INFTY", "ZERO",
    "AlgorithmStatus", "PrintLevel", "QPSolver", "ReturnValue",
    "ADMMOptions", "Options",
    "LCQPData", "LCQPError", "make_lcqp", "pad_lcqp", "stack_lcqps",
    "Stats", "Trajectories",
    "Solution", "solve", "solve_batch", "solve_mixed", "solve_batch_mixed",
    "LCQProblem", "audit_solution",
    "message", "print_message", "print_solution", "solution_banner",
    "io", "messages", "ops", "parallel",
]
