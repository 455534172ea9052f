"""Batched-solve tests: vmap lockstep correctness and heterogeneous padding."""

import numpy as np
import jax
import jax.numpy as jnp

import lcqpow_tpu as lt
from lcqpow_tpu.problems import warm_up, random_lcqp

OPTS = lt.Options(print_level=lt.PrintLevel.NONE)


def test_batch_matches_single():
    problems = [random_lcqp(s, nV=6, nC=2, nComp=2) for s in range(4)]
    batched = lt.stack_lcqps(problems)
    bsol = lt.solve_batch(batched, OPTS)
    assert bsol.x.shape == (4, 6)
    for i, p in enumerate(problems):
        single = lt.solve(p, OPTS, key=jax.random.split(
            jax.random.PRNGKey(OPTS.seed), 4)[i])
        assert int(bsol.ret[i]) == int(single.ret)
        np.testing.assert_allclose(np.asarray(bsol.x[i]),
                                   np.asarray(single.x), atol=1e-9)
        assert int(bsol.stats.iter_total[i]) == int(single.stats.iter_total)


def test_batch_warmup_all_s_stationary():
    B = 16
    batched = lt.stack_lcqps([warm_up()] * B)
    sol = lt.solve_batch(batched, OPTS)
    assert np.all(np.asarray(sol.ret) == 0)
    assert np.all(np.asarray(sol.algo_status)
                  == lt.AlgorithmStatus.S_STATIONARY_SOLUTION)
    x = np.sort(np.asarray(sol.x), axis=1)
    np.testing.assert_allclose(x, np.tile([0., 1.], (B, 1)), atol=1e-7)


def test_mixed_status_batch():
    """Lanes fail independently: one infeasible instance must not poison the
    convergent lanes (per-instance done flags under vmapped while_loop)."""
    ok = warm_up()
    bad = lt.make_lcqp(Q=[[2., 0.], [0., 2.]], g=[-2., -2.],
                       L=[[1., 0.]], R=[[0., 1.]],
                       A=[[1., 0.]], lbA=[0.], ubA=[-1.])
    # pad ok to have an A row too so shapes match
    ok_padded = lt.pad_lcqp(ok, 2, 1, 1)
    batched = lt.stack_lcqps([ok_padded, bad, ok_padded])
    sol = lt.solve_batch(batched, OPTS)
    rets = np.asarray(sol.ret)
    assert rets[0] == lt.ReturnValue.SUCCESSFUL_RETURN
    assert rets[1] == lt.ReturnValue.SUBPROBLEM_SOLVER_ERROR
    assert rets[2] == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.sort(np.asarray(sol.x[0]))
    np.testing.assert_allclose(x, [0., 1.], atol=1e-7)


def test_pad_lcqp_preserves_solution():
    data = warm_up()
    padded = lt.pad_lcqp(data, nV=8, nC=3, nComp=4)
    assert padded.nV == 8 and padded.nC == 3 and padded.nComp == 4
    sol = lt.solve(padded, OPTS)
    assert int(sol.ret) == lt.ReturnValue.SUCCESSFUL_RETURN
    x = np.asarray(sol.x)
    np.testing.assert_allclose(np.sort(x[:2]), [0., 1.], atol=1e-7)
    np.testing.assert_allclose(x[2:], np.zeros(6), atol=1e-9)


def test_solve_many_heterogeneous():
    problems = [warm_up(), random_lcqp(1, nV=5, nC=1, nComp=1)]
    from lcqpow_tpu.batch import solve_many
    sol = solve_many(problems, OPTS)
    assert np.all(np.asarray(sol.ret) == 0)
    x = np.sort(np.asarray(sol.x[0]))[-2:]
    np.testing.assert_allclose(x, [0., 1.], atol=1e-7)


def test_solve_batch_chunked_matches_full():
    import numpy as np

    import lcqpow_tpu as lt
    from lcqpow_tpu.problems import random_lcqp

    problems = [random_lcqp(s, nV=5, nC=1, nComp=2) for s in range(6)]
    batch = lt.stack_lcqps(problems)
    opts = lt.Options(print_level=lt.PrintLevel.NONE)
    full = lt.solve_batch(batch, opts)
    chunked = lt.solve_batch(batch, opts, chunk=4)  # pad-and-trim path
    assert (np.asarray(chunked.ret) == np.asarray(full.ret)).all()
    # Tiny tolerance, not bitwise: XLA may tile/fuse differently per width.
    np.testing.assert_allclose(np.asarray(chunked.x), np.asarray(full.x),
                               atol=1e-10)
