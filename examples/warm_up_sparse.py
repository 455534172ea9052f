"""Warm-up loaded from scipy.sparse CSC matrices — port of
``/root/reference/interfaces/python/examples/warm_up_sparse.py`` (which the
reference marks experimental because its binding lacks switchToSparseMode,
``README.md:88``; this framework implements the full mode protocol).
"""

import numpy as np

import lcqpow_tpu as lt


def main():
    try:
        import scipy.sparse as sp
    except ImportError:
        print("scipy not available; using dense + switch_to_sparse_mode")
        sp = None

    Q = [[2.0, 0.0], [0.0, 2.0]]
    L = [[1.0, 0.0]]
    R = [[0.0, 1.0]]
    if sp is not None:
        Q, L, R = sp.csc_matrix(Q), sp.csc_matrix(L), sp.csc_matrix(R)

    lcqp = lt.LCQProblem(nV=2, nC=0, nComp=1)
    lcqp.set_options(lt.Options(
        print_level=lt.PrintLevel.INNER_LOOP_ITERATES,
        qp_solver=lt.QPSolver.QPOASES_SPARSE))
    ret = lcqp.load_lcqp(Q=Q, g=[-2.0, -2.0], L=L, R=R,
                         x0=np.array([1.0, 1.0]))
    assert ret == lt.ReturnValue.SUCCESSFUL_RETURN
    if sp is None:
        lcqp.switch_to_sparse_mode()
    ret = lcqp.run_solver()
    assert ret == lt.ReturnValue.SUCCESSFUL_RETURN, ret
    print("xOpt =", lcqp.get_primal_solution())


if __name__ == "__main__":
    main()
