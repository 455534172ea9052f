"""Solve an LCQP loaded from whitespace-separated ``.txt`` files (port of
``/root/reference/examples/solve_lcqp_from_file.cpp``).

Usage: python examples/solve_lcqp_from_file.py [data_dir]

The directory must contain ``Q.txt g.txt L.txt R.txt`` and may contain
``lbL ubL lbR ubR A lbA ubA lb ub x0`` — the reference's
``examples/example_data`` layout (nV=151, nC=50, nComp=100 OCP instance).
"""

import sys

import lcqpow_tpu as lt
from lcqpow_tpu import io


def main():
    d = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/reference/examples/example_data"
    data = io.load_lcqp_from_files(d)
    x0 = io.load_x0_from_files(d)
    print(f"Loaded LCQP: nV={data.nV}, nC={data.nC}, nComp={data.nComp}")

    options = lt.Options(print_level=lt.PrintLevel.INNER_LOOP_ITERATES,
                         qp_solver=lt.QPSolver.QPOASES_SPARSE)
    sol = lt.solve(data, options, x0=x0)

    stats = sol.stats
    print(f"\nret = {lt.ReturnValue(int(sol.ret)).name}; "
          f"status = {lt.AlgorithmStatus(int(sol.algo_status)).name}; "
          f"i = {int(stats.iter_total)}; rho = {float(stats.rho_opt):g}")
    print("x[:6] =", [round(float(v), 6) for v in sol.x[:6]])


if __name__ == "__main__":
    main()
