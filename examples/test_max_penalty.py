"""Expected-failure scenario — port of
``/root/reference/test/examples/test_max_penalty.cpp:49,75-79`` /
``interfaces/python/examples/test_max_penalty.py``: with
``max_penalty_parameter=1`` the warm-up homotopy cannot reach
complementarity and MUST fail with ``MAX_PENALTY_REACHED``.
"""

import lcqpow_tpu as lt


def main():
    data = lt.make_lcqp(Q=[[2.0, 0.0], [0.0, 2.0]], g=[-2.0, -2.0],
                        L=[[1.0, 0.0]], R=[[0.0, 1.0]])
    sol = lt.solve(data, lt.Options(print_level=lt.PrintLevel.NONE,
                                    max_penalty_parameter=1.0))
    ret = lt.ReturnValue(int(sol.ret))
    print("return:", ret.name)
    lt.print_message(ret)
    assert ret == lt.ReturnValue.MAX_PENALTY_REACHED, ret
    print("expected failure reproduced")


if __name__ == "__main__":
    main()
