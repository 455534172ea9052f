"""Options validation semantics (reference ``src/Options.cpp``: every setter
warns and restores the default on invalid input instead of raising)."""

import warnings

import pytest

import lcqpow_tpu as lt
from lcqpow_tpu.constants import EPS


def test_defaults_match_reference():
    # src/Options.cpp:296-333
    o = lt.Options()
    assert o.complementarity_tolerance == pytest.approx(1e3 * EPS)
    assert o.stationarity_tolerance == pytest.approx(1e6 * EPS)
    assert o.initial_penalty_parameter == 0.01
    assert o.penalty_update_factor == 2.0
    assert o.solve_zero_penalty_first is True
    assert o.perturb_step is True
    assert o.max_iterations == 1000
    assert o.max_penalty_parameter == 1e8
    assert o.n_dynamic_penalty == 3
    assert o.eta_dynamic_penalty == 0.9
    assert o.print_level == lt.PrintLevel.INNER_LOOP_ITERATES
    assert o.store_steps is False
    assert o.qp_solver == lt.QPSolver.QPOASES_DENSE


@pytest.mark.parametrize("field,bad,default", [
    ("complementarity_tolerance", 0.0, 1e3 * EPS),
    ("stationarity_tolerance", -1.0, 1e6 * EPS),
    ("initial_penalty_parameter", -0.5, 0.01),
    ("penalty_update_factor", 1.0, 2.0),
    ("max_penalty_parameter", 0.0, 1e8),
    ("max_iterations", 0, 1000),
    ("eta_dynamic_penalty", 1.5, 0.9),
])
def test_invalid_value_warns_and_restores_default(field, bad, default):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        o = lt.Options(**{field: bad})
    assert len(w) == 1, [str(x.message) for x in w]
    assert getattr(o, field) == pytest.approx(default)


def test_admm_options_validation():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        a = lt.ADMMOptions(rho=-1.0, alpha=3.0)
    assert len(w) == 2
    assert a.rho == 0.1 and a.alpha == 1.6


def test_replace_revalidates():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        o = lt.Options().replace(penalty_update_factor=0.5)
    assert len(w) == 1
    assert o.penalty_update_factor == 2.0


def test_options_hashable_static():
    # Options are static jit args: must be hashable and equal by value.
    a, b = lt.Options(), lt.Options()
    assert hash(a) == hash(b) and a == b
    assert hash(a.replace(seed=1)) != hash(a) or a.replace(seed=1) != a


def test_kkt_form_validation_and_resolution():
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        a = lt.ADMMOptions(kkt_form="bogus")
    assert len(w) == 1 and a.kkt_form == "auto"

    # Structural auto-resolution (mixed pipeline): accumulation-free rows
    # resolve to "range", rows that pile onto few variables to "schur",
    # small shapes always to "schur"; explicit settings pass through.
    from lcqpow_tpu.mixed import _resolve_kkt_form
    from lcqpow_tpu.problems import optimize_on_circle, warm_up
    from lcqpow_tpu import io
    import os

    opts = lt.Options()
    small = _resolve_kkt_form(warm_up(), opts)
    assert small.admm.kkt_form == "schur"
    c100, _ = optimize_on_circle(100)
    assert _resolve_kkt_form(c100, opts).admm.kkt_form == "schur"
    c20, _ = optimize_on_circle(20)
    assert _resolve_kkt_form(c20, opts).admm.kkt_form == "range"
    ref = "/root/reference/examples/example_data"
    if os.path.isdir(ref):
        ocp = io.load_lcqp_from_files(ref)
        assert _resolve_kkt_form(ocp, opts).admm.kkt_form == "range"
    forced = opts.replace(admm=lt.ADMMOptions(kkt_form="schur"))
    assert _resolve_kkt_form(c20, forced).admm.kkt_form == "schur"
