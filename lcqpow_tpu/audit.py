"""Host-side float64 certificate audit of solved LCQPs.

The mixed-precision pipeline certifies in double-word f32 (unit roundoff
~2^-48) and snaps sub-noise-floor complementarity slacks to zero before
forming phi (see :func:`mixed.correct_and_certify`).  That snap mirrors the
reference subsolvers' exactly-on-bound constraint values, but it is an
approximation: a genuine slack just below the floor paired with a large
partner slack could in principle certify while its true f64 product exceeds
the tolerance (ADVICE r4 #2).  This module is the independent check: it
re-evaluates the certificate quantities in NumPy float64 on the host, with
no snapping, against the reference-default tolerances
(``/root/reference/src/Options.cpp:297-298``).

``bench.py`` runs this audit on every benchmark row; library users can call
:func:`audit_solution` directly on any :class:`solver.Solution`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .data import LCQPData
from .options import Options
from .solver import Solution
from .types import ReturnValue


def audit_solution(data: LCQPData, sol: Solution,
                   options: Optional[Options] = None) -> dict:
    """f64 host audit of one solve (or a batch: leading axis on every leaf).

    Returns a dict with, per certified lane, the worst-case f64
    complementarity product ``max_phi`` ((Lx-lbL)'(Rx-lbR), the quantity the
    reference tests at ``src/LCQProblem.cpp:1172-1185``) and primal
    constraint violation ``max_violation``; ``phi_ok`` is the verdict
    against the audit tolerance (the options' complementarity tolerance).
    Uncertified lanes are excluded (their iterates are reported failures,
    not solution-quality claims); ``audited`` counts the lanes checked.
    """
    options = options or Options()
    x = np.asarray(sol.x, np.float64)
    ret = np.asarray(sol.ret)
    batched = x.ndim == 2
    if not batched:
        x = x[None]
        ret = np.asarray(ret).reshape(1)

    def lane(leaf, i):
        a = np.asarray(leaf, np.float64)
        return a[i] if batched else a

    ok = ret == int(ReturnValue.SUCCESSFUL_RETURN)
    max_phi = 0.0
    max_viol = 0.0
    for i in np.nonzero(ok)[0]:
        L = lane(data.L, i)
        R = lane(data.R, i)
        sL = L @ x[i] - lane(data.lbL, i)
        sR = R @ x[i] - lane(data.lbR, i)
        max_phi = max(max_phi, abs(sL @ sR))
        # Stacked constraint system [A; L; R; box] violation.
        for M, lo, hi in ((lane(data.A_full, i), lane(data.lbA_full, i),
                           lane(data.ubA_full, i)),
                          (np.eye(x.shape[1]), lane(data.lb, i),
                           lane(data.ub, i))):
            v = M @ x[i]
            max_viol = max(max_viol,
                           float(np.max(np.maximum(lo - v, v - hi),
                                        initial=0.0)))
    audited = int(ok.sum())
    return dict(
        audited=audited,
        total=int(ret.shape[0]),
        max_phi=float(max_phi) if audited else None,
        max_violation=float(max_viol) if audited else None,
        phi_ok=bool(max_phi <= options.complementarity_tolerance)
        if audited else None,
    )
