"""Numeric constants, mirroring the reference's ``Utilities`` constants.

Reference: ``/root/reference/include/Utilities.hpp:345-362`` defines
``EPS`` (machine epsilon), ``ZERO`` (treat-as-zero threshold) and ``INFTY``
(stand-in for infinity).  We keep the same values; in particular using a
*finite* ``INFTY`` (1e20) instead of IEEE inf keeps all internal arithmetic
NaN-free (e.g. ``0 * INFTY`` in masked bound arithmetic), which matters for
branchless TPU code.
"""

EPS: float = 2.220446049250313e-16
ZERO: float = 1e-25
INFTY: float = 1e20

# Values at or beyond +/-INFTY are treated as unbounded (reference compares
# with ``<= -INFINITY`` etc. against true IEEE inf; we clamp on ingestion).
MAX_ITERATIONS_DEFAULT: int = 1000
