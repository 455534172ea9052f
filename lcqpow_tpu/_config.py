"""Global numeric configuration for lcqpow_tpu.

The reference solver (LCQPow) runs in IEEE double precision and its default
tolerances are multiples of DBL_EPSILON (``/root/reference/src/Options.cpp:297-298``).
To reproduce those tolerances we enable JAX x64 mode at import time unless the
user opts out with ``LCQPOW_TPU_NO_X64=1`` (single-precision mode is useful for
raw-throughput benchmarking on TPU where f64 is emulated).

Matmul precision: XLA:TPU's DEFAULT f32 ``dot_general`` uses reduced-precision
bf16 passes on the MXU for mat-mat and *batched* matvec contractions —
measured ~2.4e-3 relative error on this part (``tools/probe_precision.py``),
vs ~1.4e-7 under HIGHEST.  Every accuracy-bearing path in this framework
(the polish's KKT acceptance at ~1e-5 tolerances, the double-word-f32
compensated arithmetic whose error-free transformations assume *exact* f32
products, the final certification) is mathematically impossible at 2.4e-3
noise — this was the root cause of the round-2 on-chip failures (circle/OCP
certifying 0/128 while the identical code passed on CPU, where f32 matmuls
are true f32).  We therefore force HIGHEST globally at import; opt out with
``LCQPOW_TPU_FAST_MATMUL=1`` if reduced precision is ever wanted.
"""

import os

import jax

_X64_DISABLED = os.environ.get("LCQPOW_TPU_NO_X64", "0") == "1"

if not _X64_DISABLED:
    jax.config.update("jax_enable_x64", True)

if os.environ.get("LCQPOW_TPU_FAST_MATMUL", "0") != "1":
    jax.config.update("jax_default_matmul_precision", "highest")


def supports_debug_print() -> bool:
    """Whether the default backend can run ``jax.debug.print``.

    Some PJRT plugins (the tunneled-TPU "axon" transport in this
    environment) do not implement host send/recv callbacks — a jitted
    program containing ``jax.debug.print`` then FAILS AT RUN TIME with
    UNIMPLEMENTED.  The solver's iteration printing consults this to
    degrade gracefully (print a one-time warning and run silent) instead
    of crashing the solve.  Cached after first backend touch.

    Limitation: probes only the DEFAULT backend and caches the verdict; a
    process mixing backends (e.g. default CPU with arrays explicitly placed
    on the tunneled TPU) can be misjudged.  Force the behavior by setting
    ``lcqpow_tpu._config._SUPPORTS_DEBUG_PRINT`` if that ever matters.
    """
    global _SUPPORTS_DEBUG_PRINT
    if _SUPPORTS_DEBUG_PRINT is None:
        try:
            ver = jax.devices()[0].client.platform_version
        except Exception:
            ver = ""
        _SUPPORTS_DEBUG_PRINT = "axon" not in ver
    return _SUPPORTS_DEBUG_PRINT


_SUPPORTS_DEBUG_PRINT = None


def default_dtype():
    """Default floating dtype: float64 when x64 is on, else float32."""
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
