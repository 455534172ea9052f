"""Global numeric configuration for lcqpow_tpu.

The reference solver (LCQPow) runs in IEEE double precision and its default
tolerances are multiples of DBL_EPSILON (``/root/reference/src/Options.cpp:297-298``).
To reproduce those tolerances we enable JAX x64 mode at import time unless the
user opts out with ``LCQPOW_TPU_NO_X64=1`` (single-precision mode is useful for
raw-throughput benchmarking on TPU where f64 is emulated).
"""

import os

import jax

_X64_DISABLED = os.environ.get("LCQPOW_TPU_NO_X64", "0") == "1"

if not _X64_DISABLED:
    jax.config.update("jax_enable_x64", True)


def default_dtype():
    """Default floating dtype: float64 when x64 is on, else float32."""
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
