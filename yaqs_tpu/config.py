"""Global numeric configuration helpers.

The library is dtype-polymorphic: every functional kernel derives its working
dtype from its inputs.  These helpers centralize the *default* choices:

- On CPU (tests / parity runs) with ``jax_enable_x64`` active, the default is
  complex128, matching the reference's NumPy numerics to 1e-8.
- On TPU (v5e and friends) complex128 is unsupported in hardware, so the
  default is complex64 with float32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["default_complex", "default_real", "is_x64_enabled"]


def is_x64_enabled() -> bool:
    """Return True when jax_enable_x64 is active."""
    return bool(jax.config.read("jax_enable_x64"))


def default_complex() -> jnp.dtype:
    """Default complex dtype: complex128 under x64, complex64 otherwise."""
    return jnp.dtype(jnp.complex128) if is_x64_enabled() else jnp.dtype(jnp.complex64)


def default_real() -> jnp.dtype:
    """Default real dtype matching :func:`default_complex`."""
    return jnp.dtype(jnp.float64) if is_x64_enabled() else jnp.dtype(jnp.float32)


def real_dtype_of(dtype) -> jnp.dtype:
    """Real dtype corresponding to a complex dtype (identity for real dtypes)."""
    return jnp.finfo(jnp.dtype(dtype)).dtype if jnp.issubdtype(dtype, jnp.floating) else (
        jnp.dtype(jnp.float64) if jnp.dtype(dtype) == jnp.complex128 else jnp.dtype(jnp.float32)
    )
