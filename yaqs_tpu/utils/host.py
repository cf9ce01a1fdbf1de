"""Device-to-host transfer helpers.

The axon-tunneled TPU platform cannot transfer complex arrays to the host
(UNIMPLEMENTED in the PJRT client); real arrays transfer fine.  ``fetch``
moves any array (or pytree) to host numpy, splitting complex arrays into
real/imag parts on device first.

The same constraint means jitted functions must not close over *device*
complex arrays (they would be embedded as MLIR constants via a host round
trip).  Stage complex operands host-side as numpy, or pass them as explicit
function arguments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fetch"]


def _fetch_one(x):
    if isinstance(x, jax.Array) and jnp.iscomplexobj(x):
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return (re + 1j * im).astype(np.result_type(x.dtype))
    if isinstance(x, jax.Array):
        return np.asarray(x)
    return x


def fetch(tree):
    """Move a pytree of device arrays to host numpy (complex-safe)."""
    return jax.tree.map(_fetch_one, tree)
