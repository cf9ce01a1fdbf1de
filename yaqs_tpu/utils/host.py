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

__all__ = ["fetch", "to_device"]

_complexify = None


def to_device(x, sharding=None):
    """Host array -> device array, complex-safe on the tunneled TPU.

    Host->device transfer of complex arrays is UNIMPLEMENTED there (both as
    eager ``jnp.asarray`` and as jit call arguments); complex values reach
    the device only as trace-time constants or by on-device complexification
    from separately-transferred real and imaginary parts — which this helper
    does.  Device-resident complex arrays are then valid jit arguments for
    subsequent dispatches.  Real arrays transfer directly.

    With ``sharding`` (a ``jax.sharding.Sharding``), the parts are placed
    under that sharding before complexification, so the result lands
    distributed over the mesh without a replicated intermediate (the digital
    engine shards its trajectory batch this way).
    """
    global _complexify
    if isinstance(x, jax.Array):
        return jax.device_put(x, sharding) if sharding is not None else x
    x = np.asarray(x)
    if np.iscomplexobj(x):
        if _complexify is None:
            _complexify = jax.jit(jax.lax.complex)
        # np.ascontiguousarray promotes 0-d to 1-d — use asarray(order="C"),
        # which keeps rank; cast the parts to the input's real dtype so a
        # complex64 input stays complex64 under an x64-enabled config
        rdt = x.real.dtype
        re = np.asarray(x.real, dtype=rdt, order="C")
        im = np.asarray(x.imag, dtype=rdt, order="C")
        if sharding is not None:
            re = jax.device_put(re, sharding)
            im = jax.device_put(im, sharding)
        # jit propagates the parts' shardings to the complex output
        return _complexify(re, im)
    out = jnp.asarray(x)
    return jax.device_put(out, sharding) if sharding is not None else out


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
