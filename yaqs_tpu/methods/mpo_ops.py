"""MPO application and composition (fixed-shape).

Reference: mqt-yaqs core/data_structures/mpo.py multiply/rotate/to_mps and
mpo_utils contractions.  The padded MPO ``(L, d, d, Dw, Dw)`` applies to a
padded MPS by fusing bond legs ``(Dw chi)`` and compressing back to the
target bond dimension.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.mps_ops import compress

__all__ = ["mpo_apply_mps", "mpo_compose", "mpo_adjoint", "mpo_to_doubled_mps"]


def mpo_apply_mps(
    mpo: jnp.ndarray,
    tensors: jnp.ndarray,
    *,
    chi_out: int | None = None,
    mode: str = "discarded_weight",
    threshold: float = 0.0,
    max_bond_dim: int | None = None,
) -> jnp.ndarray:
    """``W |psi>`` with fused bonds, compressed to ``chi_out`` (default chi).

    The intermediate bond dimension is ``Dw * chi``; compression truncates by
    the given policy (reference MPO.multiply onto MPS, mpo.py:1433-1577).
    """
    length, d, chi, _ = tensors.shape
    dw = mpo.shape[-1]
    fused = jnp.einsum("itsmn,islr->itmlnr", mpo, tensors)
    fused = fused.reshape(length, d, dw * chi, dw * chi)
    chi_out = chi_out or chi
    cap = max_bond_dim if max_bond_dim is not None else chi_out
    return compress(
        fused, mode=mode, threshold=threshold, max_bond_dim=min(cap, chi_out), chi_out=chi_out
    )


def mpo_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``A . B`` as an MPO with fused bonds ``(Dw_a Dw_b)`` (no compression)."""
    length, d = a.shape[0], a.shape[1]
    da, db = a.shape[-1], b.shape[-1]
    out = jnp.einsum("itsmn,isrpq->itrmpnq", a, b)
    return out.reshape(length, d, d, da * db, da * db)


def mpo_adjoint(mpo: jnp.ndarray) -> jnp.ndarray:
    """Adjoint MPO: conjugate and swap the physical legs (reference rotate)."""
    return jnp.conj(jnp.swapaxes(mpo, 1, 2))


def mpo_to_doubled_mps(mpo: jnp.ndarray) -> jnp.ndarray:
    """View the MPO as a d^2-MPS (fused physical legs, vec ordering (out, in))."""
    length, d, _, dw, _ = mpo.shape
    return mpo.reshape(length, d * d, dw, dw)
