"""MPO application and composition (fixed-shape).

Reference: mqt-yaqs core/data_structures/mpo.py multiply/rotate/to_mps and
mpo_utils contractions.  The padded MPO ``(L, d, d, Dw, Dw)`` applies to a
padded MPS by fusing bond legs ``(Dw chi)`` and compressing back to the
target bond dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.mps_ops import compress

__all__ = [
    "mpo_apply_mps",
    "mpo_apply_mps_zipup",
    "mpo_compose",
    "mpo_adjoint",
    "mpo_to_doubled_mps",
]


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


def mpo_apply_mps_zipup(
    mpo: jnp.ndarray,
    tensors: jnp.ndarray,
    *,
    mode: str = "discarded_weight",
    threshold: float = 0.0,
    max_bond_dim: int | None = None,
    svd_method: str = "exact",
    subspace_iters: int = 2,
    subspace_qr: str = "householder",
) -> jnp.ndarray:
    """``W |psi>`` by zip-up: truncate each bond as the sweep passes.

    Unlike :func:`mpo_apply_mps` the intermediate never materializes the full
    ``(L, d, Dw chi, Dw chi)`` array — only one site at a time carries the
    enlarged ``Dw * chi`` bond, so memory stays ``O(d chi Dw chi)`` per site.
    Expects the input canonical at site 0; returns with the center at the last
    site (callers typically recanonicalize).  Reference parity:
    MPO.multiply-onto-MPS semantics (mpo.py:1433) at fixed shape.
    """
    from ..ops.decomp import split_matrix_subspace, split_matrix_truncated

    length, d, chi, _ = tensors.shape
    dw = mpo.shape[-1]

    def split(e):  # e (d, chi, dw*chi) -> a (d, chi, chi), r (chi, dw, chi)
        m = e.reshape(d * chi, dw * chi)
        if svd_method == "subspace":
            left, right, _, _ = split_matrix_subspace(
                m, chi, iters=subspace_iters, qr_method=subspace_qr,
                svd_distribution="right"
            )
        else:
            left, right, _, _ = split_matrix_truncated(
                m,
                chi,
                mode=mode,
                threshold=threshold,
                max_bond_dim=max_bond_dim,
                min_keep=1,
                svd_distribution="right",
            )
        return left.reshape(d, chi, chi), right.reshape(chi, dw, chi)

    # site 0: MPO left boundary absorbed at channel 0
    e = jnp.einsum("stv,tlr->slvr", mpo[0, :, :, 0, :], tensors[0])
    e = e.reshape(d, chi, dw * chi)

    def body(e, xs):
        w, a = xs
        a_site, r = split(e)
        e_next = jnp.einsum("mwl,stwv,tlr->smvr", r, w, a)
        return e_next.reshape(d, chi, dw * chi), a_site

    e, a_sites = jax.lax.scan(body, e, (mpo[1:], tensors[1:]))
    # last site: close with the MPO right boundary (channel 0)
    last = e.reshape(d, chi, dw, chi)[:, :, 0, :]
    return jnp.concatenate([a_sites, last[None]], axis=0)


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
