"""Basis-Update & Galerkin (BUG) integrator, fixed-shape.

Reference: mqt-yaqs core/methods/bug.py (Ceruti et al., doi:10.1137/22M1473790)
— a rank-augmenting alternative to TDVP selected by ``EvolutionMode.BUG``:

1. from the canonical-at-0 state, build the "center-at-i" tensors and
   left-orthonormal environments in one L->R pass;
2. sweep R->L: Krylov-evolve each center tensor by the full ``dt``, form an
   enlarged right-orthonormal basis by stacking the old and updated tensors
   (bond dimension doubles to ``2 chi``), and carry the basis-change matrix
   ``M_i : old chi-basis -> new 2chi-basis`` leftward;
3. evolve site 0 against the enlarged right environment and compress back to
   the target bond dimension.

Shape discipline: left legs stay ``chi`` during the sweep, right legs are
``2 chi`` (padded on the first iteration), so the R->L pass is one uniform
``lax.scan``; the enlarged ``(L, d, 2chi, 2chi)`` state is truncated back to
``chi`` by :func:`yaqs_tpu.core.mps_ops.compress`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.mps_ops import compress
from ..ops.krylov import lanczos_expm_apply
from .tdvp import TDVPConfig, heff_one_site, update_left_env, update_right_env

__all__ = ["bug_step"]


def _masked_qr(m):
    """QR with rank masking: columns of Q whose R diagonal is numerically zero
    are zeroed instead of carrying arbitrary orthonormal completions.

    Rank-deficient padded tensors otherwise inject spurious environment
    couplings that the ragged-shape reference algorithm never sees.
    """
    q, r = jnp.linalg.qr(m)
    dd = jnp.abs(jnp.diagonal(r))
    tol = jnp.max(dd) * jnp.finfo(dd.dtype).eps * m.shape[0] * 10
    mask = (dd > tol).astype(q.dtype)
    return q * mask[None, :], r * mask[:, None]


@partial(jax.jit, static_argnames=("cfg",))
def bug_step(tensors: jnp.ndarray, mpo: jnp.ndarray, dt, cfg: TDVPConfig) -> jnp.ndarray:
    """One BUG step ``exp(-i H dt)``; canonical at 0 in and out."""
    length, d, chi, _ = tensors.shape
    dw = mpo.shape[-1]
    chi2 = 2 * chi
    dtype = tensors.dtype
    coeff = -1j * dt
    kdim = cfg.krylov_dim

    def evolve(f, w, g, a):
        return lanczos_expm_apply(lambda x: heff_one_site(f, w, g, x), a, coeff, k=kdim)

    # ---- L->R: center-at-i tensors + left envs (left-orthonormal gauge) ---
    f0 = jnp.zeros((chi, dw, chi), dtype=dtype)
    f0 = f0.at[:, 0, :].set(jnp.eye(chi, dtype=dtype))

    def prep_body(carry, xs):
        center_prev, f_prev = carry
        b_next, w_prev = xs
        m = center_prev.reshape(d * chi, chi)
        q, r = _masked_qr(m)
        q = q.reshape(d, chi, chi)
        center = jnp.einsum("lm,smr->slr", r, b_next)
        f_next = update_left_env(f_prev, q, q, w_prev)
        return (center, f_next), (center, f_next)

    if length > 1:
        (_, _), (centers_tail, f_tail) = jax.lax.scan(
            prep_body, (tensors[0], f0), (tensors[1:], mpo[:-1])
        )
        centers = jnp.concatenate([tensors[0][None], centers_tail], axis=0)
        f_all = jnp.concatenate([f0[None], f_tail], axis=0)
    else:
        centers = tensors
        f_all = f0[None]

    if length == 1:
        a0 = evolve(
            f_all[0],
            mpo[0],
            f0,  # right boundary == left boundary shape at chi
            centers[0],
        )
        return tensors.at[0].set(a0)

    # ---- R->L sweep with basis enlargement --------------------------------
    # right legs padded to 2 chi throughout the scan
    g0 = jnp.zeros((chi2, dw, chi2), dtype=dtype)
    g0 = g0.at[:, 0, :].set(jnp.eye(chi2, dtype=dtype))
    m0 = jnp.concatenate([jnp.eye(chi, dtype=dtype), jnp.zeros((chi, chi), dtype=dtype)], axis=1)
    center_last = jnp.pad(centers[length - 1], ((0, 0), (0, 0), (0, chi)))  # (d, chi, 2chi)

    r_mask0 = jnp.zeros((chi2,), dtype=tensors.real.dtype).at[0].set(1.0)

    def rtl_body(carry, i):
        # g (2c,Dw,2c), m_right (c,2c), center (d,c,2c), r_mask (2c,) marks the
        # physically active directions of the enlarged right bond.
        g, m_right, center, r_mask = carry
        w = mpo[i]
        updated = evolve(f_all[i], w, g, center)  # (d, chi, 2chi)
        # Leaf stack: the original (right-canonical) leaf tensor, with its
        # right leg masked to the boundary index 0.  QR canonicalization fills
        # the padded rows with orthonormal completions that generally carry
        # FICTIONAL right-boundary support (index != 0); boundary-anchored
        # contractions never see them, but stacking them here as data rows
        # would pollute the enlarged basis with unphysical directions (a 0.09
        # observable error from product-state starts — round-3 battery fix).
        leaf = tensors[i] * (jnp.arange(chi) == 0).astype(dtype)[None, None, :]
        old_stack = jnp.where(
            i == length - 1,
            jnp.pad(leaf, ((0, 0), (0, 0), (0, chi))),
            center,
        )
        stacked = jnp.concatenate([old_stack, updated], axis=1)  # (d, 2chi, 2chi)
        # Enlarged basis = orthonormal rows spanning {old, updated} PLUS the
        # rest of the *physically active* subspace (d x active right bond) —
        # the padded-shape analogue of the reference's reduced-QR completion,
        # which is what lets H grow the bond (critical at the leaf, where the
        # updated tensor may be proportional to the old one).  Augmenting with
        # the active-subspace identity keeps the SVD basis equal to the data's
        # right-singular vectors followed by active completions, sorted ahead
        # of the inactive padding directions.
        mmat = jnp.transpose(stacked, (1, 0, 2)).reshape(chi2, d * chi2)
        aug = jnp.diag(jnp.tile(r_mask, d).astype(dtype))  # (d*2chi, d*2chi)
        _, s, vh = jnp.linalg.svd(
            jnp.concatenate([mmat, aug], axis=0), full_matrices=False
        )
        s = s[:chi2]
        vh = vh[:chi2]
        tol = jnp.maximum(jnp.max(s), 1.0) * jnp.finfo(s.dtype).eps * chi2 * 10
        keep = (s > tol).astype(s.dtype)
        vh = vh * keep.astype(vh.dtype)[:, None]
        q = vh.reshape(chi2, d, chi2).transpose(1, 0, 2)  # (d, 2chi, 2chi)
        # basis change M_i = old_q . m_right . conj(new_q), (chi, 2chi)
        old_q = tensors[i]
        tmp = jnp.einsum("slr,rm->slm", old_q, m_right)  # (d, chi, 2chi)
        # contract phys + right legs with the new basis; output its left leg
        m_new = jnp.einsum("slm,skm->lk", tmp, q.conj())  # (chi, 2chi)
        center_next = jnp.einsum("slr,rm->slm", centers[i - 1], m_new)
        g_new = update_right_env(g, q, q, w)
        return (g_new, m_new, center_next, keep), q

    (g_final, _, center0, _), qs_rev = jax.lax.scan(
        rtl_body, (g0, m0, center_last, r_mask0), jnp.arange(length - 1, 0, -1)
    )

    # site 0 in the enlarged right basis
    a0 = evolve(f_all[0], mpo[0], g_final, center0)  # (d, chi, 2chi)
    a0 = jnp.pad(a0, ((0, 0), (0, chi), (0, 0)))
    new_tensors = jnp.concatenate([a0[None], jnp.flip(qs_rev, 0)], axis=0)

    # ---- compress back to chi --------------------------------------------
    return compress(
        new_tensors,
        mode=cfg.trunc_mode,
        threshold=cfg.threshold,
        max_bond_dim=chi if cfg.max_bond_dim is None else min(cfg.max_bond_dim, chi),
        chi_out=chi,
    )
