"""Time-Dependent Variational Principle sweeps, fixed-shape for jit/vmap.

TPU-native redesign of the reference integrators (mqt-yaqs
core/methods/tdvp/{tdvp,integrators,primitives,sweep_utils}.py): the symmetric
2-site and 1-site sweeps are expressed as ``lax.scan`` over bonds with the MPS
carried as a single padded ``(L, d, chi, chi)`` array, environments as padded
``(chi, Dw, chi)`` blocks, and every local evolution as a fixed-iteration
Lanczos ``exp(-i dt H_eff) . v`` (:mod:`yaqs_tpu.ops.krylov`).  There is no
dense-H_eff path: at TPU-relevant bond dimensions the matrix-free contraction
chain is strictly better, and it batches over trajectories via ``vmap``.

Sweep structure (matches the reference scheme, integrators.py:161-291):

- L→R: for each bond (i, i+1) evolve the merged block by ``+dt/2``, split with
  singular values moving right, absorb the new left tensor into the left
  environment, and evolve the right tensor backward by ``-dt/2``.
- The last bond is evolved by the full ``dt`` and split with singular values
  moving left.
- R→L mirrors the first loop.  The sweep returns with the canonical center at
  site 0 (norm preserved up to truncation loss).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.decomp import (
    merge_two_site,
    newton_schulz_orthogonalize,
    split_two_site_subspace,
    split_two_site_truncated,
)
from ..ops.krylov import lanczos_expm_apply

__all__ = [
    "TDVPConfig",
    "right_environments",
    "update_left_env",
    "update_right_env",
    "heff_two_site",
    "heff_one_site",
    "heff_bond",
    "sweep_2site",
    "sweep_1site",
    "sweep_dynamic",
    "tdvp_step",
]


@dataclasses.dataclass(frozen=True)
class TDVPConfig:
    """Static sweep configuration (hashable; safe as a jit static argument).

    Mirrors the sim-params fields the reference threads into its sweeps:
    truncation policy (sim_params.trunc_mode/svd_threshold/max_bond_dim) and
    the Krylov settings (krylov_dim replaces the adaptive tol+cap pair).
    """

    krylov_dim: int = 25
    trunc_mode: str = "discarded_weight"
    threshold: float = 1e-12
    max_bond_dim: int | None = None
    mode: str = "2site"  # "1site" | "2site"
    sweeps: int = 1  # substeps of dt/sweeps each
    svd_method: str = "exact"  # "exact" | "subspace" (fast TPU splits)
    subspace_iters: int = 2  # power iterations for the subspace split
    subspace_orth: bool = True  # QR between power iterations (stability)
    subspace_qr: str = "householder"  # "householder" | "cholesky" (fast TPU)
    lanczos_reorth: bool = True  # full reorthogonalization in Lanczos
    canon_method: str = "qr"  # "qr" | "newton" (polar canonicalization, fast TPU)

    @property
    def min_keep(self) -> int:
        cap = self.max_bond_dim
        return 2 if cap is None else min(2, cap)


# ---------------------------------------------------------------------------
# Environments
# ---------------------------------------------------------------------------


def left_boundary(chi: int, dw: int, dtype) -> jnp.ndarray:
    """``F[a, w, b] = delta_ab delta_w0`` (MPO boundary absorbed at index 0)."""
    f = jnp.zeros((chi, dw, chi), dtype=dtype)
    return f.at[:, 0, :].set(jnp.eye(chi, dtype=dtype))


def right_boundary(chi: int, dw: int, dtype) -> jnp.ndarray:
    g = jnp.zeros((chi, dw, chi), dtype=dtype)
    return g.at[:, 0, :].set(jnp.eye(chi, dtype=dtype))


def update_left_env(f, a_bra, a_ket, w):
    """``F'[m, v, k] = sum conj(Ab[t,a,m]) W[t,s,w,v] Ak[s,b,k] F[a,w,b]``."""
    tmp = jnp.einsum("awb,sbk->awsk", f, a_ket)
    tmp = jnp.einsum("awsk,tswv->atvk", tmp, w)
    return jnp.einsum("tam,atvk->mvk", a_bra.conj(), tmp)


def update_right_env(g, a_bra, a_ket, w):
    """``G'[a, w, b] = sum conj(Ab[t,a,m]) W[t,s,w,v] Ak[s,b,k] G[m,v,k]``."""
    tmp = jnp.einsum("mvk,sbk->mvsb", g, a_ket)
    tmp = jnp.einsum("mvsb,tswv->mtwb", tmp, w)
    return jnp.einsum("tam,mtwb->awb", a_bra.conj(), tmp)


def right_environments(tensors: jnp.ndarray, mpo: jnp.ndarray) -> jnp.ndarray:
    """Stacked right environments ``R[i]`` covering sites >= i, ``(L+1, chi, Dw, chi)``.

    Valid for the L→R pass of a sweep starting from a right-canonical state
    (sites to the right are untouched until visited, reference
    primitives.py:139).
    """
    length, d, chi, _ = tensors.shape
    dw = mpo.shape[-1]
    g_last = right_boundary(chi, dw, tensors.dtype)

    def step(g, xs):
        a, w = xs
        g_new = update_right_env(g, a, a, w)
        return g_new, g_new

    _, gs = jax.lax.scan(step, g_last, (jnp.flip(tensors, 0), jnp.flip(mpo, 0)))
    return jnp.concatenate([jnp.flip(gs, 0), g_last[None]], axis=0)


# ---------------------------------------------------------------------------
# Effective Hamiltonian actions (matrix-free)
# ---------------------------------------------------------------------------


def heff_two_site(f, w1, w2, g, theta):
    """``H_eff . theta`` for a two-site block ``theta (d, d, chi, chi)``."""
    x = jnp.einsum("awp,stpq->awstq", f, theta)
    x = jnp.einsum("awstq,xswv->axvtq", x, w1)
    x = jnp.einsum("axvtq,ytvu->axyuq", x, w2)
    return jnp.einsum("axyuq,buq->xyab", x, g)


def heff_one_site(f, w, g, a):
    """``H_eff . a`` for a single site tensor ``a (d, chi, chi)``."""
    x = jnp.einsum("awp,spq->awsq", f, a)
    x = jnp.einsum("awsq,tswv->atvq", x, w)
    return jnp.einsum("atvq,bvq->tab", x, g)


def merge_mpo_pair(w1, w2):
    """Merged two-site MPO block as a matrix ``((wl, s, t), (x, y, wr))``.

    Precomputing this per bond turns the middle of the two-site H_eff chain
    into ONE small matmul instead of two sequential einsums — measured 1.8x
    faster per Lanczos matvec on TPU at chi=64/Dw=3 (the MV chain is the
    sweep's dominant cost).
    """
    d = w1.shape[0]
    dw = w1.shape[2]
    m = jnp.einsum("xswv,ytvu->wstxyu", w1, w2)
    return m.reshape(dw * d * d, d * d * dw)


def merge_mpo_site(w):
    """One-site MPO tensor as a matrix ``((wl, s), (t, wr))`` for the merged
    one-site H_eff chain."""
    d, _, dw, _ = w.shape
    return jnp.transpose(w, (2, 1, 0, 3)).reshape(dw * d, d * dw)


def heff_two_site_merged(f, w12, g, theta):
    """``H_eff . theta`` with the bond's MPO pair pre-merged (matrix form).

    Identical contraction to :func:`heff_two_site` up to re-association;
    ``w12 = merge_mpo_pair(w1, w2)``.
    """
    d = theta.shape[0]
    chi = theta.shape[-1]
    dw = f.shape[1]
    x = jnp.einsum("awp,stpq->awstq", f, theta)
    xm = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(chi * chi, dw * d * d)
    y = (xm @ w12).reshape(chi, chi, d, d, dw)  # (a, q, x, y, u)
    return jnp.einsum("aqxyu,buq->xyab", y, g)


def heff_one_site_merged(f, wm, g, a):
    """``H_eff . a`` with the site MPO tensor pre-merged (matrix form);
    ``wm = merge_mpo_site(w)``."""
    d, chi, _ = a.shape
    dw = f.shape[1]
    x = jnp.einsum("awp,spq->awsq", f, a)
    xm = jnp.transpose(x, (0, 3, 1, 2)).reshape(chi * chi, dw * d)
    y = (xm @ wm).reshape(chi, chi, d, dw)  # (a, q, t, v)
    return jnp.einsum("aqtv,bvq->tab", y, g)


def heff_bond(f, g, c):
    """``K_eff . c`` for a bond matrix ``c (chi, chi)`` (zero-site projector)."""
    x = jnp.einsum("awp,pq->awq", f, c)
    return jnp.einsum("awq,bwq->ab", x, g)


# ---------------------------------------------------------------------------
# Sweeps
# ---------------------------------------------------------------------------


def _qr_shift(m, method: str):
    """Center shift ``m (n, k) -> (q, r)`` with ``m ≈ q r``, ``q`` an isometry.

    ``method="newton"`` uses the Newton-Schulz polar factor with
    ``r = q^H m`` (exact on the column space; same approximation and accuracy
    budget as ``canonicalize_right(method="newton")``, core/mps_ops.py) —
    matmuls only, which avoids both the TPU Householder-QR cost and its
    rank-deficiency NaN hazard on padded states (docs/tpu_numerics.md)."""
    if method == "newton":
        q = newton_schulz_orthogonalize(m)
        return q, q.conj().T @ m
    return jnp.linalg.qr(m)


def _lq_shift(m, method: str):
    """Center shift ``m (l, n) -> (lmat, q)`` with ``m ≈ lmat q``, the rows of
    ``q`` orthonormal (mirror of :func:`_qr_shift`)."""
    if method == "newton":
        x = newton_schulz_orthogonalize(m.conj().T)
        return m @ x, x.conj().T
    qh, rh = jnp.linalg.qr(m.conj().T)
    return rh.conj().T, qh.conj().T


def _split_cfg(theta, chi, cfg: TDVPConfig, distribution: str):
    if cfg.svd_method == "subspace":
        return split_two_site_subspace(
            theta,
            chi,
            iters=cfg.subspace_iters,
            orth_every=cfg.subspace_orth,
            qr_method=cfg.subspace_qr,
            svd_distribution=distribution,
        )
    return split_two_site_truncated(
        theta,
        chi,
        mode=cfg.trunc_mode,
        threshold=cfg.threshold,
        max_bond_dim=cfg.max_bond_dim,
        min_keep=cfg.min_keep,
        svd_distribution=distribution,
    )


@partial(jax.jit, static_argnames=("cfg",))
def sweep_2site(tensors: jnp.ndarray, mpo: jnp.ndarray, dt, cfg: TDVPConfig) -> jnp.ndarray:
    """One symmetric 2TDVP sweep evolving by ``exp(-i H dt)``.

    Expects canonical form at site 0; returns canonical form at site 0.
    """
    length, d, chi, _ = tensors.shape
    dw = mpo.shape[-1]
    if length < 2:
        msg = "2-site TDVP requires length >= 2"
        raise ValueError(msg)

    r_envs = right_environments(tensors, mpo)  # pre-sweep right envs stay valid L→R
    f0 = left_boundary(chi, dw, tensors.dtype)
    half = -0.5j * dt
    kdim = cfg.krylov_dim

    # pre-merged MPO blocks: per-bond pair matrices and per-site matrices
    # (tiny — (Dw d^2, d^2 Dw) each — but they halve the per-matvec op count)
    w12_all = jax.vmap(merge_mpo_pair)(mpo[:-1], mpo[1:])  # (L-1, ...)
    wm_all = jax.vmap(merge_mpo_site)(mpo)  # (L, Dw d, d Dw)

    def evolve_theta(f, w12, g, theta, coeff):
        mv = lambda th: heff_two_site_merged(f, w12, g, th)
        return lanczos_expm_apply(mv, theta, coeff, k=kdim, reorthogonalize=cfg.lanczos_reorth)

    def evolve_site(f, wm, g, a, coeff):
        mv = lambda x: heff_one_site_merged(f, wm, g, x)
        return lanczos_expm_apply(mv, a, coeff, k=kdim, reorthogonalize=cfg.lanczos_reorth)

    # ---- L→R over bonds 0..L-3 ------------------------------------------
    def ltr_body(carry, i):
        tensors, f = carry
        a1 = tensors[i]
        a2 = tensors[i + 1]
        w1 = mpo[i]
        g = r_envs[i + 2]
        theta = merge_two_site(a1, a2)
        theta = evolve_theta(f, w12_all[i], g, theta, half)
        a_new, b_new, _, _ = _split_cfg(theta, chi, cfg, "right")
        f_next = update_left_env(f, a_new, a_new, w1)
        b_back = evolve_site(f_next, wm_all[i + 1], g, b_new, -half)
        tensors = tensors.at[i].set(a_new).at[i + 1].set(b_back)
        return (tensors, f_next), f_next

    if length > 2:
        (tensors, _), f_stack_tail = jax.lax.scan(
            ltr_body, (tensors, f0), jnp.arange(length - 2)
        )
        f_all = jnp.concatenate([f0[None], f_stack_tail], axis=0)  # F[i], i=0..L-2
    else:
        f_all = f0[None]

    # ---- last bond: full dt, singular values left ------------------------
    i = length - 2
    theta = merge_two_site(tensors[i], tensors[i + 1])
    theta = evolve_theta(f_all[i], w12_all[i], r_envs[i + 2], theta, 2 * half)
    a_new, b_new, _, _ = _split_cfg(theta, chi, cfg, "left")
    tensors = tensors.at[i].set(a_new).at[i + 1].set(b_new)
    g = update_right_env(
        right_boundary(chi, dw, tensors.dtype), b_new, b_new, mpo[length - 1]
    )

    # ---- R→L over bonds L-3..0 ------------------------------------------
    def rtl_body(carry, i):
        tensors, g = carry
        f_i = f_all[i]
        f_ip1 = f_all[i + 1]
        w2 = mpo[i + 1]
        a2 = evolve_site(f_ip1, wm_all[i + 1], g, tensors[i + 1], -half)
        theta = merge_two_site(tensors[i], a2)
        theta = evolve_theta(f_i, w12_all[i], g, theta, half)
        a_new, b_new, _, _ = _split_cfg(theta, chi, cfg, "left")
        tensors = tensors.at[i].set(a_new).at[i + 1].set(b_new)
        g_next = update_right_env(g, b_new, b_new, w2)
        return (tensors, g_next), None

    if length > 2:
        (tensors, _), _ = jax.lax.scan(
            rtl_body, (tensors, g), jnp.arange(length - 3, -1, -1)
        )
    return tensors


@partial(jax.jit, static_argnames=("cfg",))
def sweep_1site(tensors: jnp.ndarray, mpo: jnp.ndarray, dt, cfg: TDVPConfig) -> jnp.ndarray:
    """One symmetric 1TDVP sweep (bond-dimension preserving, no truncation).

    Scheme per reference integrators.py:44-158: L→R evolve each site by
    ``+dt/2``, QR-shift, evolve the bond by ``-dt/2``; the last site gets the
    full ``dt``; mirrored R→L pass.
    """
    length, d, chi, _ = tensors.shape
    dw = mpo.shape[-1]
    r_envs = right_environments(tensors, mpo)
    f0 = left_boundary(chi, dw, tensors.dtype)
    half = -0.5j * dt
    kdim = cfg.krylov_dim
    wm_all = jax.vmap(merge_mpo_site)(mpo)

    def evolve_site(f, i, g, a, coeff):
        wm = wm_all[i]
        return lanczos_expm_apply(
            lambda x: heff_one_site_merged(f, wm, g, x), a, coeff, k=kdim
        )

    def evolve_bond(f, g, c, coeff):
        return lanczos_expm_apply(lambda x: heff_bond(f, g, x), c, coeff, k=kdim)

    def ltr_body(carry, i):
        tensors, f = carry
        w = mpo[i]
        g = r_envs[i + 1]
        a = evolve_site(f, i, g, tensors[i], half)
        q, r = _qr_shift(a.reshape(d * chi, chi), cfg.canon_method)
        q = q.reshape(d, chi, chi)
        f_next = update_left_env(f, q, q, w)
        r = evolve_bond(f_next, g, r, -half)
        b = jnp.einsum("lm,smr->slr", r, tensors[i + 1])
        tensors = tensors.at[i].set(q).at[i + 1].set(b)
        return (tensors, f_next), f_next

    if length > 1:
        (tensors, _), f_tail = jax.lax.scan(ltr_body, (tensors, f0), jnp.arange(length - 1))
        f_all = jnp.concatenate([f0[None], f_tail], axis=0)
    else:
        f_all = f0[None]

    last = length - 1
    a = evolve_site(f_all[last], last, r_envs[last + 1], tensors[last], 2 * half)
    tensors = tensors.at[last].set(a)

    g = right_boundary(chi, dw, tensors.dtype)

    def rtl_body(carry, i):
        tensors, g = carry
        w = mpo[i]
        # LQ split of site i: a = l . q with q right-orthonormal
        a = tensors[i]
        m = jnp.transpose(a, (1, 0, 2)).reshape(chi, d * chi)
        lmat, qm = _lq_shift(m, cfg.canon_method)
        q = qm.reshape(chi, d, chi).transpose(1, 0, 2)
        g_next = update_right_env(g, q, q, w)
        c = evolve_bond(f_all[i], g_next, lmat, -half)
        a_prev = jnp.einsum("slr,rm->slm", tensors[i - 1], c)
        a_prev = evolve_site(f_all[i - 1], i - 1, g_next, a_prev, half)
        tensors = tensors.at[i].set(q).at[i - 1].set(a_prev)
        return (tensors, g_next), None

    if length > 1:
        (tensors, _), _ = jax.lax.scan(rtl_body, (tensors, g), jnp.arange(length - 1, 0, -1))
    return tensors


@partial(jax.jit, static_argnames=("cfg",))
def sweep_dynamic(tensors: jnp.ndarray, mpo: jnp.ndarray, dt, cfg: TDVPConfig) -> jnp.ndarray:
    """One dynamic TDVP sweep: 2-site updates while a bond's effective rank is
    below the cap, the 1-site projector update at saturated bonds.

    Reproduces the reference's ``sweep_dynamic`` rule (integrators.py:294-511)
    at fixed padded shape: the reference keys the branch on the ragged bond
    dimension reaching ``max_bond_dim``; here the per-bond effective rank is
    read off the Schmidt spectra at sweep start (count above
    ``threshold * s_max``, the diagnostics rule) and updated with each
    split's keep count.  Branches are ``lax.cond`` (under ``vmap`` both
    branches execute — dynamic mode trades that overhead for reference
    semantics).  Each direction applies ``+dt/2`` per site; expects and
    returns canonical-at-0.
    """
    length, d, chi, _ = tensors.shape
    dw = mpo.shape[-1]
    if length < 2:
        msg = "dynamic TDVP requires length >= 2"
        raise ValueError(msg)
    cap = chi if cfg.max_bond_dim is None else min(cfg.max_bond_dim, chi)
    half = -0.5j * dt
    kdim = cfg.krylov_dim

    from ..core.mps_ops import bond_spectra

    spectra, _ = bond_spectra(tensors)  # (L-1, chi); state normalized at 0
    smax = jnp.maximum(spectra[:, :1], jnp.finfo(spectra.dtype).tiny)
    rank = jnp.maximum(jnp.sum(spectra > cfg.threshold * smax, axis=1), 1)
    rank = rank.astype(jnp.int32)

    r_envs = right_environments(tensors, mpo)
    f0 = left_boundary(chi, dw, tensors.dtype)
    w12_all = jax.vmap(merge_mpo_pair)(mpo[:-1], mpo[1:])
    wm_all = jax.vmap(merge_mpo_site)(mpo)

    def evolve_theta(f, w12, g, theta, coeff):
        mv = lambda th: heff_two_site_merged(f, w12, g, th)
        return lanczos_expm_apply(mv, theta, coeff, k=kdim, reorthogonalize=cfg.lanczos_reorth)

    def evolve_site(f, wm, g, a, coeff):
        mv = lambda x: heff_one_site_merged(f, wm, g, x)
        return lanczos_expm_apply(mv, a, coeff, k=kdim, reorthogonalize=cfg.lanczos_reorth)

    def evolve_bond(f, g, c, coeff):
        return lanczos_expm_apply(lambda x: heff_bond(f, g, x), c, coeff, k=kdim)

    # ---- L→R ------------------------------------------------------------
    def ltr_sat(tensors, f, i):
        """Saturated bond (i, i+1): 1-site +dt/2, QR shift, bond -dt/2."""
        a = evolve_site(f, wm_all[i], r_envs[i + 1], tensors[i], half)
        q, r = _qr_shift(a.reshape(d * chi, chi), cfg.canon_method)
        q = q.reshape(d, chi, chi)
        f_next = update_left_env(f, q, q, mpo[i])
        r = evolve_bond(f_next, r_envs[i + 1], r, -half)
        b = jnp.einsum("lm,smr->slr", r, tensors[i + 1])
        return tensors.at[i].set(q).at[i + 1].set(b), f_next

    def ltr_grow(tensors, f, i, back_evolve: bool):
        """Unsaturated: 2-site +dt/2, split right (grows the rank), optional
        site back-evolution (skipped at the final L→R bond)."""
        theta = merge_two_site(tensors[i], tensors[i + 1])
        theta = evolve_theta(f, w12_all[i], r_envs[i + 2], theta, half)
        a_new, b_new, _, keep = _split_cfg(theta, chi, cfg, "right")
        f_next = update_left_env(f, a_new, a_new, mpo[i])
        if back_evolve:
            b_new = evolve_site(f_next, wm_all[i + 1], r_envs[i + 2], b_new, -half)
        return tensors.at[i].set(a_new).at[i + 1].set(b_new), f_next, keep

    def ltr_body(carry, i):
        tensors, f, rank = carry
        def sat(args):
            t, fc, rk = args
            t2, f2 = ltr_sat(t, fc, i)
            return t2, f2, rk
        def grow(args):
            t, fc, rk = args
            t2, f2, keep = ltr_grow(t, fc, i, back_evolve=True)
            return t2, f2, rk.at[i].set(jnp.minimum(keep, cap).astype(rk.dtype))
        tensors, f, rank = jax.lax.cond(rank[i] >= cap, sat, grow, (tensors, f, rank))
        return (tensors, f, rank), f

    if length > 2:
        (tensors, f_last, rank), f_tail = jax.lax.scan(
            ltr_body, (tensors, f0, rank), jnp.arange(length - 2)
        )
        f_all = jnp.concatenate([f0[None], f_tail], axis=0)  # F[i], i=0..L-2
    else:
        f_last = f0
        f_all = f0[None]

    # final L→R bond (i = L-2): the 2-site branch skips back-evolution
    i_last = length - 2
    def last_sat(args):
        t, rk = args
        t2, _ = ltr_sat(t, f_last, i_last)
        return t2, rk
    def last_grow(args):
        t, rk = args
        t2, _, keep = ltr_grow(t, f_last, i_last, back_evolve=False)
        return t2, rk.at[i_last].set(jnp.minimum(keep, cap).astype(rk.dtype))
    tensors, rank = jax.lax.cond(
        rank[i_last] >= cap, last_sat, last_grow, (tensors, rank)
    )

    # ---- R→L ------------------------------------------------------------
    g0 = right_boundary(chi, dw, tensors.dtype)

    def rtl_sat(tensors, g, i):
        """Saturated bond (i-1, i): 1-site +dt/2, LQ shift, bond -dt/2."""
        a = evolve_site(f_all[i], wm_all[i], g, tensors[i], half)
        m = jnp.transpose(a, (1, 0, 2)).reshape(chi, d * chi)
        lmat, qm = _lq_shift(m, cfg.canon_method)
        q = qm.reshape(chi, d, chi).transpose(1, 0, 2)
        g_next = update_right_env(g, q, q, mpo[i])
        c = evolve_bond(f_all[i], g_next, lmat, -half)
        a_prev = jnp.einsum("slr,rm->slm", tensors[i - 1], c)
        return tensors.at[i].set(q).at[i - 1].set(a_prev), g_next

    def rtl_grow(tensors, g, i, back_evolve: bool):
        theta = merge_two_site(tensors[i - 1], tensors[i])
        theta = evolve_theta(f_all[i - 1], w12_all[i - 1], g, theta, half)
        a_new, b_new, _, keep = _split_cfg(theta, chi, cfg, "left")
        g_next = update_right_env(g, b_new, b_new, mpo[i])
        if back_evolve:
            a_new = evolve_site(f_all[i - 1], wm_all[i - 1], g_next, a_new, -half)
        return tensors.at[i - 1].set(a_new).at[i].set(b_new), g_next, keep

    def rtl_body(carry, i):
        tensors, g, rank = carry
        def sat(args):
            t, gc, rk = args
            t2, g2 = rtl_sat(t, gc, i)
            return t2, g2, rk
        def grow(args):
            t, gc, rk = args
            t2, g2, keep = rtl_grow(t, gc, i, back_evolve=True)
            return t2, g2, rk.at[i - 1].set(jnp.minimum(keep, cap).astype(rk.dtype))
        tensors, g, rank = jax.lax.cond(rank[i - 1] >= cap, sat, grow, (tensors, g, rank))
        return (tensors, g, rank), None

    if length > 2:
        (tensors, g, rank), _ = jax.lax.scan(
            rtl_body, (tensors, g0, rank), jnp.arange(length - 1, 1, -1)
        )
    else:
        g = g0

    # final R→L bond (i = 1): the 2-site branch skips back-evolution
    def rtl1_sat(t):
        t2, _ = rtl_sat(t, g, 1)
        return t2
    def rtl1_grow(t):
        t2, _, _ = rtl_grow(t, g, 1, back_evolve=False)
        return t2
    tensors = jax.lax.cond(rank[0] >= cap, rtl1_sat, rtl1_grow, tensors)
    return tensors


def tdvp_step(tensors: jnp.ndarray, mpo: jnp.ndarray, dt, cfg: TDVPConfig) -> jnp.ndarray:
    """One full evolution step ``exp(-i H dt)`` with the configured mode/substeps.

    Reference entry semantics (tdvp.py:69-142): ``sweeps`` equal substeps of
    ``dt/sweeps``; 2-site falls back to 1-site for single-site chains;
    ``dynamic`` grows bonds 2-site and switches to the 1-site projector
    update at saturated bonds (integrators.py:294-511).
    """
    length = tensors.shape[0]
    mode = cfg.mode
    if mode == "dynamic" and length == 1:
        mode = "1site"
    if mode == "2site" and length == 1:
        mode = "1site"
    if mode == "dynamic":
        sweep = sweep_dynamic
    elif mode == "2site":
        sweep = sweep_2site
    else:
        sweep = sweep_1site
    sub_dt = dt / cfg.sweeps
    for _ in range(cfg.sweeps):
        tensors = sweep(tensors, mpo, sub_dt, cfg)
    return tensors
