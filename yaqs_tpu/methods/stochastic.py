"""Stochastic quantum-jump process of the TJM (fixed shape, vmappable).

Reimplements the reference's jump sampler (mqt-yaqs
core/methods/stochastic_process.py) with dense per-channel weights and masked
application so it traces under jit and batches under vmap:

- jump probability = norm deficit ``1 - <psi|psi>`` of the post-dissipation
  state;
- channel weights ``dt * gamma_k * <psi|L_k^dag L_k|psi>`` come from per-site
  *moment matrices* ``T_i[b,k] = <psi| |b><k|_i |psi>`` computed in two
  transfer scans (left and right Gram environments) — gauge-free, so the
  dissipation step does not need to re-canonicalize first, and the cost is
  O(L chi^3) total instead of per-channel;
- the selected channel applies its two (site, operator) slots with dynamic
  indexing; adjacent non-Pauli two-site channels use a merged-split;
- the state is renormalized once at the end (the reference discards the
  leftover QR factor at the boundary, normalizing implicitly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.mps_ops import (
    apply_one_site_operator,
    normalize_canonical,
    right_gram_environments,
    site_moment_matrices,
    transfer_right,
)
from ..core.noise_model import CompiledNoise
from ..ops.decomp import merge_two_site, split_two_site_truncated

__all__ = [
    "site_moment_matrices",
    "channel_weights",
    "channel_weights2",
    "stochastic_process",
]


def _left_envs(tensors):
    chi = tensors.shape[-1]
    env0 = jnp.eye(chi, dtype=tensors.dtype)

    def step(env, a):
        return transfer_right(env, a, a), env

    last, envs = jax.lax.scan(step, env0, tensors)
    return envs, last  # envs[i] = before site i; last = full Gram (norm^2)


def channel_weights(
    tensors: jnp.ndarray, noise: CompiledNoise, dt, moments=None
) -> jnp.ndarray:
    """``dt * gamma_k * <psi|(L^dag L)_k|psi>`` for the one-site channel table."""
    if moments is None:
        moments, _ = site_moment_matrices(tensors)
    t_at = moments[jnp.asarray(noise.ch_site1)]  # (nc, d, d)
    vals = jnp.real(jnp.einsum("kbc,kbc->k", jnp.asarray(noise.ch_weight_op), t_at))
    return dt * jnp.asarray(noise.ch_gamma) * vals


def channel_weights2(tensors: jnp.ndarray, noise: CompiledNoise, dt) -> jnp.ndarray:
    """Weights for adjacent non-Pauli two-site channels via merged-pair
    contractions (gauge-free: left and right Gram environments)."""
    left_envs, _ = _left_envs(tensors)
    right_envs = right_gram_environments(tensors)
    d = tensors.shape[1]
    chi = tensors.shape[-1]

    def one(bond, wop):
        theta = merge_two_site(tensors[bond], tensors[bond + 1])
        th = theta.reshape(d * d, chi, chi)
        rho_l = left_envs[bond]
        rho_r = right_envs[bond + 1]
        tmp = jnp.einsum("lm,kms->kls", rho_l, th)
        tmp = jnp.einsum("kls,rs->klr", tmp, rho_r)
        val = jnp.einsum("alr,ab,blr->", th.conj(), wop.astype(th.dtype), tmp)
        return jnp.real(val)

    vals = jax.vmap(one)(jnp.asarray(noise.ch2_bond), jnp.asarray(noise.ch2_weight_op))
    return dt * jnp.asarray(noise.ch2_gamma) * vals


def _select_row(table, idx, dtype):
    """Row ``table[idx]`` as a one-hot contraction.

    Mathematically identical to dynamic indexing (exact 0/1 weights) but
    avoids gather-from-embedded-constant lowerings that the tunneled TPU
    platform cannot compile inside nested scans.
    """
    t = jnp.asarray(table, dtype=dtype)
    oh = jax.nn.one_hot(idx, t.shape[0], dtype=dtype)
    return jnp.tensordot(oh, t, axes=(0, 0))


def _select_int(values, idx):
    v = jnp.asarray(values)
    return jnp.sum(jnp.where(jnp.arange(v.shape[0]) == idx, v, 0))


def _apply_channel(tensors: jnp.ndarray, noise: CompiledNoise, idx) -> jnp.ndarray:
    op1 = _select_row(noise.ch_op1, idx, tensors.dtype)
    op2 = _select_row(noise.ch_op2, idx, tensors.dtype)
    s1 = _select_int(noise.ch_site1, idx)
    s2 = _select_int(noise.ch_site2, idx)
    tensors = apply_one_site_operator(tensors, op1, s1)
    # slot 2 is the identity at s2 == s1 for one-site channels; applying it is
    # a no-op, so no control flow is needed.
    return jax.lax.cond(
        s2 != s1,
        lambda t: apply_one_site_operator(t, op2, s2),
        lambda t: t,
        tensors,
    )


def _apply_channel2(tensors: jnp.ndarray, noise: CompiledNoise, idx, trunc) -> jnp.ndarray:
    """Apply an adjacent non-Pauli two-site jump via merged-split."""
    length, d, chi, _ = tensors.shape
    bond = _select_int(noise.ch2_bond, idx)
    op = _select_row(noise.ch2_op, idx, tensors.dtype)
    theta = merge_two_site(tensors[bond], tensors[bond + 1])
    th = theta.reshape(d * d, chi * chi)
    th = (op.astype(th.dtype) @ th).reshape(d, d, chi, chi)
    a, b, _, _ = split_two_site_truncated(
        th,
        chi,
        mode=getattr(trunc, "trunc_mode", "discarded_weight"),
        threshold=getattr(trunc, "threshold", 1e-12),
        max_bond_dim=getattr(trunc, "max_bond_dim", None),
        min_keep=1,
        svd_distribution="right",
    )
    return tensors.at[bond].set(a).at[bond + 1].set(b)


def stochastic_process(
    tensors: jnp.ndarray, noise: CompiledNoise | None, dt, key, trunc=None,
    canonicalize: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One jump-or-not step. Returns ``(tensors, jumped)``.

    Input: any gauge (typically canonical-at-0 modified by per-site
    dissipators), norm <= 1. Output: canonical at site 0 and normalized —
    unless ``canonicalize=False``, which skips the final restoration and
    returns the raw post-decision state (arbitrary gauge, unnormalized).
    The skip exists for consumers that evaluate gauge-free and discard the
    state (the order-2 measurement branch): the full-chain polar
    canonicalization is the step's dominant cost on TPU (~45 of 55 ms at
    L=100, chi=64, B=32; docs/tpu_numerics.md), and the jump DECISION and
    channel selection never depend on it.
    """
    canon = getattr(trunc, "canon_method", "qr")
    if noise is None:
        if not canonicalize:
            return tensors, jnp.asarray(False)
        out, _ = normalize_canonical(tensors, method=canon)
        return out, jnp.asarray(False)

    nc1 = noise.ch_gamma.shape[0]
    nc2 = noise.ch2_gamma.shape[0]

    moments, n2 = site_moment_matrices(tensors)
    dp = 1.0 - n2
    key_decide, key_choose = jax.random.split(key)
    u = jax.random.uniform(key_decide, dtype=n2.dtype)
    jumped = u < dp

    w1 = channel_weights(tensors, noise, dt, moments) if nc1 else jnp.zeros((0,))
    w2 = channel_weights2(tensors, noise, dt) if nc2 else jnp.zeros((0,))
    w = jnp.concatenate([jnp.maximum(w1, 0.0), jnp.maximum(w2, 0.0)])
    # Relative noise floor on the channel weights: in complex64 a channel
    # whose TRUE weight is zero (e.g. lowering on an empty site) reads
    # ~1e-7 moment noise; sampling it applies a near-annihilating operator
    # and the renormalization cascade overflows to NaN.  At L=200 the pick
    # probability integrates to ~2-3% of trajectories (3/128 measured on
    # hardware, 2026-08-21).  Physical channels carry O(1/L) relative
    # weight, so a 1e-5 relative floor separates cleanly; zeroed entries
    # give log(0) = -inf and are never sampled (exact-arithmetic
    # semantics).  If EVERY channel is noise the step does not jump.
    total0 = jnp.sum(w)
    w = jnp.where(w > 1e-5 * total0, w, 0.0)
    total = jnp.sum(w)
    jumped = jnp.logical_and(jumped, total > 0)
    safe_w = jnp.where(total > 0, w, jnp.ones_like(w))
    idx = jax.random.categorical(key_choose, jnp.log(safe_w))

    def do_jump(t):
        if nc2 == 0:
            return _apply_channel(t, noise, idx)
        if nc1 == 0:
            return _apply_channel2(t, noise, idx, trunc)
        return jax.lax.cond(
            idx < nc1,
            lambda tt: _apply_channel(tt, noise, jnp.minimum(idx, nc1 - 1)),
            lambda tt: _apply_channel2(
                tt, noise, jnp.minimum(idx - nc1, nc2 - 1), trunc
            ),
            t,
        )

    tensors = jax.lax.cond(jumped, do_jump, lambda t: t, tensors)
    if canonicalize:
        tensors, _ = normalize_canonical(tensors, method=canon)
    return tensors, jumped
