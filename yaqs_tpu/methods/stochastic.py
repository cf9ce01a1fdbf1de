"""Stochastic quantum-jump process of the TJM (fixed shape, vmappable).

Reimplements the reference's jump sampler (mqt-yaqs
core/methods/stochastic_process.py) with dense per-channel weights and masked
application so it traces under jit and batches under vmap:

- jump probability = norm deficit ``1 - <psi|psi>`` of the canonical-at-0
  post-dissipation state;
- channel weights ``dt * gamma_k * <psi|L_k^dag L_k|psi>`` computed for *all*
  channels in one pass from shared left Gram environments (the reference
  already computes every channel's weight to build its PDF);
- the selected channel applies its two (site, operator) slots with dynamic
  indexing — one-site channels carry an identity in slot 2;
- the state is renormalized in both branches (the reference discards the
  leftover QR factor at the boundary, normalizing implicitly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.mps_ops import (
    apply_one_site_operator,
    left_gram_environments,
    norm_squared_center0,
    normalize_canonical,
)
from ..core.noise_model import CompiledNoise
from ..ops.decomp import merge_two_site, split_two_site_truncated

__all__ = ["channel_weights", "channel_weights2", "stochastic_process"]


def channel_weights(tensors: jnp.ndarray, noise: CompiledNoise, dt) -> jnp.ndarray:
    """Unnormalized jump weights ``dt * gamma_k * <psi|(L^dag L)_k|psi>``.

    Expects canonical form at site 0 (any norm). For two-site Pauli channels
    the weight operator is the identity, giving ``dt * gamma * <psi|psi>``
    exactly as the reference's Pauli shortcut.
    """
    envs = left_gram_environments(tensors)

    def one(site, wop):
        a = tensors[site]
        env = envs[site]
        return jnp.real(
            jnp.einsum("blr,bk,kmr,lm->", a.conj(), wop.astype(a.dtype), a, env)
        )

    vals = jax.vmap(one)(noise.ch_site1, noise.ch_weight_op)
    return dt * noise.ch_gamma * vals


def channel_weights2(tensors: jnp.ndarray, noise: CompiledNoise, dt) -> jnp.ndarray:
    """Weights for adjacent non-Pauli two-site channels:
    ``dt gamma <psi|(L^dag L)_{b,b+1}|psi>`` from merged-pair contractions."""
    envs = left_gram_environments(tensors)
    d = tensors.shape[1]
    chi = tensors.shape[-1]

    def one(bond, wop):
        theta = merge_two_site(tensors[bond], tensors[bond + 1])
        env = envs[bond]
        th = theta.reshape(d * d, chi, chi)
        val = jnp.einsum(
            "alr,ab,bmr,lm->", th.conj(), wop.astype(th.dtype), th, env
        )
        return jnp.real(val)

    vals = jax.vmap(one)(noise.ch2_bond, noise.ch2_weight_op)
    return dt * noise.ch2_gamma * vals


def _apply_channel(tensors: jnp.ndarray, noise: CompiledNoise, idx) -> jnp.ndarray:
    op1 = noise.ch_op1[idx]
    op2 = noise.ch_op2[idx]
    s1 = noise.ch_site1[idx]
    s2 = noise.ch_site2[idx]
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
    bond = noise.ch2_bond[idx]
    op = noise.ch2_op[idx]
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
    tensors: jnp.ndarray, noise: CompiledNoise | None, dt, key, trunc=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One jump-or-not step. Returns ``(tensors, jumped)``.

    Input: canonical at site 0, norm <= 1 (post-dissipation). Output:
    canonical at site 0, normalized.
    """
    if noise is None:
        out, _ = normalize_canonical(tensors)
        return out, jnp.asarray(False)

    key_decide, key_choose = jax.random.split(key)
    n2 = norm_squared_center0(tensors)
    dp = 1.0 - n2
    u = jax.random.uniform(key_decide, dtype=n2.dtype)
    jumped = u < dp

    nc1 = noise.ch_gamma.shape[0]
    nc2 = noise.ch2_gamma.shape[0]

    def do_jump(t):
        w1 = channel_weights(t, noise, dt) if nc1 else jnp.zeros((0,))
        w2 = channel_weights2(t, noise, dt) if nc2 else jnp.zeros((0,))
        w = jnp.concatenate([jnp.maximum(w1, 0.0), jnp.maximum(w2, 0.0)])
        total = jnp.sum(w)
        safe_w = jnp.where(total > 0, w, jnp.ones_like(w))
        idx = jax.random.categorical(key_choose, jnp.log(safe_w))
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
    tensors, _ = normalize_canonical(tensors)
    return tensors, jumped
