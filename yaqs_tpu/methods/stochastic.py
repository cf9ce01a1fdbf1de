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

__all__ = ["channel_weights", "stochastic_process"]


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


def stochastic_process(
    tensors: jnp.ndarray, noise: CompiledNoise | None, dt, key
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

    def do_jump(t):
        w = channel_weights(t, noise, dt)
        w = jnp.maximum(w, 0.0)
        total = jnp.sum(w)
        safe_w = jnp.where(total > 0, w, jnp.ones_like(w))
        idx = jax.random.categorical(key_choose, jnp.log(safe_w))
        return _apply_channel(t, noise, idx)

    tensors = jax.lax.cond(jumped, do_jump, lambda t: t, tensors)
    tensors, _ = normalize_canonical(tensors)
    return tensors, jumped
