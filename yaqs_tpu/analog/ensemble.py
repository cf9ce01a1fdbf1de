"""Deterministic unitary ensembles and multi-time correlators.

Reference: mqt-yaqs analog/ensemble.py — noiseless evolution of a list of
states (member-mean aggregation) and two-time correlators
``<psi(t)| A U(t) B |psi(0)>`` computed by co-evolving auxiliary states
``phi = B |psi0>`` alongside ``psi`` (ensemble.py:43-137).

TPU mapping: members are a vmapped batch (identical programs), auxiliary
states ride in the same scan; correlators are gauge-free mixed overlaps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.mps_ops import canonicalize_right, transfer_right
from ..core.observables import evaluate_observables
from ..methods.tdvp import tdvp_step

__all__ = ["mixed_site_expectation", "mixed_terms_expectation", "ensemble_trajectory"]


def mixed_site_expectation(bra, ket, op, site):
    """``<bra| O_site |ket>`` by full transfer contraction (any gauge)."""
    chi = bra.shape[-1]
    length = bra.shape[0]
    env0 = jnp.eye(chi, dtype=ket.dtype)

    def step(env, xs):
        i, ab, ak = xs
        ak2 = jnp.where(i == site, jnp.einsum("ab,blr->alr", op.astype(ak.dtype), ak), ak)
        return transfer_right(env, ab, ak2), None

    env, _ = jax.lax.scan(step, env0, (jnp.arange(length), bra, ket))
    return jnp.trace(env)


def mixed_terms_expectation(bra, ket, terms, sites):
    """``<bra| A |ket>`` for a k-site operator given as summed product terms.

    ``terms (K, S, d, d)`` holds per-term one-site factors applied at
    ``sites (S,)`` (slots padded with identities at site 0; whole padding
    terms are all-zero and contribute nothing).  This is the gauge-free
    generalization of the reference's multi-time probe evaluation
    (ensemble.py:101-137 applies ``A`` via ``mixed_expectation``, which is
    limited to one-/two-site — the operator-Schmidt product form extends it
    to arbitrary non-adjacent supports).
    """
    chi = bra.shape[-1]
    length = bra.shape[0]
    n_slots = terms.shape[1]
    env0 = jnp.eye(chi, dtype=ket.dtype)

    def one_term(facs):
        def step(env, xs):
            i, ab, ak = xs
            for s in range(n_slots):
                ak = jnp.where(
                    i == sites[s],
                    jnp.einsum("ab,blr->alr", facs[s].astype(ak.dtype), ak),
                    ak,
                )
            return transfer_right(env, ab, ak), None

        env, _ = jax.lax.scan(step, env0, (jnp.arange(length), bra, ket))
        return jnp.trace(env)

    return jnp.sum(jax.vmap(one_term)(terms))


@partial(jax.jit, static_argnames=("plan",))
def ensemble_trajectory(
    tensors0: jnp.ndarray,
    mpo: jnp.ndarray,
    observables,
    mt_ops: jnp.ndarray,
    mt_sites: jnp.ndarray,
    phis0: jnp.ndarray,
    plan,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Evolve one member deterministically; returns
    ``(obs (n_obs, T), correlators (n_pairs, T) complex)``.

    ``phis0 (n_pairs, L, d, chi, chi)`` are the ``B|psi0>`` auxiliary states
    (unnormalized); ``mt_ops (n_pairs, K, S, d, d)`` / ``mt_sites
    (n_pairs, S)`` are the ``A`` operators in product-term form (see
    :func:`mixed_terms_expectation`).
    """
    dt = plan.dt
    cfg = plan.evolution
    if plan.evolution_mode == "bug":
        from ..methods.bug import bug_step

        evolve = lambda t: bug_step(t, mpo, dt, cfg)
    else:
        evolve = lambda t: tdvp_step(t, mpo, dt, cfg)
    n_pairs = phis0.shape[0]

    def measure(psi, phis):
        obs = evaluate_observables(psi, observables)
        corr = jax.vmap(
            lambda phi, terms, sites: mixed_terms_expectation(psi, phi, terms, sites)
        )(phis, mt_ops, mt_sites) if n_pairs else jnp.zeros((0,), psi.dtype)
        return obs, corr

    obs0, corr0 = measure(tensors0, phis0)

    def body(carry, _):
        psi, phis = carry
        psi = evolve(psi)
        phis = jax.vmap(evolve)(phis) if n_pairs else phis
        obs, corr = measure(psi, phis)
        return (psi, phis), (obs, corr)

    if plan.num_steps > 0:
        (_, _), (obs_rest, corr_rest) = jax.lax.scan(
            body, (tensors0, phis0), None, length=plan.num_steps
        )
        obs = jnp.concatenate([obs0[None], obs_rest], axis=0).T
        corr = jnp.concatenate([corr0[None], corr_rest], axis=0).T
    else:
        obs = obs0[:, None]
        corr = corr0[:, None]
    return obs, corr


def prepare_phi(tensors0: jnp.ndarray, b_op: jnp.ndarray, site) -> jnp.ndarray:
    """``B |psi0>`` canonicalized (not normalized)."""
    t = tensors0.at[site].set(
        jnp.einsum("ab,blr->alr", b_op.astype(tensors0.dtype), tensors0[site])
    )
    return canonicalize_right(t)
