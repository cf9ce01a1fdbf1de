"""Dissipative half-step of the Tensor Jump Method (fixed shape).

The reference applies ``exp(-dt/2 sum_k gamma_k L_k^dag L_k)`` per site inside
an SVD-shifted right-to-left sweep (mqt-yaqs core/methods/dissipation.py:51-).
On TPU the one-site dissipators commute with each other, so we apply *all* of
them in a single batched einsum (embarrassingly parallel over sites) and then
restore canonical form at site 0 with one QR scan — same state, same norm
decay, no sequential site sweep.

The per-site operator is reconstructed from the host-precomputed
eigendecomposition of the generator, so ``dt`` may be traced:
``E_i(dt) = V_i diag(exp(-dt/2 lam_i)) V_i^dag``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.mps_ops import apply_operator_everywhere, canonicalize_right
from ..core.noise_model import CompiledNoise
from ..ops.decomp import merge_two_site, split_two_site_truncated

__all__ = ["dissipation_operators", "apply_dissipation"]


def dissipation_operators(noise: CompiledNoise, dt) -> jnp.ndarray:
    """Per-site dissipative operators ``(L, d, d)`` for a (traced) ``dt``."""
    phases = jnp.exp(-0.5 * dt * noise.diss_evals)  # (L, d) real decay
    v = noise.diss_evecs
    return jnp.einsum("iab,ib,icb->iac", v, phases.astype(v.dtype), v.conj())


def bond_dissipation_operators(noise: CompiledNoise, dt) -> jnp.ndarray:
    """Per-bond merged-pair dissipators ``(L-1, d^2, d^2)`` (adjacent
    non-Pauli processes; identity where absent)."""
    phases = jnp.exp(-0.5 * dt * noise.diss2_evals)
    v = noise.diss2_evecs
    return jnp.einsum("iab,ib,icb->iac", v, phases.astype(v.dtype), v.conj())


def apply_dissipation(
    tensors: jnp.ndarray,
    noise: CompiledNoise | None,
    dt,
    trunc=None,
) -> jnp.ndarray:
    """Apply the dissipative half-step and return canonical-at-0 tensors.

    The output is *not* normalized: the norm deficit carries the jump
    probability for the subsequent stochastic process (TJM semantics).
    ``trunc`` (a TDVPConfig-like object) supplies the split policy when
    adjacent non-Pauli two-site dissipators are present (reference
    dissipation.py:142-172 merged+split sweep).

    The output is generally NOT canonical: the subsequent stochastic process
    computes its jump weights gauge-free, and renormalization restores the
    canonical form — skipping a full QR sweep per dissipation call.
    """
    if noise is None:
        return tensors  # engines call this on already-canonical states
    ops = dissipation_operators(noise, dt)
    tensors = apply_operator_everywhere(tensors, ops)
    if noise.ch2_gamma.shape[0] > 0:
        tensors = canonicalize_right(tensors)
        length, d, chi, _ = tensors.shape
        bond_ops = bond_dissipation_operators(noise, dt)
        mode = getattr(trunc, "trunc_mode", "discarded_weight")
        threshold = getattr(trunc, "threshold", 1e-12)
        cap = getattr(trunc, "max_bond_dim", None)

        def body(tensors, xs):
            i, e = xs
            theta = merge_two_site(tensors[i], tensors[i + 1])
            th = theta.reshape(d * d, chi * chi)
            th = (e.astype(th.dtype) @ th).reshape(d, d, chi, chi)
            a, b, _, _ = split_two_site_truncated(
                th, chi, mode=mode, threshold=threshold, max_bond_dim=cap,
                min_keep=1, svd_distribution="right",
            )
            return tensors.at[i].set(a).at[i + 1].set(b), None

        tensors, _ = jax.lax.scan(
            body, tensors, (jnp.arange(length - 1), bond_ops)
        )
    return tensors
