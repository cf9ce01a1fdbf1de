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

import jax.numpy as jnp

from ..core.mps_ops import apply_operator_everywhere, canonicalize_right
from ..core.noise_model import CompiledNoise

__all__ = ["dissipation_operators", "apply_dissipation"]


def dissipation_operators(noise: CompiledNoise, dt) -> jnp.ndarray:
    """Per-site dissipative operators ``(L, d, d)`` for a (traced) ``dt``."""
    phases = jnp.exp(-0.5 * dt * noise.diss_evals)  # (L, d) real decay
    v = noise.diss_evecs
    return jnp.einsum("iab,ib,icb->iac", v, phases.astype(v.dtype), v.conj())


def apply_dissipation(tensors: jnp.ndarray, noise: CompiledNoise | None, dt) -> jnp.ndarray:
    """Apply the dissipative half-step and return canonical-at-0 tensors.

    The output is *not* normalized: the norm deficit carries the jump
    probability for the subsequent stochastic process (TJM semantics).
    """
    if noise is None:
        return canonicalize_right(tensors)
    ops = dissipation_operators(noise, dt)
    tensors = apply_operator_everywhere(tensors, ops)
    return canonicalize_right(tensors)
