"""Exact dense rho-space sequence simulator for memory characterization.

The probed process is: evolve the chain for a segment of duration ``tau``,
intervene on the system qubit (site 0, least significant), repeat ``k``
times, evolve a final segment, and read out the system qubit's Bloch vector
and branch weight.

TPU design: the whole (past x future) probe grid is one flat batch of
identical scan programs (``vmap``), replacing the reference's process-pool
``run_indexed_jobs`` over (sequence, trajectory) indices
(mqt-yaqs characterization/memory/sequences/workflow.py).  Noiseless
processes evolve ``rho -> U rho U^dag`` with two matmuls; Lindblad noise uses
the dense superoperator propagator (small chains, like the reference's
recommendation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.host import to_device
import scipy.linalg

from ...analog.lindblad import build_liouvillian, noise_model_jump_ops

__all__ = ["ExactBackend"]


def _apply_mp_general(rho, meas_l, meas_r, prep_l, prep_r, env_dim, d=2):
    """General linear intervention on the system (site 0 = LSB):
    ``rho -> <meas_l| rho |meas_r>_sys  (x)  |prep_l><prep_r|``.
    """
    dim = env_dim * d
    r = rho.reshape(env_dim, d, env_dim, d)
    env = jnp.einsum("s,esft,t->ef", meas_l.conj(), r, meas_r)
    out = jnp.einsum("ef,s,t->esft", env, prep_l, prep_r.conj())
    return out.reshape(dim, dim)


@partial(jax.jit, static_argnames=("env_dim", "mode"))
def _simulate_batch(
    prop,
    rho0,
    meas_l,
    meas_r,
    prep_l,
    prep_r,
    env_dim: int,
    mode: str,
):
    """Simulate a batch of sequences.

    ``meas_l/meas_r/prep_l/prep_r``: ``(batch, k, d)`` kets. Returns
    ``(rho_sys (batch, d, d) unnormalized)``; the branch weight is its trace.
    """
    d = meas_l.shape[-1]
    dim = env_dim * d

    def evolve(rho):
        if mode == "unitary":
            return prop @ rho @ prop.conj().T
        vec = (prop @ rho.reshape(-1)).reshape(dim, dim)
        return vec

    def one(m_l, m_r, p_l, p_r, rho_init):
        def step(rho, kets):
            ml, mr, pl, pr = kets
            rho = evolve(rho)
            rho = _apply_mp_general(rho, ml, mr, pl, pr, env_dim, d)
            return rho, None

        rho, _ = jax.lax.scan(step, rho_init, (m_l, m_r, p_l, p_r))
        rho = evolve(rho)
        r = rho.reshape(env_dim, d, env_dim, d)
        return jnp.einsum("eset->st", r)

    return jax.vmap(lambda a, b, c, e: one(a, b, c, e, rho0))(
        meas_l, meas_r, prep_l, prep_r
    )


class ExactBackend:
    """Dense exact backend over a Hamiltonian (+ optional Lindblad noise).

    Args:
        hamiltonian: Hamiltonian (system = site 0, environment = the rest).
        tau: Segment duration between interventions.
        noise_model: Optional NoiseModel; switches to superoperator evolution.
        d: System local dimension (2).
    """

    def __init__(self, hamiltonian, tau: float, noise_model=None, d: int = 2) -> None:
        h = hamiltonian.ensure_matrix()
        self.length = hamiltonian.length
        self.d = d
        self.env_dim = h.shape[0] // d
        self.tau = float(tau)
        if noise_model is None or not noise_model.processes:
            self.mode = "unitary"
            self.prop = scipy.linalg.expm(-1j * tau * h)
        else:
            self.mode = "lindblad"
            jumps = noise_model_jump_ops(noise_model, self.length, d)
            liou = build_liouvillian(h, jumps)
            self.prop = scipy.linalg.expm(tau * liou)
        dim = h.shape[0]
        psi0 = np.zeros(dim, dtype=np.complex128)
        psi0[0] = 1.0
        self.rho0 = np.outer(psi0, psi0.conj())

    def evaluate_sequences(self, meas, prep) -> np.ndarray:
        """Simulate MP sequences: ``meas/prep (batch, k, d)`` kets ->
        unnormalized final system density matrices ``(batch, d, d)``."""
        meas = np.asarray(meas)
        prep = np.asarray(prep)
        # numpy operands go straight into the jitted call: eager
        # jnp.asarray of complex128 is unsupported on the tunneled TPU
        out = _simulate_batch(
            to_device(self.prop),
            to_device(self.rho0),
            to_device(meas),
            to_device(meas),
            to_device(prep),
            to_device(prep),
            self.env_dim,
            self.mode,
        )
        re = np.asarray(jnp.real(out))
        im = np.asarray(jnp.imag(out))
        return re + 1j * im

    def evaluate_general(self, meas_l, meas_r, prep_l, prep_r) -> np.ndarray:
        """General linear-intervention batch (process-tensor tomography)."""
        out = _simulate_batch(
            to_device(self.prop),
            to_device(self.rho0),
            to_device(np.asarray(meas_l, dtype=np.complex128)),
            to_device(np.asarray(meas_r, dtype=np.complex128)),
            to_device(np.asarray(prep_l, dtype=np.complex128)),
            to_device(np.asarray(prep_r, dtype=np.complex128)),
            self.env_dim,
            self.mode,
        )
        re = np.asarray(jnp.real(out))
        im = np.asarray(jnp.imag(out))
        return re + 1j * im
