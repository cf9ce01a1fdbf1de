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


def _apply_kraus_general(rho, k_l, k_r, env_dim, d=2):
    """General linear intervention on the system (site 0 = LSB):
    ``rho -> (K_l (x) 1_env) rho (K_r (x) 1_env)^dag``.

    A measure-prepare pair is the rank-1 special case
    ``K = |prep><meas|``; a unitary intervention is ``K = U``.
    """
    dim = env_dim * d
    r = rho.reshape(env_dim, d, env_dim, d)
    out = jnp.einsum("sa,eafb,tb->esft", k_l, r, k_r.conj())
    return out.reshape(dim, dim)


@partial(jax.jit, static_argnames=("env_dim", "mode"))
def _simulate_batch(
    prop,
    rho0,
    kraus_l,
    kraus_r,
    env_dim: int,
    mode: str,
):
    """Simulate a batch of sequences.

    ``kraus_l/kraus_r``: ``(batch, k, d, d)`` per-step Kraus operators for
    the row/column sides of rho (equal for physical probes; tomography uses
    mismatched sides).  Returns ``(rho_sys (batch, d, d) unnormalized)``; the
    branch weight is its trace.
    """
    d = kraus_l.shape[-1]
    dim = env_dim * d

    def evolve(rho):
        if mode == "unitary":
            return prop @ rho @ prop.conj().T
        vec = (prop @ rho.reshape(-1)).reshape(dim, dim)
        return vec

    def one(k_l, k_r, rho_init):
        def step(rho, ks):
            kl, kr = ks
            rho = evolve(rho)
            rho = _apply_kraus_general(rho, kl, kr, env_dim, d)
            return rho, None

        rho, _ = jax.lax.scan(step, rho_init, (k_l, k_r))
        rho = evolve(rho)
        r = rho.reshape(env_dim, d, env_dim, d)
        return jnp.einsum("eset->st", r)

    return jax.vmap(lambda a, b: one(a, b, rho0))(kraus_l, kraus_r)


class ExactBackend:
    """Dense exact backend over a Hamiltonian (+ optional Lindblad noise).

    Args:
        hamiltonian: Hamiltonian (system = site 0, environment = the rest).
        tau: Segment duration between interventions.
        noise_model: Optional NoiseModel; switches to superoperator evolution.
        d: System local dimension (2).
    """

    def __init__(
        self,
        hamiltonian,
        tau: float,
        noise_model=None,
        d: int = 2,
        initial_state=None,
    ) -> None:
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
        self.rho0 = self._resolve_initial_state(initial_state, dim)

    @staticmethod
    def _resolve_initial_state(initial_state, dim: int) -> np.ndarray:
        """Initial chain state: ``None`` -> |0...0>; a ``(dim,)`` vector or a
        ``(dim, dim)`` density matrix otherwise (normalized here; the
        reference's ``initial_psi``, memory_characterizer.py:516,812)."""
        if initial_state is None:
            psi0 = np.zeros(dim, dtype=np.complex128)
            psi0[0] = 1.0
            return np.outer(psi0, psi0.conj())
        arr = np.asarray(initial_state, dtype=np.complex128)
        if arr.shape == (dim,):
            nrm = np.linalg.norm(arr)
            if nrm == 0:
                msg = "initial_state vector must be nonzero"
                raise ValueError(msg)
            psi = arr / nrm
            return np.outer(psi, psi.conj())
        if arr.shape == (dim, dim):
            tr = np.trace(arr).real
            if tr <= 0 or np.linalg.norm(arr - arr.conj().T) > 1e-10 * max(tr, 1.0):
                msg = "initial_state density matrix must be Hermitian with positive trace"
                raise ValueError(msg)
            # positivity: an indefinite Hermitian input would silently produce
            # an unphysical characterization (ADVICE r4)
            lo = float(np.linalg.eigvalsh(arr)[0])
            if lo < -1e-10 * max(tr, 1.0):
                msg = (
                    "initial_state density matrix must be positive semidefinite "
                    f"(min eigenvalue {lo:.3e})"
                )
                raise ValueError(msg)
            return arr / tr
        msg = (
            f"initial_state must have shape ({dim},) or ({dim}, {dim}), "
            f"got {arr.shape}"
        )
        raise ValueError(msg)

    def evaluate_kraus_sequences(self, kraus, kraus_r=None) -> np.ndarray:
        """Simulate per-step Kraus sequences: ``kraus (batch, k, d, d)`` ->
        unnormalized final system density matrices ``(batch, d, d)``."""
        kraus = np.asarray(kraus, dtype=np.complex128)
        kraus_r = kraus if kraus_r is None else np.asarray(kraus_r, dtype=np.complex128)
        # numpy operands go straight into the jitted call: eager
        # jnp.asarray of complex128 is unsupported on the tunneled TPU
        out = _simulate_batch(
            to_device(self.prop),
            to_device(self.rho0),
            to_device(kraus),
            to_device(kraus_r),
            self.env_dim,
            self.mode,
        )
        re = np.asarray(jnp.real(out))
        im = np.asarray(jnp.imag(out))
        return re + 1j * im

    def evaluate_sequences(self, meas, prep) -> np.ndarray:
        """MP-pair convenience wrapper: ``meas/prep (batch, k, d)`` kets."""
        meas = np.asarray(meas, dtype=np.complex128)
        prep = np.asarray(prep, dtype=np.complex128)
        kraus = np.einsum("bks,bkt->bkst", prep, meas.conj())
        return self.evaluate_kraus_sequences(kraus)

    def evaluate_general(self, meas_l, meas_r, prep_l, prep_r) -> np.ndarray:
        """General linear-intervention batch (process-tensor tomography):
        mismatched row/column MP sides."""
        kl = np.einsum(
            "bks,bkt->bkst",
            np.asarray(prep_l, dtype=np.complex128),
            np.asarray(meas_l, dtype=np.complex128).conj(),
        )
        kr = np.einsum(
            "bks,bkt->bkst",
            np.asarray(prep_r, dtype=np.complex128),
            np.asarray(meas_r, dtype=np.complex128).conj(),
        )
        return self.evaluate_kraus_sequences(kl, kr)
