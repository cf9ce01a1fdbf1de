"""MPS sequence backend for memory characterization on long chains.

Reference parity: mqt-yaqs characterization/memory/shared/utils.py TJM solver
path (``_evolve_backend_state`` with MPS states) — probe sequences evolved
with tensor networks instead of dense matrices, so the environment chain can
be far longer than the ~10 sites the dense backend handles.

TPU design: the whole probe grid is ONE vmapped jitted program — each probe
sequence is a ``lax.scan`` of (segment TDVP evolution, measure-prepare at
site 0); noisy processes add the TJM dissipation + jump machinery per step
and average over a trajectory batch (second vmap axis).  Weights are tracked
as scalars so states stay normalized for jump bookkeeping; the returned
site-0 density matrices are unnormalized (trace = sequence weight), matching
:class:`.exact.ExactBackend` semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.host import to_device

from ...core import mps_ops
from ...core.noise_model import compile_noise
from ...methods.dissipation import apply_dissipation
from ...methods.stochastic import stochastic_process
from ...methods.tdvp import TDVPConfig, sweep_2site

__all__ = ["MPSBackend"]


def _site0_rho(tensors):
    """Site-0 reduced density matrix for canonical-at-0 tensors."""
    a0 = tensors[0]
    return jnp.einsum("slr,tlr->st", a0, a0.conj())


def _apply_kraus0(tensors, k):
    """Apply a Kraus operator at site 0: ``a0 -> K a0`` (keeps gauge).
    MP pairs are the rank-1 case ``K = |p><m|``; unitaries are ``K = U``."""
    new0 = jnp.einsum("st,tlr->slr", k.astype(tensors.dtype), tensors[0])
    return tensors.at[0].set(new0)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "noisy"))
def _sequence_program(
    tensors0, mpo, kraus, noise, key, dt, cfg: TDVPConfig, n_steps: int, noisy: bool
):
    """One probe sequence: k segments of evolution + intervention, then a
    final segment.

    ``kraus (k, d, d)``.  Returns the unnormalized site-0 density matrix.
    """

    def segment(carry, key):
        tensors, w = carry

        def step(carry2, subkey):
            t, w2 = carry2
            t = sweep_2site(t, mpo, dt, cfg)
            if noisy:
                t = apply_dissipation(t, noise, dt)
                t, _ = stochastic_process(t, noise, dt, subkey)
            return (t, w2), None

        (tensors, w), _ = jax.lax.scan(
            step, (tensors, w), jax.random.split(key, n_steps)
        )
        return tensors, w

    def leg(carry, xs):
        tensors, w = carry
        kmat, key = xs
        tensors, w = segment((tensors, w), key)
        tensors = _apply_kraus0(tensors, kmat)
        n2 = mps_ops.norm_squared_center0(tensors)
        safe = jnp.where(n2 > 0, jnp.sqrt(n2), 1.0)
        tensors = tensors.at[0].set(tensors[0] / safe.astype(tensors.dtype))
        return (tensors, w * n2), None

    k = kraus.shape[0]
    keys = jax.random.split(key, k + 1)
    (tensors, w), _ = jax.lax.scan(
        leg, (tensors0, jnp.asarray(1.0, mps_ops.norm_squared_center0(tensors0).dtype)),
        (kraus, keys[:k]),
    )
    tensors, w = segment((tensors, w), keys[k])
    return _site0_rho(tensors) * w.astype(tensors.dtype)


class MPSBackend:
    """Sequence simulator over a padded-MPS chain (long environments).

    Args:
        hamiltonian: Hamiltonian; system = site 0.
        tau: Segment duration between interventions.
        noise_model: Optional NoiseModel — evolves TJM trajectories and
            averages ``num_traj`` of them per probe.
        chi: Padded bond dimension.
        dt: TDVP step; ``tau`` is subdivided into ``ceil(tau/dt)`` steps.
        krylov_dim / svd_threshold / max_bond_dim: sweep settings.
        num_traj: Trajectory count per probe for noisy processes.
        seed: Base PRNG seed for the jump streams.
    """

    def __init__(
        self,
        hamiltonian,
        tau: float,
        noise_model=None,
        d: int = 2,
        *,
        chi: int = 16,
        dt: float = 0.1,
        krylov_dim: int = 12,
        svd_threshold: float = 1e-10,
        trunc_mode: str = "discarded_weight",
        num_traj: int = 64,
        seed: int = 0,
    ) -> None:
        self.length = hamiltonian.length
        self.d = d
        self.tau = float(tau)
        self.n_steps = max(1, int(np.ceil(self.tau / float(dt))))
        self.dt = self.tau / self.n_steps
        self.chi = int(chi)
        self.mpo = np.asarray(hamiltonian.ensure_mpo(), dtype=np.complex128)
        self.cfg = TDVPConfig(
            krylov_dim=int(krylov_dim),
            trunc_mode=trunc_mode,
            threshold=float(svd_threshold),
            max_bond_dim=self.chi,
        )
        self.noisy = noise_model is not None and bool(noise_model.processes)
        self.noise = (
            compile_noise(noise_model, self.length, d) if self.noisy else None
        )
        self.num_traj = int(num_traj) if self.noisy else 1
        self.seed = int(seed)
        self.tensors0 = mps_ops.named_product_state("zeros", self.length, self.chi)

    def evaluate_kraus_sequences(self, kraus) -> np.ndarray:
        """``kraus (batch, k, d, d)`` -> unnormalized ``(batch, d, d)``."""
        kraus = np.asarray(kraus, dtype=np.complex128)
        base = jax.random.PRNGKey(self.seed)

        def one(kmats, key):
            return _sequence_program(
                jnp.asarray(self.tensors0),
                self.mpo,
                kmats,
                self.noise,
                key,
                self.dt,
                self.cfg,
                self.n_steps,
                self.noisy,
            )

        batch = kraus.shape[0]
        # the whole batch evaluation runs under ONE jit with numpy operands:
        # eager complex device ops (including jnp.asarray of complex128) are
        # unsupported on the tunneled TPU platform
        if self.noisy:
            run = jax.jit(
                lambda k_b, ks_b: jax.vmap(
                    lambda km, ks: jnp.mean(
                        jax.vmap(lambda k: one(km, k))(ks), axis=0
                    )
                )(k_b, ks_b)
            )
            keys = jax.vmap(
                lambda i: jax.vmap(lambda t: jax.random.fold_in(jax.random.fold_in(base, i), t))(
                    jnp.arange(self.num_traj)
                )
            )(jnp.arange(batch))
            out = run(to_device(kraus), keys)
        else:
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(batch))
            out = jax.jit(lambda k_b, ks_b: jax.vmap(one)(k_b, ks_b))(
                to_device(kraus), keys
            )
        re = np.asarray(jnp.real(out))
        im = np.asarray(jnp.imag(out))
        return re + 1j * im

    def evaluate_sequences(self, meas, prep) -> np.ndarray:
        """MP-pair convenience wrapper: ``meas/prep (batch, k, d)`` kets."""
        meas = np.asarray(meas, dtype=np.complex128)
        prep = np.asarray(prep, dtype=np.complex128)
        return self.evaluate_kraus_sequences(
            np.einsum("bks,bkt->bkst", prep, meas.conj())
        )
