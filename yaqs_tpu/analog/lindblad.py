"""Exact Lindblad master-equation backend (dense vec(rho) superoperator).

Small-system reference solution (reference analog/lindblad.py): builds the
Liouvillian superoperator in the row-major vec convention

    ``vec(A rho B) = (A kron B^T) vec(rho)``

and evolves with a precomputed ``expm(L dt)`` step propagator.  Deterministic:
one "trajectory".  JAX-native so it runs on device, but exponential in system
size — intended for <= ~6-10 qubits like the reference (lindblad.py:46-99).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import jax
import numpy as np
import scipy.linalg

from .embedding import embed_one_site, embed_operator

__all__ = [
    "build_liouvillian",
    "lindblad_expectations",
    "noise_model_jump_ops",
    "noise_model_jump_ops_sparse",
]


def _embed_one_site_sparse(op, site, length, d=2):
    import scipy.sparse as sp

    m = sp.identity(1, dtype=complex, format="csr")
    for i in range(length):
        o = sp.csr_matrix(np.asarray(op, dtype=complex)) if i == site else sp.identity(d, dtype=complex, format="csr")
        m = sp.kron(o, m, format="csr")
    return m


def noise_model_jump_ops_sparse(noise_model, length: int, d: int = 2) -> list:
    """Sparse (CSR) embedded jump operators ``sqrt(gamma) L``."""
    import scipy.sparse as sp

    ops = []
    if noise_model is None:
        return ops
    for proc in noise_model.processes:
        gamma = float(proc["strength"])
        if gamma == 0.0:
            continue
        sites = proc["sites"]
        if len(sites) == 1:
            full = _embed_one_site_sparse(proc["matrix"], sites[0], length, d)
        elif "factors" in proc:
            f0, f1 = proc["factors"]
            full = _embed_one_site_sparse(f0, sites[0], length, d) @ _embed_one_site_sparse(
                f1, sites[1], length, d
            )
        else:
            msg = "two-site matrix processes need adjacent embedding"
            raise NotImplementedError(msg)
        ops.append(np.sqrt(gamma) * full)
    return ops


def build_liouvillian(h: np.ndarray, jump_ops: list[np.ndarray]) -> np.ndarray:
    """Dense Liouvillian: ``-i[H, .] + sum_k (L . L^dag - 1/2 {L^dag L, .})``.

    ``jump_ops`` carry their rates (pass ``sqrt(gamma) * L``).
    """
    dim = h.shape[0]
    eye = np.eye(dim)
    liou = -1j * (np.kron(h, eye) - np.kron(eye, h.T))
    for jump in jump_ops:
        ld_l = jump.conj().T @ jump
        liou += np.kron(jump, jump.conj())
        liou -= 0.5 * (np.kron(ld_l, eye) + np.kron(eye, ld_l.T))
    return liou


def noise_model_jump_ops(noise_model, length: int, d: int = 2) -> list[np.ndarray]:
    """Embedded jump operators ``sqrt(gamma) L`` for each noise process."""
    ops: list[np.ndarray] = []
    if noise_model is None:
        return ops
    for proc in noise_model.processes:
        gamma = float(proc["strength"])
        if gamma == 0.0:
            continue
        sites = proc["sites"]
        if len(sites) == 1:
            full = embed_one_site(proc["matrix"], sites[0], length, d)
        elif "factors" in proc:
            f0, f1 = proc["factors"]
            full = embed_operator({sites[0]: f0, sites[1]: f1}, length, d)
        else:
            full = NotImplemented
            msg = "two-site matrix processes need adjacent embedding"
            raise NotImplementedError(msg)
        ops.append(np.sqrt(gamma) * full)
    return ops


def lindblad_expectations(
    h: np.ndarray,
    jump_ops: list[np.ndarray],
    psi0: np.ndarray,
    observables: list[np.ndarray],
    dt: float,
    num_steps: int,
) -> np.ndarray:
    """Evolve ``rho = |psi0><psi0|`` and return ``(n_obs, num_steps + 1)``
    real expectation trajectories on the uniform grid ``t_j = j dt``.
    """
    dim = h.shape[0]
    liou = build_liouvillian(h, jump_ops)
    prop = scipy.linalg.expm(liou * dt)
    rho = np.outer(psi0, psi0.conj())

    obs_arr = np.stack(observables)

    # the whole propagation runs under jit with host-numpy operands: eager
    # complex device compute is unsupported on the tunneled TPU platform
    @partial(jax.jit, static_argnames=("steps",))
    def run(prop_j, obs_j, vec0, steps):
        def step(vec_rho, _):
            vec_rho = prop_j @ vec_rho
            rho_m = vec_rho.reshape(dim, dim)
            vals = jnp.real(jnp.einsum("kab,ba->k", obs_j, rho_m))
            return vec_rho, vals

        vals0 = jnp.real(jnp.einsum("kab,ba->k", obs_j, vec0.reshape(dim, dim)))
        _, vals = jax.lax.scan(step, vec0, None, length=steps)
        return jnp.concatenate([vals0[None], vals], axis=0).T

    return np.asarray(run(prop, obs_arr, rho.reshape(-1), num_steps))
