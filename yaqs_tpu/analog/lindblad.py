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

from .embedding import embed_one_site, embed_operator, operator_schmidt_factors

__all__ = [
    "build_liouvillian",
    "build_liouvillian_sparse",
    "lindblad_expectations",
    "lindblad_rk4_expectations",
    "noise_model_jump_ops",
    "noise_model_jump_ops_sparse",
]

# Past this vec(rho) size the dense expm(L dt) propagator is no longer
# precomputed and the run switches to fixed-grid RK4 on the sparse RHS
# (reference analog/lindblad.py:46-48 MAX_PROPAGATOR_DIM, :343-375 RK45 path).
MAX_PROPAGATOR_VEC_DIM = 4096
# reference lindblad.py:96-99: density-matrix evolution is exponential in N;
# warn beyond this system size.
RECOMMENDED_MAX_QUBITS = 10


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
            # adjacent two-site matrix: operator-Schmidt sum of products
            full = None
            for a_k, b_k in operator_schmidt_factors(proc["matrix"], d):
                term = _embed_one_site_sparse(a_k, sites[0], length, d) @ _embed_one_site_sparse(
                    b_k, sites[1], length, d
                )
                full = term if full is None else full + term
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
            # adjacent two-site matrix: operator-Schmidt sum of products
            full = sum(
                embed_operator({sites[0]: a_k, sites[1]: b_k}, length, d)
                for a_k, b_k in operator_schmidt_factors(proc["matrix"], d)
            )
        ops.append(np.sqrt(gamma) * full)
    return ops


def build_liouvillian_sparse(h_sparse, jump_ops_sparse: list):
    """Sparse (CSR) Liouvillian, same convention as :func:`build_liouvillian`
    but without a dense intermediate (reference lindblad.py:215-258 builds the
    same superoperator; the sparse form backs the large-system ODE path)."""
    import scipy.sparse as sp

    dim = h_sparse.shape[0]
    eye = sp.identity(dim, dtype=complex, format="csr")
    h = h_sparse.tocsr().astype(complex)
    liou = -1j * (sp.kron(h, eye, format="csr") - sp.kron(eye, h.T, format="csr"))
    for jump in jump_ops_sparse:
        j = jump.tocsr().astype(complex)
        ld_l = (j.conj().T @ j).tocsr()
        liou = liou + sp.kron(j, j.conj(), format="csr")
        liou = liou - 0.5 * (
            sp.kron(ld_l, eye, format="csr") + sp.kron(eye, ld_l.T, format="csr")
        )
    return liou.tocsr()


def lindblad_rk4_expectations(
    liou_sparse,
    rho0_vec: np.ndarray,
    observables_sparse: list,
    dt: float,
    num_steps: int,
    substeps: int | None = None,
    return_final: bool = False,
) -> np.ndarray:
    """Large-system Lindblad evolution: fixed-grid RK4 on the sparse
    vectorized RHS ``d vec(rho)/dt = L vec(rho)``.

    With ``return_final`` set, returns ``(vals, vec_rho_final)`` so callers
    can materialize the final density matrix (reference get_state contract,
    simulator.py:361-370).

    TPU-native replacement for the reference's adaptive ``solve_ivp`` RK45
    fallback (reference analog/lindblad.py:343-375): a fixed substep grid is
    chosen from the Liouvillian one-norm so the whole propagation is one
    jit-compiled ``lax.scan`` (no data-dependent step control), with the
    sparse operator as a BCOO matvec on device.  All complex operands ride as
    trace-time closures per the tunneled-TPU platform rules; the Liouvillian
    is split into REAL BCOO parts (``L v = (Lr vr - Li vi) + i(Li vr + Lr vi)``,
    four real matvecs) because complex BCOO matvecs do not lower on the
    tunneled TPU while real ones do (platform rule 6b, docs/tpu_numerics.md).

    Returns ``(n_obs, num_steps + 1)`` real expectation trajectories.
    """
    from jax.experimental import sparse as jsparse

    liou_csr = liou_sparse.tocsr()
    dim = int(round(np.sqrt(liou_csr.shape[0])))
    if substeps is None:
        # RK4's stability region reaches ~2.8 on the imaginary axis; cap the
        # substep at ||L||_1 * h <= 0.5 for accuracy margin as well
        onenorm = float(np.abs(liou_csr).sum(axis=0).max())
        substeps = max(1, int(np.ceil(dt * onenorm / 0.5)))
    h = dt / substeps

    liou_re = jsparse.BCOO.from_scipy_sparse(np.real(liou_csr).tocoo())
    liou_im = jsparse.BCOO.from_scipy_sparse(np.imag(liou_csr).tocoo())

    def liou_matvec(vec):
        vr, vi = jnp.real(vec), jnp.imag(vec)
        return (liou_re @ vr - liou_im @ vi) + 1j * (liou_im @ vr + liou_re @ vi)
    # trace(O rho) = sum over nonzeros O[r,c] * rho[c,r]
    obs_idx = []
    for o in observables_sparse:
        coo = o.tocoo()
        obs_idx.append(
            (
                np.asarray(coo.row, dtype=np.int32),
                np.asarray(coo.col, dtype=np.int32),
                np.asarray(coo.data, dtype=np.complex128),
            )
        )
    vec0 = np.asarray(rho0_vec, dtype=np.complex128).reshape(-1)

    @partial(jax.jit, static_argnames=("steps", "nsub"))
    def run(steps: int, nsub: int):
        def measure(vec):
            rho_m = vec.reshape(dim, dim)
            if not obs_idx:
                return jnp.zeros((0,), vec.real.dtype)
            return jnp.stack(
                [
                    jnp.real(jnp.sum(jnp.asarray(data) * rho_m[col, row]))
                    for row, col, data in obs_idx
                ]
            )

        def substep(vec, _):
            k1 = liou_matvec(vec)
            k2 = liou_matvec(vec + 0.5 * h * k1)
            k3 = liou_matvec(vec + 0.5 * h * k2)
            k4 = liou_matvec(vec + h * k3)
            return vec + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        def step(vec, _):
            vec, _ = jax.lax.scan(substep, vec, None, length=nsub)
            return vec, measure(vec)

        v0 = jnp.asarray(vec0)  # closure constant -> device
        vals0 = measure(v0)
        vec_f, vals = jax.lax.scan(step, v0, None, length=steps)
        return jnp.concatenate([vals0[None], vals], axis=0).T, vec_f

    vals, vec_f = run(num_steps, substeps)
    if return_final:
        from ..utils.host import fetch

        return np.asarray(vals), fetch(vec_f)
    return np.asarray(vals)


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
    vec0 = rho.reshape(-1)

    # the whole propagation runs under jit, and the complex operands ride as
    # trace-time CLOSURES (host-numpy constants): on the tunneled TPU platform
    # both eager complex device compute AND complex jit call operands are
    # unimplemented (platform rule 2, docs/tpu_numerics.md)
    @partial(jax.jit, static_argnames=("steps",))
    def run(steps):
        prop_j = jnp.asarray(prop)
        obs_j = jnp.asarray(obs_arr)

        def step(vec_rho, _):
            vec_rho = prop_j @ vec_rho
            rho_m = vec_rho.reshape(dim, dim)
            vals = jnp.real(jnp.einsum("kab,ba->k", obs_j, rho_m))
            return vec_rho, vals

        v0 = jnp.asarray(vec0)
        vals0 = jnp.real(jnp.einsum("kab,ba->k", obs_j, v0.reshape(dim, dim)))
        _, vals = jax.lax.scan(step, v0, None, length=steps)
        return jnp.concatenate([vals0[None], vals], axis=0).T

    return np.asarray(run(num_steps))
