"""Krylov matrix-exponential actions, fixed-shape for jit/vmap.

TPU-native rethink of the reference's adaptive Krylov propagators
(mqt-yaqs core/methods/matrix_exponential.py): instead of an adaptive loop
with early exit (which does not trace), we run a *fixed* number of Lanczos /
Arnoldi iterations with breakdown masking.  Invariant-subspace breakdowns make
the result exact, so masking (zeroing the broken beta and subsequent basis
vectors) reproduces the adaptive algorithm's output whenever it would have
stopped early, and otherwise matches its iteration cap (25 in the reference).

All functions operate on flattened complex vectors and are `vmap`-compatible;
the small (k, k) eigenproblems batch trivially on device.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["lanczos_expm_apply", "arnoldi_expm_apply", "DEFAULT_KRYLOV_DIM"]

DEFAULT_KRYLOV_DIM = 25  # reference iteration cap, matrix_exponential.py:58


def _real_dtype(dtype):
    return jnp.zeros((), dtype=dtype).real.dtype


def lanczos_expm_apply(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    v: jnp.ndarray,
    coeff: complex,
    k: int = DEFAULT_KRYLOV_DIM,
    breakdown_tol: float | None = None,
    reorthogonalize: bool = True,
) -> jnp.ndarray:
    """Compute ``exp(coeff * A) @ v`` for Hermitian ``A`` via Lanczos.

    Args:
        matvec: Hermitian linear operator action on flattened vectors.
        v: Start vector (complex, any shape; flattened internally).
        coeff: Scalar multiplying ``A`` inside the exponential (e.g. ``-1j*dt``).
        k: Static Krylov dimension (number of matvecs).
        breakdown_tol: Beta threshold that flags an invariant subspace; default
            scales with machine eps of the dtype.

    Returns:
        Array of the same shape/dtype as ``v``.
    """
    shape = v.shape
    x = v.reshape(-1)
    n = x.shape[0]
    cdtype = x.dtype
    rdtype = _real_dtype(cdtype)
    if breakdown_tol is None:
        breakdown_tol = float(jnp.finfo(rdtype).eps) * 100.0

    nrm = jnp.linalg.norm(x)
    safe_nrm = jnp.where(nrm > 0, nrm, 1.0).astype(rdtype)
    q0 = (x / safe_nrm).astype(cdtype)

    kk = min(k, n)

    # Basis rows are appended as the iteration proceeds; full
    # reorthogonalization against the stored basis keeps the tridiagonal
    # projection accurate at larger k (the reference's Numba kernel does the
    # same, lanczos_numba.py:16-100).
    V = jnp.zeros((kk, n), dtype=cdtype)
    alphas = jnp.zeros((kk,), dtype=rdtype)
    betas = jnp.zeros((kk,), dtype=rdtype)  # betas[j] couples j and j+1

    def fori_body(j, state):
        V, alphas, betas, q, q_prev, beta_prev, alive = state
        V = V.at[j].set(jnp.where(alive, 1.0, 0.0) * q)
        w = matvec(q.reshape(shape)).reshape(-1)
        alpha = jnp.real(jnp.vdot(q, w)).astype(rdtype)
        if reorthogonalize:
            w = w - (V.conj() @ w) @ V
            w = w - (V.conj() @ w) @ V
        else:
            # plain three-term recurrence (cheaper; fine for small k)
            w = w - alpha.astype(cdtype) * q - beta_prev.astype(cdtype) * q_prev
        beta = jnp.linalg.norm(w).astype(rdtype)
        broke = beta <= breakdown_tol
        alive_next = jnp.logical_and(alive, jnp.logical_not(broke))
        safe_beta = jnp.where(broke, jnp.asarray(1.0, rdtype), beta)
        q_next = jnp.where(alive_next, w / safe_beta, jnp.zeros_like(w))
        alphas = alphas.at[j].set(jnp.where(alive, alpha, 0.0))
        betas = betas.at[j].set(jnp.where(alive_next, beta, 0.0))
        return (V, alphas, betas, q_next, q, beta, alive_next)

    V, alphas, betas, _, _, _, _ = jax.lax.fori_loop(
        0,
        kk,
        fori_body,
        (V, alphas, betas, q0, jnp.zeros_like(q0), jnp.zeros((), rdtype), jnp.asarray(True)),
    )

    # exp(coeff * T) e0 for the (kk, kk) real symmetric tridiagonal T.
    T = jnp.diag(alphas) + jnp.diag(betas[: kk - 1], 1) + jnp.diag(betas[: kk - 1], -1)
    evals, evecs = jnp.linalg.eigh(T)
    phases = jnp.exp(jnp.asarray(coeff, dtype=cdtype) * evals.astype(cdtype))
    e0 = evecs[0, :].astype(cdtype)  # evecs real; row 0 = <e0|evec>
    small = evecs.astype(cdtype) @ (phases * e0.conj())
    out = (small @ V) * nrm.astype(cdtype)
    return jnp.where(nrm > 0, out, x).reshape(shape)


def arnoldi_expm_apply(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    v: jnp.ndarray,
    coeff: complex,
    k: int = DEFAULT_KRYLOV_DIM,
    breakdown_tol: float | None = None,
) -> jnp.ndarray:
    """Compute ``exp(coeff * A) @ v`` for general (non-Hermitian) ``A``.

    Arnoldi with a fixed iteration count and breakdown masking; used for the
    MCWF effective Hamiltonian ``H - (i/2) sum L^dag L`` (reference
    matrix_exponential.py:204-301).
    """
    shape = v.shape
    x = v.reshape(-1)
    n = x.shape[0]
    cdtype = x.dtype
    rdtype = _real_dtype(cdtype)
    if breakdown_tol is None:
        breakdown_tol = float(jnp.finfo(rdtype).eps) * 100.0

    nrm = jnp.linalg.norm(x)
    safe_nrm = jnp.where(nrm > 0, nrm, 1.0).astype(rdtype)
    q0 = (x / safe_nrm).astype(cdtype)
    kk = min(k, n)

    V = jnp.zeros((kk, n), dtype=cdtype)
    H = jnp.zeros((kk, kk), dtype=cdtype)

    def fori_body(j, state):
        V, H, q, alive = state
        V = V.at[j].set(jnp.where(alive, 1.0, 0.0) * q)
        w = matvec(q.reshape(shape)).reshape(-1)
        h = V.conj() @ w  # projections onto all stored basis vectors
        w = w - h @ V
        h2 = V.conj() @ w  # second Gram-Schmidt pass
        w = w - h2 @ V
        h = h + h2
        beta = jnp.linalg.norm(w).astype(rdtype)
        broke = beta <= breakdown_tol
        alive_next = jnp.logical_and(alive, jnp.logical_not(broke))
        safe_beta = jnp.where(broke, jnp.asarray(1.0, rdtype), beta)
        q_next = jnp.where(alive_next, w / safe_beta, jnp.zeros_like(w))
        H = H.at[:, j].set(jnp.where(alive, 1.0, 0.0) * h)
        H = jax.lax.cond(
            jnp.logical_and(alive_next, j + 1 < kk),
            lambda H: H.at[jnp.minimum(j + 1, kk - 1), j].set(beta.astype(cdtype)),
            lambda H: H,
            H,
        )
        return (V, H, q_next, alive_next)

    V, H, _, _ = jax.lax.fori_loop(0, kk, fori_body, (V, H, q0, jnp.asarray(True)))

    e0 = jnp.zeros((kk,), dtype=cdtype).at[0].set(1.0)
    small = jax.scipy.linalg.expm(jnp.asarray(coeff, dtype=cdtype) * H) @ e0
    out = (small @ V) * nrm.astype(cdtype)
    return jnp.where(nrm > 0, out, x).reshape(shape)
