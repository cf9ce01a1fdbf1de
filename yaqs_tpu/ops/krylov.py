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
    small = _expm_col_tridiag(T, coeff, cdtype)
    out = (small @ V) * nrm.astype(cdtype)
    return jnp.where(nrm > 0, out, x).reshape(shape)


def _expm_col_tridiag(T, coeff, cdtype):
    """First column of ``exp(coeff * T)`` for a small real symmetric ``T``.

    float64 uses the exact eigendecomposition; float32 uses Taylor
    scaling-and-squaring (10 terms, dynamic scaling) whose ~1e-10 error is far
    below complex64 working precision — and which avoids the TPU's slow
    iterative eigh on (k, k) blocks (measured ~25% faster per Lanczos call at
    k=6, B=32).
    """
    kk = T.shape[-1]
    if _real_dtype(cdtype) == jnp.float64:
        evals, evecs = jnp.linalg.eigh(T)
        phases = jnp.exp(jnp.asarray(coeff, dtype=cdtype) * evals.astype(cdtype))
        e0 = evecs[0, :].astype(cdtype)  # evecs real; row 0 = <e0|evec>
        return evecs.astype(cdtype) @ (phases * e0.conj())
    a_full = jnp.asarray(coeff, dtype=cdtype) * T.astype(cdtype)
    # dynamic scaling: ||A||_1 / 2^s <= 0.5, s in [0, 12]
    nrm1 = jnp.max(jnp.sum(jnp.abs(a_full), axis=-2))
    s = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(nrm1, 1e-30) / 0.5)), 0, 12)
    a = a_full / (2.0**s).astype(cdtype)
    eye = jnp.eye(kk, dtype=cdtype)
    acc = eye
    m = eye
    fact = 1.0
    for n in range(1, 11):
        m = m @ a
        fact *= n
        acc = acc + m / fact
    # dynamic trip count: executes only the s squarings actually needed
    # (typical TDVP solves scale to s in {0, 1}).  Bench-neutral vs the old
    # static-12 where-guarded loop (5.88 both ways at bench config — the
    # guarded tiny matmuls were not the latency they looked like), kept for
    # the simpler semantics.
    acc = jax.lax.fori_loop(0, s.astype(jnp.int32), lambda i, p: p @ p, acc)
    return acc[:, 0]


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
