"""Krylov propagator accuracy against dense scipy expm."""

from __future__ import annotations

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from yaqs_tpu.ops.krylov import arnoldi_expm_apply, lanczos_expm_apply


def random_hermitian(n, rng):
    a = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    return (a + a.conj().T) / 2


def test_lanczos_matches_dense(seed):
    rng = np.random.default_rng(seed)
    n = 64
    h = random_hermitian(n, rng)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    dt = 0.1
    expected = scipy.linalg.expm(-1j * dt * h) @ v
    hj = jnp.asarray(h)
    got = lanczos_expm_apply(lambda x: hj @ x, jnp.asarray(v), -1j * dt, k=25)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-10)


def test_lanczos_small_krylov_dim_converges_for_small_dt(seed):
    rng = np.random.default_rng(seed + 1)
    n = 128
    h = random_hermitian(n, rng)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    dt = 0.05
    expected = scipy.linalg.expm(-1j * dt * h) @ v
    hj = jnp.asarray(h)
    got = lanczos_expm_apply(lambda x: hj @ x, jnp.asarray(v), -1j * dt, k=15)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-9)


def test_lanczos_breakdown_invariant_subspace(seed):
    # v is an eigenvector -> breakdown at iteration 1; result must be exact.
    rng = np.random.default_rng(seed)
    n = 16
    h = random_hermitian(n, rng)
    evals, evecs = np.linalg.eigh(h)
    v = evecs[:, 3]
    dt = 0.7
    expected = np.exp(-1j * dt * evals[3]) * v
    got = lanczos_expm_apply(lambda x: jnp.asarray(h) @ x, jnp.asarray(v), -1j * dt, k=10)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-12)


def test_lanczos_zero_vector_passthrough():
    h = jnp.eye(8, dtype=jnp.complex128)
    v = jnp.zeros(8, dtype=jnp.complex128)
    got = lanczos_expm_apply(lambda x: h @ x, v, -1j * 0.1, k=5)
    np.testing.assert_array_equal(np.asarray(got), 0.0)


def test_arnoldi_matches_dense_nonhermitian(seed):
    rng = np.random.default_rng(seed)
    n = 48
    h = random_hermitian(n, rng)
    ldag_l = random_hermitian(n, rng)
    ldag_l = ldag_l @ ldag_l  # PSD
    heff = h - 0.5j * ldag_l  # MCWF effective Hamiltonian shape
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    dt = 0.05
    expected = scipy.linalg.expm(-1j * dt * heff) @ v
    hj = jnp.asarray(heff)
    got = arnoldi_expm_apply(lambda x: hj @ x, jnp.asarray(v), -1j * dt, k=25)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-8)


def test_lanczos_vmap(seed):
    import jax

    rng = np.random.default_rng(seed)
    n = 32
    h = random_hermitian(n, rng)
    vs = rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n))
    dt = 0.1
    hj = jnp.asarray(h)
    f = jax.vmap(lambda v: lanczos_expm_apply(lambda x: hj @ x, v, -1j * dt, k=20))
    got = np.asarray(f(jnp.asarray(vs)))
    for i in range(4):
        expected = scipy.linalg.expm(-1j * dt * h) @ vs[i]
        np.testing.assert_allclose(got[i], expected, atol=1e-9)


def test_lanczos_no_reorth_accuracy(seed):
    rng = np.random.default_rng(seed)
    n = 128
    h = random_hermitian(n, rng)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    dt = 0.05
    expected = scipy.linalg.expm(-1j * dt * h) @ v
    hj = jnp.asarray(h)
    got = lanczos_expm_apply(lambda x: hj @ x, jnp.asarray(v), -1j * dt, k=12,
                             reorthogonalize=False)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-7)
