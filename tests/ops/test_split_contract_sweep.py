"""Randomized split-contract sweep across method x dtype x shape x spectrum.

Post-cliff diligence (docs/tpu_numerics.md round-5): the split contracts are
checked over a randomized grid rather than hand-picked cases —
reconstruction quality vs the exact truncated SVD, finiteness, padding
hygiene, and (exact path) isometry, for every svd_method/qr_method the
engines can select.  Spectrum classes cover fast decay (TFIM-like), slow
decay (Heisenberg-like), near-degenerate, rank-deficient, and flat.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from yaqs_tpu.ops.decomp import split_matrix_subspace, split_matrix_truncated

SPECTRA = {
    "fast": lambda k: np.exp(-1.5 * np.arange(k)),
    "slow": lambda k: np.exp(-0.12 * np.arange(k)),
    "near_degenerate": lambda k: np.concatenate(
        [np.full(k // 2, 1.0), np.full(k - k // 2, 0.999)]
    ),
    "rank_deficient": lambda k: np.concatenate(
        [np.ones(max(1, k // 8)), np.zeros(k - max(1, k // 8))]
    ),
    "flat": lambda k: np.ones(k),
}


def _matrix(n, spectrum, dtype, seed):
    rng = np.random.default_rng(seed)
    s = SPECTRA[spectrum](n)
    u, _ = np.linalg.qr(rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    return (u @ np.diag(s) @ v.conj().T).astype(dtype)


def _exact_recon_err(m, chi):
    u, s, vh = np.linalg.svd(np.asarray(m, dtype=np.complex128))
    return np.linalg.norm(u[:, :chi] * s[:chi] @ vh[:chi] - m)


@pytest.mark.parametrize("spectrum", sorted(SPECTRA))
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize("n,chi", [(32, 16), (64, 32)])
def test_subspace_newton_split_contract(spectrum, dtype, n, chi):
    m = _matrix(n, spectrum, dtype, seed=hash((spectrum, n)) % 2**31)
    left, right, s_approx, keep = split_matrix_subspace(
        jnp.asarray(m), chi, iters=1, qr_method="newton"
    )
    out = np.asarray(left) @ np.asarray(right)
    assert np.isfinite(out).all()
    exact = _exact_recon_err(m, chi)
    got = np.linalg.norm(out - m)
    scale = np.linalg.norm(m)
    # recon within the exact floor times the subspace-convergence overhead
    # (ratio (sigma_{chi+1}/sigma_chi)^3 at iters=1: measured 1.073x worst
    # on the slow class) plus a bounded partial-isometry allowance
    assert got <= 1.15 * exact + 2e-3 * scale, (got, exact)
    assert np.asarray(s_approx).shape[-1] == chi
    assert int(np.asarray(keep)) == chi


@pytest.mark.parametrize("spectrum", sorted(SPECTRA))
@pytest.mark.parametrize("n,chi", [(32, 16), (64, 32)])
def test_subspace_householder_split_contract(spectrum, n, chi):
    """Householder path (float64/CPU production): near-exact recon + strict
    isometry for every spectrum class."""
    m = _matrix(n, spectrum, np.complex128, seed=hash((spectrum, n, 1)) % 2**31)
    left, right, _, _ = split_matrix_subspace(
        jnp.asarray(m), chi, iters=2, qr_method="householder"
    )
    q = np.asarray(left)
    np.testing.assert_allclose(q.conj().T @ q, np.eye(chi), atol=1e-8)
    out = q @ np.asarray(right)
    exact = _exact_recon_err(m, chi)
    # Two approximation sources, both by design of the CLASSIC power
    # scheme this path keeps: (a) subspace convergence goes as
    # (sigma_{chi+1}/sigma_chi)^(2*iters+1) — slow spectra keep an O(few %)
    # overhead over exact truncation (measured 1.031x); (b) the powered
    # iterate loses directions below ~eps_f64^(1/(2*iters+1)) ~ 5e-6
    # relative (fast spectra measure a 3e-7 recon floor).  The production
    # TPU path (newton) switched to half-step alternation for exactly this
    # reason — see ops/decomp.py and docs/tpu_numerics.md round-5.
    assert np.linalg.norm(out - m) <= 1.15 * exact + 1e-5 * np.linalg.norm(m)


@pytest.mark.parametrize("spectrum", sorted(SPECTRA))
@pytest.mark.parametrize("mode", ["discarded_weight", "relative", "hard_cutoff"])
def test_exact_split_contract(spectrum, mode):
    """Exact-SVD split: masked reconstruction error IS the discarded tail."""
    n, chi = 24, 24
    m = _matrix(n, spectrum, np.complex128, seed=hash((spectrum, mode)) % 2**31)
    thr = {"discarded_weight": 1e-4, "relative": 1e-3, "hard_cutoff": 1e-3}[mode]
    left, right, s_kept, keep = split_matrix_truncated(
        jnp.asarray(m), chi, mode=mode, threshold=thr
    )
    out = np.asarray(left) @ np.asarray(right)
    k = int(np.asarray(keep))
    _, s, _ = np.linalg.svd(np.asarray(m))
    np.testing.assert_allclose(
        np.linalg.norm(out - m), np.linalg.norm(s[k:]), atol=1e-10
    )
    # kept singular values match the SVD's leading block
    np.testing.assert_allclose(np.asarray(s_kept)[:k], s[:k], atol=1e-10)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_split_padding_hygiene(dtype):
    """chi > true rank: the extra columns/rows reconstruct nothing and the
    product is exact for both split families."""
    rng = np.random.default_rng(5)
    a = (rng.standard_normal((40, 3)) + 1j * rng.standard_normal((40, 3))).astype(dtype)
    b = (rng.standard_normal((3, 40)) + 1j * rng.standard_normal((3, 40))).astype(dtype)
    m = a @ b
    m = m / np.linalg.norm(m)
    # Newton-Schulz carries an iterative isometry floor (~1e-8 even in
    # float64); Householder/exact-SVD reach the dtype floor
    tol_ns = 1e-5 if dtype == np.complex64 else 1e-6
    tol_qr = 1e-5 if dtype == np.complex64 else 1e-10
    for method, tol in (("newton", tol_ns), ("householder", tol_qr)):
        left, right, _, _ = split_matrix_subspace(
            jnp.asarray(m), 16, iters=1, qr_method=method
        )
        out = np.asarray(left) @ np.asarray(right)
        assert np.isfinite(out).all()
        assert np.linalg.norm(out - m) < tol, method
    left, right, _, _ = split_matrix_truncated(
        jnp.asarray(m), 16, mode="relative", threshold=1e-10
    )
    out = np.asarray(left) @ np.asarray(right)
    assert np.linalg.norm(out - m) < tol_qr
