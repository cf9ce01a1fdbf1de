"""Decomposition + truncation oracles vs numpy/scipy ground truth.

Reference parity: mqt-yaqs tests/core/methods/test_decompositions.py and the
svd_utils truncation tests — every property here is checked against an
independent dense oracle (numpy SVD / scipy polar / a literal numpy
re-statement of the reference keep-count rules), never against the code
under test.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.linalg

from yaqs_tpu.ops.decomp import (
    merge_two_site,
    newton_schulz_orthogonalize,
    split_matrix_subspace,
    split_matrix_truncated,
    split_two_site_subspace,
    split_two_site_truncated,
)
from yaqs_tpu.ops.truncation import TRUNC_MODES, keep_count, keep_mask


def crandn(shape, rng):
    return rng.normal(size=shape) + 1j * rng.normal(size=shape)


def rank_deficient(rows, cols, rank, rng, decay=0.5):
    """Matrix with exactly `rank` nonzero singular values, geometric decay."""
    u, _ = np.linalg.qr(crandn((rows, rank), rng))
    v, _ = np.linalg.qr(crandn((cols, rank), rng))
    s = decay ** np.arange(rank)
    return (u * s) @ v.conj().T, s


# -- keep_count / keep_mask vs a literal numpy restatement -------------------


def ref_keep_count(s, mode, threshold, max_bond_dim=None, min_keep=1):
    """Reference svd_utils truncation semantics, re-stated in plain numpy."""
    s = np.asarray(s, dtype=float)
    n = s.size
    if mode == "hard_cutoff":
        keep = int((s > threshold).sum())
    elif mode == "relative":
        keep = 0 if s[0] <= 0 else int((s >= threshold * s[0]).sum())
    else:  # discarded_weight: discard the tail while its squared weight < thr
        keep = n
        total = float((s**2).sum())
        if total < threshold:
            keep = n
        else:
            for k in range(n):
                tail = float((s[k:] ** 2).sum())
                if tail < threshold:
                    keep = k
                    break
    if max_bond_dim is not None:
        keep = min(keep, max_bond_dim)
    return min(max(keep, min_keep), n)


@pytest.mark.parametrize("mode", TRUNC_MODES)
@pytest.mark.parametrize(
    "spectrum",
    [
        [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125],
        [1.0, 1.0, 1.0, 1e-9, 1e-12, 0.0],
        [1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [1e-3] * 6,
    ],
)
@pytest.mark.parametrize("threshold", [0.0, 1e-10, 1e-4, 0.3, 2.0])
def test_keep_count_matches_reference_rule(mode, spectrum, threshold):
    s = np.asarray(spectrum)
    got = int(keep_count(s, mode=mode, threshold=threshold))
    want = ref_keep_count(s, mode, threshold)
    assert got == want, (mode, spectrum, threshold)


def test_keep_count_max_bond_and_min_keep():
    s = np.asarray([1.0, 0.9, 0.8, 0.7])
    assert int(keep_count(s, mode="hard_cutoff", threshold=0.0, max_bond_dim=2)) == 2
    assert int(keep_count(s, mode="hard_cutoff", threshold=5.0, min_keep=3)) == 3
    with pytest.raises(ValueError, match="max_bond_dim"):
        keep_count(s, mode="hard_cutoff", threshold=0.0, max_bond_dim=1, min_keep=2)
    with pytest.raises(ValueError, match="truncation mode"):
        keep_count(s, mode="bogus", threshold=0.0)


def test_keep_count_batched_rows_independent():
    s = np.asarray([[1.0, 0.5, 1e-8], [1.0, 1e-8, 1e-9]])
    got = np.asarray(keep_count(s, mode="relative", threshold=1e-3))
    assert got.tolist() == [
        ref_keep_count(s[0], "relative", 1e-3),
        ref_keep_count(s[1], "relative", 1e-3),
    ]


def test_keep_mask_is_prefix_mask():
    s = np.asarray([1.0, 0.6, 0.3, 1e-9, 0.0])
    mask, keep = keep_mask(s, mode="hard_cutoff", threshold=1e-6)
    k = int(keep)
    np.testing.assert_array_equal(
        np.asarray(mask), np.asarray([1.0] * k + [0.0] * (5 - k))
    )
    assert k == ref_keep_count(s, "hard_cutoff", 1e-6)


# -- split_matrix_truncated vs Eckart-Young ----------------------------------


@pytest.mark.parametrize("distribution", ["left", "right", "sqrt"])
def test_split_matrix_reconstructs_best_rank_k(distribution, seed):
    rng = np.random.default_rng(seed)
    m = crandn((12, 10), rng)
    chi = 6
    left, right, s_kept, keep = split_matrix_truncated(
        m, chi, mode="hard_cutoff", threshold=0.0, max_bond_dim=4,
        svd_distribution=distribution,
    )
    recon = np.asarray(left) @ np.asarray(right)
    # Eckart-Young oracle: numpy truncated SVD at the same rank
    u, s, vh = np.linalg.svd(m)
    best = (u[:, :4] * s[:4]) @ vh[:4]
    np.testing.assert_allclose(recon, best, atol=1e-10)
    assert int(keep) == 4
    np.testing.assert_allclose(np.asarray(s_kept)[:4], s[:4], atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_kept)[4:], 0.0, atol=1e-12)


def test_split_matrix_pads_when_rank_below_chi(seed):
    rng = np.random.default_rng(seed)
    m = crandn((3, 3), rng)  # only 3 singular values, chi = 8
    left, right, s_kept, keep = split_matrix_truncated(
        m, 8, mode="hard_cutoff", threshold=0.0
    )
    assert np.asarray(left).shape == (3, 8)
    assert np.asarray(right).shape == (8, 3)
    np.testing.assert_allclose(np.asarray(left) @ np.asarray(right), m, atol=1e-10)
    assert int(keep) == 3


def test_split_matrix_isometry_sides(seed):
    rng = np.random.default_rng(seed)
    m = crandn((8, 8), rng)
    left, right, _, keep = split_matrix_truncated(
        m, 8, mode="hard_cutoff", threshold=0.0, svd_distribution="right"
    )
    k = int(keep)
    lm = np.asarray(left)[:, :k]
    np.testing.assert_allclose(lm.conj().T @ lm, np.eye(k), atol=1e-10)
    left, right, _, _ = split_matrix_truncated(
        m, 8, mode="hard_cutoff", threshold=0.0, svd_distribution="left"
    )
    rm = np.asarray(right)[:k]
    np.testing.assert_allclose(rm @ rm.conj().T, np.eye(k), atol=1e-10)


def test_split_matrix_unknown_distribution_rejected(seed):
    rng = np.random.default_rng(seed)
    with pytest.raises(ValueError, match="svd_distribution"):
        split_matrix_truncated(
            crandn((4, 4), rng), 4, mode="hard_cutoff", threshold=0.0,
            svd_distribution="middle",
        )


# -- two-site merge/split round trips ----------------------------------------


def test_merge_split_roundtrip_full_rank(seed):
    rng = np.random.default_rng(seed)
    a = crandn((2, 4, 6), rng)
    b = crandn((2, 6, 4), rng)
    theta = merge_two_site(a, b)
    assert np.asarray(theta).shape == (2, 2, 4, 4)
    # dense oracle for the contraction
    dense = np.einsum("alm,bmr->ablr", a, b)
    np.testing.assert_allclose(np.asarray(theta), dense, atol=1e-12)
    a2, b2, s, keep = split_two_site_truncated(
        theta, 8, mode="hard_cutoff", threshold=0.0
    )
    recon = np.einsum("alm,bmr->ablr", np.asarray(a2), np.asarray(b2))
    np.testing.assert_allclose(recon, dense, atol=1e-10)


def test_split_two_site_truncation_error_is_tail_weight(seed):
    rng = np.random.default_rng(seed)
    theta = crandn((2, 2, 6, 6), rng)
    m = np.transpose(theta, (0, 2, 1, 3)).reshape(12, 12)
    s_all = np.linalg.svd(m, compute_uv=False)
    a, b, _, keep = split_two_site_truncated(
        theta, 12, mode="hard_cutoff", threshold=0.0, max_bond_dim=5
    )
    recon = np.einsum("alm,bmr->ablr", np.asarray(a), np.asarray(b))
    err = np.linalg.norm((recon - theta).ravel())
    np.testing.assert_allclose(err, np.sqrt((s_all[5:] ** 2).sum()), rtol=1e-8)


# -- subspace-iteration splits vs exact SVD ----------------------------------


@pytest.mark.parametrize(
    ("qr_method", "atol"),
    [
        ("householder", 1e-6),
        # newton = Newton-Schulz polar: weak singular directions are only
        # partially orthonormalized by contract (decomp.py docstring);
        # measured reconstruction floor ~3e-3 on unit-norm inputs (the
        # end-to-end state error this induces is ~2e-4, docs/tpu_numerics.md)
        ("newton", 5e-3),
    ],
)
def test_subspace_split_matches_exact_on_gapped_spectrum(qr_method, atol, seed):
    rng = np.random.default_rng(seed)
    m, _ = rank_deficient(16, 16, 4, rng, decay=0.3)  # strongly gapped
    chi = 8
    left, right, _, _ = split_matrix_subspace(
        m, chi, iters=2, qr_method=qr_method
    )
    recon = np.asarray(left) @ np.asarray(right)
    # rank <= chi covers the true rank-4 matrix: reconstruction ~exact
    np.testing.assert_allclose(recon, m, atol=atol)


@pytest.mark.parametrize("qr_method", ["householder", "newton"])
def test_subspace_split_near_optimal_truncation(qr_method, seed):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(crandn((20, 20), rng))
    v, _ = np.linalg.qr(crandn((20, 20), rng))
    s = 0.5 ** np.arange(20)
    m = (u * s) @ v.conj().T
    chi = 6
    left, right, _, _ = split_matrix_subspace(m, chi, iters=3, qr_method=qr_method)
    err = np.linalg.norm(np.asarray(left) @ np.asarray(right) - m)
    opt = np.sqrt((s[chi:] ** 2).sum())  # Eckart-Young floor
    assert err <= 1.5 * opt + 1e-12, (err, opt)


def test_two_site_subspace_agrees_with_truncated(seed):
    rng = np.random.default_rng(seed)
    a = crandn((2, 4, 5), rng)
    b = crandn((2, 5, 4), rng)
    theta = merge_two_site(a, b)  # exact bond rank <= 5 < chi=6
    a1, b1, _, _ = split_two_site_subspace(theta, 6, iters=2)
    a2, b2, _, _ = split_two_site_truncated(
        theta, 6, mode="hard_cutoff", threshold=0.0
    )
    r1 = np.einsum("alm,bmr->ablr", np.asarray(a1), np.asarray(b1))
    r2 = np.einsum("alm,bmr->ablr", np.asarray(a2), np.asarray(b2))
    np.testing.assert_allclose(r1, r2, atol=1e-8)


# -- Newton-Schulz polar orthogonalization vs scipy --------------------------


def test_newton_schulz_matches_scipy_polar(seed):
    rng = np.random.default_rng(seed)
    y = crandn((10, 6), rng)
    q = np.asarray(newton_schulz_orthogonalize(y))
    u, _ = scipy.linalg.polar(y)
    np.testing.assert_allclose(q.conj().T @ q, np.eye(6), atol=1e-6)
    np.testing.assert_allclose(q, u, atol=1e-6)


def test_newton_schulz_ill_conditioned(seed):
    """kappa = 100: all directions above the iteration's ~1e-2 convergence
    knee (weaker directions are partial isometries by contract)."""
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(crandn((8, 8), rng))
    v, _ = np.linalg.qr(crandn((8, 8), rng))
    s = np.asarray([1.0, 1.0, 0.5, 0.2, 0.1, 5e-2, 2e-2, 1e-2])
    y = (u * s) @ v.conj().T
    q = np.asarray(newton_schulz_orthogonalize(y))
    np.testing.assert_allclose(q.conj().T @ q, np.eye(8), atol=1e-5)


def test_newton_schulz_identity_fixed_point():
    q = np.asarray(newton_schulz_orthogonalize(np.eye(5, dtype=complex)))
    np.testing.assert_allclose(q, np.eye(5), atol=1e-10)
