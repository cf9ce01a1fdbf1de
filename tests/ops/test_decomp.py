"""QR/SVD decomposition invariants on padded site tensors."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from yaqs_tpu.ops.decomp import (
    left_qr,
    merge_two_site,
    right_qr,
    split_two_site_truncated,
)


def rand_tensor(shape, rng):
    return rng.normal(size=shape) + 1j * rng.normal(size=shape)


def test_right_qr_reconstruction_and_isometry(seed):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rand_tensor((2, 8, 8), rng))
    q, r = right_qr(a)
    recon = jnp.einsum("dlm,mr->dlr", q, r)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(a), atol=1e-12)
    qm = np.asarray(q).reshape(16, -1)
    np.testing.assert_allclose(qm.conj().T @ qm, np.eye(qm.shape[1]), atol=1e-12)


def test_left_qr_reconstruction_and_isometry(seed):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rand_tensor((2, 8, 8), rng))
    q, lmat = left_qr(a)
    recon = jnp.einsum("lm,dmr->dlr", lmat, q)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(a), atol=1e-12)
    qm = np.asarray(q).transpose(1, 0, 2).reshape(q.shape[1], -1)
    np.testing.assert_allclose(qm @ qm.conj().T, np.eye(qm.shape[0]), atol=1e-12)


def test_merge_split_roundtrip_no_truncation(seed):
    rng = np.random.default_rng(seed)
    chi = 8
    a = jnp.asarray(rand_tensor((2, chi, chi), rng))
    b = jnp.asarray(rand_tensor((2, chi, chi), rng))
    theta = merge_two_site(a, b)
    # chi_out = 2*chi covers the full rank -> exact reconstruction
    a2, b2, s, keep = split_two_site_truncated(
        theta, 2 * chi, mode="hard_cutoff", threshold=0.0, svd_distribution="right"
    )
    recon = merge_two_site(a2, b2)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(theta), atol=1e-11)


def test_split_truncation_masks_small_singular_values(seed):
    rng = np.random.default_rng(seed)
    chi = 6
    # Rank-2 theta: product of two rank-1 updates
    u = rand_tensor((2 * chi,), rng)
    v = rand_tensor((2 * chi,), rng)
    u2 = rand_tensor((2 * chi,), rng)
    v2 = rand_tensor((2 * chi,), rng)
    m = np.outer(u, v) + 0.5 * np.outer(u2, v2)
    theta = jnp.asarray(m.reshape(2, chi, 2, chi).transpose(0, 2, 1, 3))
    a2, b2, s, keep = split_two_site_truncated(
        theta, chi, mode="relative", threshold=1e-10, svd_distribution="right"
    )
    assert int(keep) == 2
    assert np.count_nonzero(np.asarray(s)) == 2
    recon = merge_two_site(a2, b2)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(theta), atol=1e-11)


def test_split_distributions_agree(seed):
    rng = np.random.default_rng(seed)
    chi = 5
    theta = jnp.asarray(rand_tensor((2, 2, chi, chi), rng))
    outs = {}
    for dist in ("left", "right", "sqrt"):
        a, b, _, _ = split_two_site_truncated(
            theta, chi, mode="hard_cutoff", threshold=0.0, svd_distribution=dist
        )
        outs[dist] = merge_two_site(a, b)
    # chi < 2*chi so this is a genuine truncation; all distributions must give
    # the same reconstructed block.
    np.testing.assert_allclose(np.asarray(outs["left"]), np.asarray(outs["right"]), atol=1e-11)
    np.testing.assert_allclose(np.asarray(outs["sqrt"]), np.asarray(outs["right"]), atol=1e-11)
