"""MPO compress + spectrum-edge battery.

Closes the remaining factory/compress invariants of the reference MPO suite
(/root/reference/tests/core/data_structures/test_mpo.py:738-1304) not yet
mirrored: compression exactness/capping, trivial-cut Schmidt spectra,
invalid-cut rejection, and heterogeneous-physical-dimension identity
fidelity.  Oracles are dense matricizations.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.core.mpo import MPO


def _rng_pauli_sum(length: int, seed: int) -> MPO:
    rng = np.random.default_rng(seed)
    terms = []
    labels = ["x", "y", "z"]
    for i in range(length):
        terms.append((float(rng.normal()), f"{labels[i % 3]}{i}"))
    for i in range(length - 1):
        terms.append((float(rng.normal()), f"z{i} z{i + 1}"))
    return MPO.from_pauli_sum(terms, length)


def test_compress_exact_preserves_matrix():
    m = _rng_pauli_sum(4, 0)
    dense = m.to_matrix()
    chi_before = m.bond_dimension
    m.compress(threshold=0.0)
    np.testing.assert_allclose(m.to_matrix(), dense, atol=1e-10)
    assert m.bond_dimension <= chi_before


def test_compress_trims_redundant_rank():
    # identity built with an inflated custom bond: compress must find Dw=1
    length, d = 4, 2
    eye = np.zeros((2, 2, d, d), dtype=complex)  # (Dl, Dr, o, i), transpose=True
    eye[0, 0] = np.eye(d)
    eye[1, 1] = 0.0  # dead channel
    boundary_l = eye[:1]
    boundary_r = eye[:, :1]
    tensors = [boundary_l] + [eye] * (length - 2) + [boundary_r]
    m = MPO.custom(tensors)
    assert m.bond_dimension >= 2
    m.compress(threshold=1e-12)
    assert m.bond_dimension == 1
    np.testing.assert_allclose(m.to_matrix(), np.eye(d**length), atol=1e-10)


def test_compress_cap_truncates_to_best_rank():
    # Ising MPO has operator Schmidt rank 3 across internal cuts; a cap of 2
    # must keep the two dominant channels and report the capped bond
    m = MPO.ising(5, J=1.0, g=0.7)
    dense = m.to_matrix()
    m.compress(max_bond_dim=2)
    assert m.bond_dimension <= 2
    # truncation error is bounded by the dropped singular values: compare the
    # best-rank-2 reconstruction error via the dense Frobenius norms
    err = np.linalg.norm(m.to_matrix() - dense)
    assert 0 < err < np.linalg.norm(dense)


def test_schmidt_spectrum_trivial_cut_returns_frobenius_norm():
    m = _rng_pauli_sum(3, 1)
    fro = np.linalg.norm(m.to_matrix())
    for cut in (0, m.length):
        s = m.compute_schmidt_spectrum(cut)
        assert s.shape == (1,)
        np.testing.assert_allclose(s[0], fro, rtol=1e-8)


def test_schmidt_spectrum_squares_sum_to_frobenius():
    m = _rng_pauli_sum(4, 2)
    fro2 = np.linalg.norm(m.to_matrix()) ** 2
    for cut in range(1, m.length):
        s = m.compute_schmidt_spectrum(cut)
        np.testing.assert_allclose(np.sum(s**2), fro2, rtol=1e-7)


@pytest.mark.parametrize("bad_cut", [-1, 7, 100])
def test_schmidt_spectrum_rejects_out_of_range_cut(bad_cut):
    m = MPO.identity(4)
    with pytest.raises(ValueError, match="out of range"):
        m.compute_schmidt_spectrum(bad_cut)


@pytest.mark.parametrize("bad_cut", [1.5, "1", None, True])
def test_schmidt_spectrum_rejects_non_int_cut(bad_cut):
    m = MPO.identity(4)
    with pytest.raises(TypeError, match="must be int"):
        m.compute_schmidt_spectrum(bad_cut)


def test_identity_fidelity_qutrit():
    # heterogeneous physical dimension (reference
    # test_compute_identity_fidelity_heterogeneous_physical_dimensions)
    m = MPO.identity(3, d=3)
    np.testing.assert_allclose(m.compute_identity_fidelity(), 1.0, atol=1e-10)
    assert m.check_if_identity(0.999)
    ent = m.compute_entanglement_entropy(1)
    np.testing.assert_allclose(ent, 0.0, atol=1e-10)


def test_entropy_base_two_halves_nats():
    m = _rng_pauli_sum(3, 3)
    e_nat = m.compute_entanglement_entropy(1)
    e_bit = m.compute_entanglement_entropy(1, base=2.0)
    np.testing.assert_allclose(e_bit, e_nat / np.log(2), rtol=1e-10)


def test_rotate_involution_and_dense_transpose():
    m = _rng_pauli_sum(3, 4)
    dense = m.to_matrix()
    r = m.rotate()
    np.testing.assert_allclose(r.to_matrix(), dense.conj().T, atol=1e-10)
    rr = r.rotate()
    np.testing.assert_allclose(rr.to_matrix(), dense, atol=1e-10)


def test_from_matrix_respects_chi_cap():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16))
    a = a + a.conj().T
    m_full = MPO.from_matrix(a, length=4)
    np.testing.assert_allclose(m_full.to_matrix(), a, atol=1e-8)
    m_cap = MPO.from_matrix(a, length=4, chi=2)
    assert m_cap.bond_dimension <= 2
    # capped reconstruction differs (a is full-rank) but stays bounded
    assert np.linalg.norm(m_cap.to_matrix() - a) < np.linalg.norm(a)


def test_multiply_then_compress_matches_dense_product():
    a = MPO.ising(4, J=0.9, g=0.4)
    b = _rng_pauli_sum(4, 6)
    prod = a.multiply(b)
    dense = a.to_matrix() @ b.to_matrix()
    np.testing.assert_allclose(prod.to_matrix(), dense, atol=1e-8)
    prod.compress(threshold=1e-12)
    np.testing.assert_allclose(prod.to_matrix(), dense, atol=1e-8)
    assert prod.bond_dimension <= a.bond_dimension * b.bond_dimension
