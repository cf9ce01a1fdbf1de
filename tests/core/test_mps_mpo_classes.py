"""User-facing MPS/MPO class API tests."""

from __future__ import annotations

import numpy as np

from yaqs_tpu.core.mpo import MPO
from yaqs_tpu.core.mps import MPS
from yaqs_tpu.models.operators import PAULI, pauli_x, pauli_z


def test_mps_presets_and_norm():
    psi = MPS(4, state="Neel", chi=4)
    assert psi.norm() == 1.0
    assert psi.expect(pauli_z, 0) == 1.0
    assert psi.expect(pauli_z, 1) == -1.0


def test_mps_measure_shots_and_pvm():
    psi = MPS(3, state="zeros", chi=4)
    counts = psi.measure_shots(50, seed=1)
    assert counts == {0: 50}
    assert np.isclose(psi.project_onto_bitstring("000"), 1.0)
    assert np.isclose(psi.project_onto_bitstring("100"), 0.0)


def test_mps_apply_local_and_entropy():
    psi = MPS(2, state="zeros", chi=4)
    # Build a Bell state: H on 0, CX via MPO multiply
    h = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    psi.apply_local(h, 0)
    cx = MPO.from_gate(
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex),
        [0, 1],
        2,
    )
    bell = cx.multiply(psi)
    bell.normalize()
    np.testing.assert_allclose(bell.get_entropy(0), np.log(2), atol=1e-10)


def test_mps_scalar_product_and_copy():
    a = MPS(3, state="x+", chi=4)
    b = a.copy()
    np.testing.assert_allclose(a.scalar_product(b), 1.0, atol=1e-12)
    b.apply_local(pauli_z, 0)
    np.testing.assert_allclose(a.scalar_product(b), 0.0, atol=1e-12)


def test_mpo_multiply_mps_matches_dense():
    L = 4
    w = MPO.ising(L, 1.0, 0.6)
    psi = MPS(L, state="x+", chi=8)
    h_psi = w.multiply(psi, chi_out=8)
    expected = w.to_matrix() @ psi.to_vec()
    np.testing.assert_allclose(h_psi.to_vec(), expected, atol=1e-10)


def test_mpo_compose_and_rotate():
    L = 3
    a = MPO.ising(L, 1.0, 0.4)
    b = MPO.heisenberg(L, 0.2, 0.3, 0.5)
    ab = a.multiply(b)
    np.testing.assert_allclose(ab.to_matrix(), a.to_matrix() @ b.to_matrix(), atol=1e-10)
    adj = a.rotate()
    np.testing.assert_allclose(adj.to_matrix(), a.to_matrix().conj().T, atol=1e-12)


def test_mpo_add():
    L = 3
    a = MPO.ising(L, 1.0, 0.4)
    b = MPO.identity(L)
    s = a + b
    np.testing.assert_allclose(s.to_matrix(), a.to_matrix() + np.eye(8), atol=1e-12)


def test_mpo_from_matrix_roundtrip():
    rng = np.random.default_rng(0)
    L = 3
    m = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    w = MPO.from_matrix(m, L)
    np.testing.assert_allclose(w.to_matrix(), m, atol=1e-10)


def test_mpo_identity_fidelity():
    ident = MPO.identity(4)
    np.testing.assert_allclose(ident.compute_identity_fidelity(), 1.0, atol=1e-10)
    x0 = MPO.from_terms([(1.0, [(0, "X")])], 4)
    assert x0.compute_identity_fidelity() < 1e-10


def test_mpo_compress_preserves_operator():
    L = 3
    a = MPO.ising(L, 1.0, 0.4)
    dense = a.to_matrix()
    padded = a.pad(8)
    padded.compress(threshold=1e-12)
    np.testing.assert_allclose(padded.to_matrix(), dense, atol=1e-9)


def test_mpo_operator_entanglement():
    # identity has zero operator entanglement at every cut
    ident = MPO.identity(4)
    assert ident.operator_entanglement_entropy(1) < 1e-10
    # CX across the cut has log(2) operator entanglement... (2 Schmidt terms)
    cx = MPO.from_gate(
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex),
        [1, 2],
        4,
    )
    spec = cx.operator_schmidt_spectrum(1)
    assert np.sum(np.asarray(spec) > 1e-10) == 2
