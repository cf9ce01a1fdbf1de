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


def test_mps_mixed_expectation():
    # <bra|X_1|ket> must match the dense matrix element (reference
    # MPS.mixed_expectation, mps.py:1157-1172)
    from yaqs_tpu.core.mps_ops import named_product_state

    rng = np.random.default_rng(5)
    ket = MPS(tensors=named_product_state("random", 3, 4, rng=rng))
    bra = MPS(tensors=named_product_state("random", 3, 4, rng=rng))
    val = ket.mixed_expectation(bra, pauli_x, 1)
    vb, vk = bra.to_vec(), ket.to_vec()
    op = np.kron(np.eye(2), np.kron(pauli_x, np.eye(2)))  # site 0 = LSB
    np.testing.assert_allclose(val, np.vdot(vb, op @ vk), atol=1e-10)


def test_mpo_custom_and_finite_state_machine():
    # Ising FSM tensors in the reference's (wl, wr, s, s') convention must
    # reproduce the library Ising MPO (reference MPO.finite_state_machine,
    # mpo.py:1104-1129)
    J, g = 1.0, 0.7
    ident, z, x = np.eye(2), PAULI["Z"], PAULI["X"]
    inner = np.zeros((3, 3, 2, 2), dtype=complex)
    inner[0, 0] = ident
    inner[0, 1] = -J * z
    inner[0, 2] = -g * x
    inner[1, 2] = z
    inner[2, 2] = ident
    left = inner[:1]  # (1, 3, 2, 2)
    right = inner[:, 2:]  # (3, 1, 2, 2)
    fsm = MPO.finite_state_machine(4, left, inner, right)
    np.testing.assert_allclose(fsm.to_matrix(), MPO.ising(4, J, g).to_matrix(), atol=1e-12)
    # custom with transpose=False accepts (s, s', wl, wr) directly
    ts = [np.transpose(left, (2, 3, 0, 1))] + [np.transpose(inner, (2, 3, 0, 1))] * 2 + [
        np.transpose(right, (2, 3, 0, 1))
    ]
    cus = MPO.custom(ts, transpose=False)
    np.testing.assert_allclose(cus.to_matrix(), fsm.to_matrix(), atol=1e-12)


def test_mpo_partial_trace_sites():
    # tracing sites of an Ising MPO must equal the dense partial trace
    # (reference MPO.partial_trace_sites, mpo.py:176-206)
    L = 4
    mpo = MPO.ising(L, 1.0, 0.5)
    dense = mpo.to_matrix()
    keep = [1, 2]
    red = mpo.partial_trace_sites(keep)
    assert red.length == 2
    # dense partial trace over sites 0 and 3 (site 0 least significant)
    t = dense.reshape([2] * L + [2] * L)  # (o3, o2, o1, o0, i3, i2, i1, i0)
    red_dense = np.einsum("aijbaklb->ijkl", t).reshape(4, 4)
    np.testing.assert_allclose(red.to_matrix(), red_dense, atol=1e-12)
    # single-site bond matrix: tracing everything gives the full trace
    full = mpo.partial_trace_sites([0])
    np.testing.assert_allclose(np.trace(full.to_matrix()), np.trace(dense), atol=1e-10)


def test_mps_apply_local_two_site():
    # adjacent, distant (SWAP-routed), reversed, and periodic-wrap gates must
    # match dense application (reference MPS.apply_local, mps.py:1045-1155)
    from yaqs_tpu.core.mps_ops import named_product_state

    rng = np.random.default_rng(2)
    L = 4
    CX = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)

    def dense_two_site(v, op4, i, j):
        psi = v.reshape([2] * L)
        ax_i, ax_j = L - 1 - i, L - 1 - j
        t = op4.reshape(2, 2, 2, 2)
        psi = np.tensordot(t, psi, axes=([2, 3], [ax_i, ax_j]))
        return np.moveaxis(psi, [0, 1], [ax_i, ax_j]).reshape(-1)

    for (i, j) in [(1, 2), (0, 3), (2, 0), (3, 0)]:
        m = MPS(tensors=named_product_state("random", L, 4, rng=rng))
        v0 = m.to_vec()
        got = m.apply_local(CX, (i, j)).to_vec()
        np.testing.assert_allclose(got, dense_two_site(v0, CX, i, j), atol=1e-10)


def test_mps_measure_in_place():
    # |+> measured in Z collapses to 0/1 with equal probability; measuring in
    # X always yields 0 (the +1 eigenstate) and leaves the state intact
    rng = np.random.default_rng(7)
    outcomes = set()
    for _ in range(12):
        m = MPS(3, state="x+", chi=4)
        outcomes.add(m.measure(1, "Z", rng=rng))
    assert outcomes == {0, 1}
    m = MPS(3, state="x+", chi=4)
    assert m.measure(1, "X", rng=rng) == 0
    np.testing.assert_allclose(abs(m.to_vec()[0]) ** 2, 1 / 8, atol=1e-10)


def test_mps_measure_y_basis():
    # a |+y> eigenstate measured in Y must deterministically yield 0 and the
    # post-measurement state must stay |+y| on that site (the round-1 bug
    # inverted the frame so Y measured X instead)
    rng = np.random.default_rng(11)
    plus_y = np.array([1.0, 1.0j], dtype=np.complex128) / np.sqrt(2)
    minus_y = np.array([1.0, -1.0j], dtype=np.complex128) / np.sqrt(2)
    prep_plus = np.column_stack([plus_y, minus_y])  # unitary, |0> -> |+y>
    for _ in range(6):
        m = MPS(3, state="zeros", chi=4)
        m.apply_local(prep_plus, 1)
        assert m.measure(1, "Y", rng=rng) == 0
        # reduced state on site 1 is still |+y>: <Y> = +1
        y = np.array([[0, -1j], [1j, 0]])
        np.testing.assert_allclose(m.expect(y, 1), 1.0, atol=1e-10)
    # |-y> must deterministically yield 1
    m = MPS(3, state="zeros", chi=4)
    u = np.column_stack([minus_y, plus_y])  # unitary sending |0> -> |-y>
    m.apply_local(u, 1)
    assert m.measure(1, "Y", rng=rng) == 1
