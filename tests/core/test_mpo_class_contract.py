"""MPO class contract tests vs dense oracles.

Port of the reference's MPO behavior suite
(/root/reference/tests/core/data_structures/test_mpo.py) onto the padded
fixed-shape layout: every check asserts against an independently computed
dense operator (np.kron chains / dense SVD), never against the MPO code
under test.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.core.mpo import MPO
from yaqs_tpu.core.mps import MPS
from yaqs_tpu.models.operators import PAULI

CX = np.array(
    [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex
)
TOFFOLI = np.eye(8, dtype=complex)
TOFFOLI[6:, 6:] = np.array([[0, 1], [1, 0]])


def dense_embed(ops: dict[int, np.ndarray], length: int, d: int = 2) -> np.ndarray:
    """Site 0 least significant."""
    m = np.eye(1, dtype=complex)
    for i in range(length):
        m = np.kron(ops.get(i, np.eye(d)), m)
    return m


def dense_gate(matrix: np.ndarray, sites: list[int], length: int) -> np.ndarray:
    """Dense embedding of a k-site gate; first listed site most significant."""
    k = len(sites)
    t = matrix.reshape([2] * (2 * k))
    full = np.eye(2**length, dtype=complex).reshape([2] * (2 * length))
    # axes: output block then input block, site 0 = last axis of each block
    out_axes = [length - 1 - s for s in sites]
    in_axes = [2 * length - 1 - s for s in sites]
    full = np.tensordot(
        t, full, axes=(list(range(k, 2 * k)), out_axes)
    )  # contract gate inputs with identity outputs
    # result axes: gate outputs (k), then remaining identity axes
    rest = [ax for ax in range(2 * length) if ax not in out_axes]
    order = np.argsort(out_axes + rest)
    full = np.transpose(full, order)
    return full.reshape(2**length, 2**length)


# -- addition ----------------------------------------------------------------


def test_add_single_site_length_one():
    a = MPO.from_terms([(1.0, [(0, "X")])], 1)
    b = MPO.from_terms([(0.5, [(0, "Z")])], 1)
    np.testing.assert_allclose(
        (a + b).to_matrix(), PAULI["X"] + 0.5 * PAULI["Z"], atol=1e-14
    )


def test_add_bond_stacking_matches_dense_sum():
    L = 3
    a = MPO.ising(L, 1.0, 0.4)
    b = MPO.from_terms([(0.7, [(0, "X"), (2, "X")])], L)
    s = a + b
    np.testing.assert_allclose(s.to_matrix(), a.to_matrix() + b.to_matrix(), atol=1e-12)
    assert s.bond_dimension == a.bond_dimension + b.bond_dimension


def test_sum_matches_iterated_addition():
    L = 3
    parts = [
        MPO.from_terms([(c, [(i, p)])], L)
        for c, i, p in [(0.3, 0, "X"), (0.5, 1, "Y"), (0.9, 2, "Z")]
    ]
    total = parts[0] + parts[1] + parts[2]
    dense = sum(p.to_matrix() for p in parts)
    np.testing.assert_allclose(total.to_matrix(), dense, atol=1e-12)


def test_add_shape_mismatch_raises():
    with pytest.raises(ValueError, match="matching length"):
        MPO.identity(3) + MPO.identity(4)


# -- from_gate ----------------------------------------------------------------


def test_from_gate_three_qubit_matches_dense():
    w = MPO.from_gate(TOFFOLI, [1, 2, 3], 5)
    np.testing.assert_allclose(
        w.to_matrix(), dense_gate(TOFFOLI, [1, 2, 3], 5), atol=1e-10
    )


def test_from_gate_gapped_sites_matches_dense():
    w = MPO.from_gate(CX, [0, 3], 4)
    np.testing.assert_allclose(w.to_matrix(), dense_gate(CX, [0, 3], 4), atol=1e-10)


def test_from_gate_non_ascending_raises():
    with pytest.raises(ValueError, match="ascending"):
        MPO.from_gate(CX, [2, 1], 4)


def test_from_gate_three_qubit_gapped():
    w = MPO.from_gate(TOFFOLI, [0, 2, 4], 5)
    np.testing.assert_allclose(
        w.to_matrix(), dense_gate(TOFFOLI, [0, 2, 4], 5), atol=1e-10
    )


# -- multiply -----------------------------------------------------------------


def test_multiply_mps_with_compression_low_entanglement():
    # product state through a diagonal MPO stays chi=1-representable, so a
    # tight chi_out must not lose anything
    L = 4
    w = MPO.from_terms([(1.0, [(i, "Z")]) for i in range(L)], L)
    psi = MPS(L, state="x+", chi=4)
    out = w.multiply(psi, chi_out=4)
    np.testing.assert_allclose(
        out.to_vec(), w.to_matrix() @ psi.to_vec(), atol=1e-10
    )


def test_multiply_mps_length_mismatch_raises():
    with pytest.raises(ValueError, match="length"):
        MPO.identity(4).multiply(MPS(3, state="zeros", chi=2))


def test_multiply_invalid_target_raises():
    with pytest.raises(TypeError):
        MPO.identity(3).multiply(np.eye(8))


def test_multiply_mpo_embedded_start_site():
    big = MPO.ising(5, 1.0, 0.5)
    cx = MPO.from_gate(CX, [0, 1], 2)
    out = big.multiply(cx, start_site=2)
    expect = big.to_matrix() @ dense_gate(CX, [2, 3], 5)
    np.testing.assert_allclose(out.to_matrix(), expect, atol=1e-10)


def test_multiply_mpo_invalid_embed_raises():
    cx = MPO.from_gate(CX, [0, 1], 2)
    with pytest.raises(ValueError, match="start_site"):
        MPO.identity(4).multiply(cx, start_site=3)


def test_multiply_mpo_with_compression_threshold():
    a = MPO.ising(3, 1.0, 0.4)
    b = MPO.heisenberg(3, 0.2, 0.3, 0.5)
    ab = a.multiply(b, threshold=1e-12)
    np.testing.assert_allclose(ab.to_matrix(), a.to_matrix() @ b.to_matrix(), atol=1e-9)


# -- analysis -----------------------------------------------------------------


def test_schmidt_spectrum_matches_dense_reference():
    L = 3
    w = MPO.ising(L, 1.0, 0.7)
    dense = w.to_matrix()
    # dense operator-Schmidt across bond 0: group (out0,in0 | rest)
    t = dense.reshape([2] * L + [2] * L)
    # axes: (o2,o1,o0,i2,i1,i0) -> (o0,i0 | o2,o1,i2,i1)
    m = np.transpose(t, (2, 5, 0, 1, 3, 4)).reshape(4, 16)
    sv = np.linalg.svd(m, compute_uv=False)
    sv = sv / np.linalg.norm(sv)
    got = np.asarray(w.operator_schmidt_spectrum(0))
    got = np.sort(got[got > 1e-12])[::-1]
    sv = np.sort(sv[sv > 1e-12])[::-1]
    np.testing.assert_allclose(got[: len(sv)], sv, atol=1e-8)


def test_entropy_invalid_bond_raises():
    w = MPO.identity(3)
    for bad in (-1, 2, 7):
        with pytest.raises(ValueError, match="bond"):
            w.operator_entanglement_entropy(bad)
        with pytest.raises(ValueError, match="bond"):
            w.operator_schmidt_spectrum(bad)


def test_identity_entropy_zero_and_fidelity_one():
    ident = MPO.identity(5)
    assert ident.compute_identity_fidelity() == pytest.approx(1.0, abs=1e-10)
    for b in range(4):
        assert ident.operator_entanglement_entropy(b) < 1e-10


def test_entropy_nonnegative_finite():
    w = MPO.heisenberg(4, 0.3, 0.5, 0.9, h=0.2)
    for b in range(3):
        e = w.operator_entanglement_entropy(b)
        assert np.isfinite(e)
        assert e >= -1e-12


def test_to_mps_norm_is_frobenius():
    w = MPO.ising(3, 1.0, 0.4)
    doubled = w.to_mps()
    fro = np.linalg.norm(w.to_matrix())
    # MPS.norm is the squared norm <psi|psi> (reference semantics)
    np.testing.assert_allclose(doubled.norm(), fro**2, rtol=1e-10)


# -- from_pauli_sum validation --------------------------------------------------


def test_from_pauli_sum_commas_and_case():
    w = MPO.from_pauli_sum([(0.5, "x0, z2")], 3)
    expect = 0.5 * dense_embed({0: PAULI["X"], 2: PAULI["Z"]}, 3)
    np.testing.assert_allclose(w.to_matrix(), expect, atol=1e-12)


def test_from_pauli_sum_empty_terms_is_zero():
    w = MPO.from_pauli_sum([], 3)
    np.testing.assert_allclose(w.to_matrix(), np.zeros((8, 8)), atol=1e-14)


def test_from_pauli_sum_empty_spec_is_identity_term():
    w = MPO.from_pauli_sum([(2.0, "")], 3)
    np.testing.assert_allclose(w.to_matrix(), 2.0 * np.eye(8), atol=1e-12)


def test_from_pauli_sum_invalid_label_raises():
    with pytest.raises(ValueError, match="invalid local operator"):
        MPO.from_pauli_sum([(1.0, "Q0")], 2).to_matrix()


def test_from_pauli_sum_invalid_token_raises():
    with pytest.raises(ValueError, match="token"):
        MPO.from_pauli_sum([(1.0, "XZ")], 2)


def test_from_pauli_sum_site_out_of_bounds_raises():
    with pytest.raises(ValueError, match="out of range"):
        MPO.from_pauli_sum([(1.0, "X5")], 3)


def test_from_pauli_sum_duplicate_site_raises():
    with pytest.raises(ValueError, match="duplicate"):
        MPO.from_pauli_sum([(1.0, "X1 Z1")], 3)


def test_from_terms_nonpositive_length_raises():
    with pytest.raises(ValueError, match="positive"):
        MPO.from_terms([], 0)


# -- local operator application / partial trace --------------------------------


def test_apply_local_operator_left_and_right():
    rng = np.random.default_rng(3)
    w = MPO.heisenberg(3, 0.3, 0.5, 0.9)
    op = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    left = w.apply_local_operator(op, 1, side="left")
    right = w.apply_local_operator(op, 1, side="right")
    full_op = dense_embed({1: op}, 3)
    np.testing.assert_allclose(left.to_matrix(), full_op @ w.to_matrix(), atol=1e-10)
    np.testing.assert_allclose(right.to_matrix(), w.to_matrix() @ full_op, atol=1e-10)


def test_partial_trace_site_chain_gives_full_trace():
    w = MPO.ising(4, 1.0, 0.5)
    m = np.eye(w.bond_dimension, dtype=complex)
    for i in range(4):
        m = m @ w.partial_trace_site(i)
    np.testing.assert_allclose(m[0, 0], np.trace(w.to_matrix()), atol=1e-10)


# -- factories / misc -----------------------------------------------------------


def test_identity_tensors_independent():
    w = MPO.identity(4)
    w.tensors[0, 0, 0, 0, 0] = 99.0
    assert w.tensors[1, 0, 0, 0, 0] != 99.0


def test_fermi_hubbard_length_one():
    w = MPO.fermi_hubbard_1d(1, 0.7, 1.3)
    # single fermionic site: H = U n_up n_down (no hopping)
    dense = w.to_matrix()
    expect = np.zeros((4, 4), dtype=complex)
    expect[3, 3] = 1.3  # |up,down> doubly occupied
    np.testing.assert_allclose(dense, expect, atol=1e-12)


def test_custom_ragged_bonds_padded():
    # ragged per-site bond dims must pad to a uniform Dw without changing
    # the operator
    ident, z, x = np.eye(2), PAULI["Z"], PAULI["X"]
    left = np.zeros((1, 3, 2, 2), dtype=complex)
    left[0, 0], left[0, 1], left[0, 2] = ident, -z, -0.5 * x
    mid = np.zeros((3, 2, 2, 2), dtype=complex)
    mid[0, 1] = -0.5 * x
    mid[1, 1] = z
    mid[2, 1] = ident
    mid[0, 0] = ident
    right = np.zeros((2, 1, 2, 2), dtype=complex)
    right[0, 0] = -0.5 * x
    right[1, 0] = ident
    w = MPO.custom([left, mid, right])
    assert w.bond_dimension == 3
    dense = w.to_matrix()
    np.testing.assert_allclose(dense, dense.conj().T, atol=1e-12)


def test_custom_without_transpose_sets_physical_dimension():
    t = np.zeros((3, 3, 1, 1), dtype=complex)
    t[:, :, 0, 0] = np.diag([0.0, 1.0, 2.0])
    w = MPO.custom([t, t], transpose=False)
    assert w.physical_dimension == 3
    np.testing.assert_allclose(
        w.to_matrix(), np.kron(np.diag([0.0, 1, 2]), np.diag([0.0, 1, 2])), atol=1e-12
    )


def test_check_if_valid_mpo():
    assert MPO.identity(3).check_if_valid_mpo()
    assert not MPO().check_if_valid_mpo()


# -- trapped ion physics --------------------------------------------------------


def test_trapped_ion_position_observable_centers_on_trap():
    grid = np.linspace(-2.0, 2.0, 31)
    center = 0.5
    w = MPO.trapped_ion(grid, [1.0], omega=3.0, trap_center=center)
    h = w.to_matrix()
    evals, evecs = np.linalg.eigh(h)
    ground = evecs[:, 0]
    x_mean = float(np.real(np.vdot(ground, grid * ground)))
    assert abs(x_mean - center) < 0.05


def test_trapped_ion_coulomb_increases_separation():
    grid = np.linspace(-3.0, 3.0, 25)

    def separation(g: float) -> float:
        w = MPO.trapped_ion(
            grid, [1.0, 1.0], omega=1.0, coulomb_strength=g, softening_length=0.3
        )
        evals, evecs = np.linalg.eigh(w.to_matrix())
        rho = np.abs(evecs[:, 0].reshape(25, 25)) ** 2  # (x2, x1)
        x2, x1 = np.meshgrid(grid, grid, indexing="ij")
        return float(np.sum(rho * np.abs(x1 - x2)))

    assert separation(2.0) > separation(0.0) + 0.1


def test_trapped_ion_validation():
    grid = np.linspace(-1.0, 1.0, 5)
    with pytest.raises(ValueError, match="three points"):
        MPO.trapped_ion(np.array([0.0, 1.0]), [1.0], omega=1.0)
    with pytest.raises(ValueError, match="uniformly"):
        MPO.trapped_ion(np.array([0.0, 0.1, 0.5]), [1.0], omega=1.0)
    with pytest.raises(ValueError, match="one or two"):
        MPO.trapped_ion(grid, [1.0, 1.0, 1.0], omega=1.0)
    with pytest.raises(ValueError, match="single ion"):
        MPO.trapped_ion(grid, [1.0], omega=1.0, coulomb_strength=0.5)


def test_trapped_ion_coulomb_truncation_bond_cap():
    grid = np.linspace(-1.0, 1.0, 9)
    full = MPO.trapped_ion(
        grid, [1.0, 2.0], omega=1.0, coulomb_strength=0.5, softening_length=0.3
    )
    capped = MPO.trapped_ion(
        grid,
        [1.0, 2.0],
        omega=1.0,
        coulomb_strength=0.5,
        softening_length=0.3,
        max_bond_dim=3,
    )
    assert capped.bond_dimension <= 3 < full.bond_dimension
    # truncation approximates only the interaction: error bounded by dropped
    # singular weight, so the capped operator stays close
    diff = np.linalg.norm(capped.to_matrix() - full.to_matrix())
    assert diff < 0.25 * np.linalg.norm(full.to_matrix())
