"""Closed-form amplitude checks for every named gate and operator.

Parity target: the per-gate matrix tests of
/root/reference/tests/core/libraries/test_gate_library.py (test_gate_x ..
test_gate_cphase_reverse) — each gate pinned against an independently
hand-written matrix, amplitude by amplitude, rather than against expm or
block composition (those cross-checks live in test_gates.py).  Also covers
the operator library (create/destroy/number d-level arithmetic, noise-name
resolution) mirroring the reference's test_destroy_d_level_arithmetic and
gate-library observable metadata (entropy / schmidt_spectrum set_sites
flexibility, PVM placeholders) mirroring test_meta_entropy_sites_len_flexible.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.core.sim_params import Observable
from yaqs_tpu.models.gates import gate_matrix, permute_qubits, two_qubit_exchange
from yaqs_tpu.models.operators import (
    PAULI,
    create,
    destroy,
    is_pauli_matrix,
    noise_operator,
    number_op,
)

SQ2 = np.sqrt(2.0)


def _assert_gate(name: str, expected, params: tuple = ()) -> None:
    got = gate_matrix(name, params)
    expected = np.asarray(expected, dtype=complex)
    np.testing.assert_allclose(got, expected, atol=1e-14, err_msg=name)


# ---------------------------------------------------------------------------
# One-qubit gates, written out by hand
# ---------------------------------------------------------------------------


def test_gate_id_closed_form():
    _assert_gate("id", [[1, 0], [0, 1]])


def test_gate_x_closed_form():
    _assert_gate("x", [[0, 1], [1, 0]])


def test_gate_y_closed_form():
    _assert_gate("y", [[0, -1j], [1j, 0]])


def test_gate_z_closed_form():
    _assert_gate("z", [[1, 0], [0, -1]])


def test_gate_h_closed_form():
    _assert_gate("h", np.array([[1, 1], [1, -1]]) / SQ2)


def test_gate_s_and_sdg_closed_forms():
    _assert_gate("s", [[1, 0], [0, 1j]])
    _assert_gate("sdg", [[1, 0], [0, -1j]])


def test_gate_t_and_tdg_closed_forms():
    w = np.exp(1j * np.pi / 4)
    _assert_gate("t", [[1, 0], [0, w]])
    _assert_gate("tdg", [[1, 0], [0, np.conj(w)]])


def test_gate_sx_closed_form():
    # sqrt(X) with the qiskit convention: SX = (1/2) [[1+i, 1-i], [1-i, 1+i]]
    _assert_gate("sx", np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]]) / 2)
    _assert_gate("sxdg", np.array([[1 - 1j, 1 + 1j], [1 + 1j, 1 - 1j]]) / 2)


@pytest.mark.parametrize("theta", [0.0, 0.3, -2.7, np.pi])
def test_gate_rx_closed_form(theta):
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    _assert_gate("rx", [[c, -1j * s], [-1j * s, c]], (theta,))


@pytest.mark.parametrize("theta", [0.0, 0.3, -2.7, np.pi])
def test_gate_ry_closed_form(theta):
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    _assert_gate("ry", [[c, -s], [s, c]], (theta,))


@pytest.mark.parametrize("theta", [0.0, 0.3, -2.7, np.pi])
def test_gate_rz_closed_form(theta):
    e = np.exp(-1j * theta / 2)
    _assert_gate("rz", [[e, 0], [0, np.conj(e)]], (theta,))


@pytest.mark.parametrize("theta", [0.0, 0.9, -1.1])
def test_gate_phase_closed_form(theta):
    for alias in ("p", "u1", "phase"):
        _assert_gate(alias, [[1, 0], [0, np.exp(1j * theta)]], (theta,))


def test_gate_u2_closed_form():
    phi, lam = 0.4, -1.3
    expected = (
        np.array(
            [
                [1, -np.exp(1j * lam)],
                [np.exp(1j * phi), np.exp(1j * (phi + lam))],
            ]
        )
        / SQ2
    )
    _assert_gate("u2", expected, (phi, lam))


def test_gate_u_closed_form():
    theta, phi, lam = 1.1, 0.4, -0.9
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    expected = np.array(
        [
            [c, -np.exp(1j * lam) * s],
            [np.exp(1j * phi) * s, np.exp(1j * (phi + lam)) * c],
        ]
    )
    _assert_gate("u", expected, (theta, phi, lam))
    _assert_gate("u3", expected, (theta, phi, lam))


def test_u_gate_special_cases_reduce():
    # u(theta, -pi/2, pi/2) = rx(theta); u(theta, 0, 0) = ry(theta)
    theta = 0.77
    np.testing.assert_allclose(
        gate_matrix("u", (theta, -np.pi / 2, np.pi / 2)),
        gate_matrix("rx", (theta,)),
        atol=1e-14,
    )
    np.testing.assert_allclose(
        gate_matrix("u", (theta, 0.0, 0.0)), gate_matrix("ry", (theta,)), atol=1e-14
    )


# ---------------------------------------------------------------------------
# Two-qubit gates (first listed qubit = most significant)
# ---------------------------------------------------------------------------


def test_gate_cx_closed_form():
    expected = [
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, 0, 1],
        [0, 0, 1, 0],
    ]
    _assert_gate("cx", expected)
    _assert_gate("cnot", expected)


def test_gate_cy_closed_form():
    _assert_gate(
        "cy",
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, 0, -1j],
            [0, 0, 1j, 0],
        ],
    )


def test_gate_cz_closed_form():
    _assert_gate("cz", np.diag([1, 1, 1, -1]))


def test_gate_ch_closed_form():
    expected = np.eye(4, dtype=complex)
    expected[2:, 2:] = np.array([[1, 1], [1, -1]]) / SQ2
    _assert_gate("ch", expected)


@pytest.mark.parametrize("theta", [0.0, 0.6, -2.2])
def test_gate_cphase_closed_form(theta):
    expected = np.diag([1, 1, 1, np.exp(1j * theta)])
    for alias in ("cp", "cu1", "cphase"):
        _assert_gate(alias, expected, (theta,))


def test_cphase_reverse_is_symmetric():
    # diag(1,1,1,e^{i t}) is invariant under qubit exchange: routing a
    # cphase with reversed qargs must produce the same matrix (reference
    # test_gate_cphase_reverse).
    theta = 0.83
    u = gate_matrix("cp", (theta,))
    np.testing.assert_allclose(two_qubit_exchange(u), u, atol=1e-14)


@pytest.mark.parametrize("theta", [0.0, 0.5, -1.9])
def test_gate_crx_cry_crz_closed_forms(theta):
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    base = {
        "crx": np.array([[c, -1j * s], [-1j * s, c]]),
        "cry": np.array([[c, -s], [s, c]]),
        "crz": np.diag([np.exp(-1j * theta / 2), np.exp(1j * theta / 2)]),
    }
    for name, blk in base.items():
        expected = np.eye(4, dtype=complex)
        expected[2:, 2:] = blk
        _assert_gate(name, expected, (theta,))


def test_gate_cu3_closed_form():
    theta, phi, lam = 0.9, -0.2, 1.4
    expected = np.eye(4, dtype=complex)
    expected[2:, 2:] = gate_matrix("u", (theta, phi, lam))
    _assert_gate("cu3", expected, (theta, phi, lam))


def test_gate_swap_closed_form():
    _assert_gate(
        "swap",
        [
            [1, 0, 0, 0],
            [0, 0, 1, 0],
            [0, 1, 0, 0],
            [0, 0, 0, 1],
        ],
    )


def test_gate_iswap_closed_form():
    _assert_gate(
        "iswap",
        [
            [1, 0, 0, 0],
            [0, 0, 1j, 0],
            [0, 1j, 0, 0],
            [0, 0, 0, 1],
        ],
    )


@pytest.mark.parametrize("theta", [0.0, 0.7, np.pi / 2, -2.4])
def test_gate_rxx_closed_form(theta):
    c, s = np.cos(theta / 2), -1j * np.sin(theta / 2)
    expected = np.array(
        [
            [c, 0, 0, s],
            [0, c, s, 0],
            [0, s, c, 0],
            [s, 0, 0, c],
        ]
    )
    _assert_gate("rxx", expected, (theta,))


@pytest.mark.parametrize("theta", [0.0, 0.7, -2.4])
def test_gate_ryy_closed_form(theta):
    c = np.cos(theta / 2)
    s = 1j * np.sin(theta / 2)
    expected = np.array(
        [
            [c, 0, 0, s],
            [0, c, -s, 0],
            [0, -s, c, 0],
            [s, 0, 0, c],
        ]
    )
    _assert_gate("ryy", expected, (theta,))


@pytest.mark.parametrize("theta", [0.0, 0.7, -2.4])
def test_gate_rzz_closed_form(theta):
    e = np.exp(-1j * theta / 2)
    expected = np.diag([e, np.conj(e), np.conj(e), e])
    _assert_gate("rzz", expected, (theta,))


@pytest.mark.parametrize("theta", [0.0, 0.7, -2.4])
def test_gate_rzx_closed_form(theta):
    c, s = np.cos(theta / 2), -1j * np.sin(theta / 2)
    expected = np.array(
        [
            [c, s, 0, 0],
            [s, c, 0, 0],
            [0, 0, c, -s],
            [0, 0, -s, c],
        ]
    )
    _assert_gate("rzx", expected, (theta,))


def test_gate_ecr_closed_form():
    # ECR = (XI - YX)/sqrt(2) with the first listed qubit most significant.
    expected = (
        np.kron(PAULI["X"], np.eye(2)) - np.kron(PAULI["Y"], PAULI["X"])
    ) / SQ2
    _assert_gate("ecr", expected)
    # and it is its own inverse up to hermiticity: ECR is hermitian + unitary
    u = gate_matrix("ecr")
    np.testing.assert_allclose(u, u.conj().T, atol=1e-14)
    np.testing.assert_allclose(u @ u, np.eye(4), atol=1e-14)


def test_gate_pauli_pair_closed_forms():
    for name, a, b in (("xx", "X", "X"), ("yy", "Y", "Y"), ("zz", "Z", "Z")):
        _assert_gate(name, np.kron(PAULI[a], PAULI[b]))


# ---------------------------------------------------------------------------
# Three-qubit gates
# ---------------------------------------------------------------------------


def test_gate_ccx_closed_form():
    expected = np.eye(8, dtype=complex)
    expected[6:, 6:] = PAULI["X"]
    _assert_gate("ccx", expected)


def test_gate_ccz_closed_form():
    _assert_gate("ccz", np.diag([1, 1, 1, 1, 1, 1, 1, -1]))


def test_gate_cswap_closed_form():
    expected = np.eye(8, dtype=complex)
    # |1ab> -> |1ba>: swap amplitudes of |101> (5) and |110> (6)
    expected[5, 5] = expected[6, 6] = 0
    expected[5, 6] = expected[6, 5] = 1
    _assert_gate("cswap", expected)


def test_ccx_truth_table_on_basis_states():
    u = gate_matrix("ccx")
    for a in range(2):
        for b in range(2):
            for c in range(2):
                idx = (a << 2) | (b << 1) | c
                out = (a << 2) | (b << 1) | (c ^ (a & b))
                v = np.zeros(8)
                v[idx] = 1.0
                w = u @ v
                assert abs(w[out] - 1.0) < 1e-14, (a, b, c)


def test_cswap_truth_table_on_basis_states():
    u = gate_matrix("cswap")
    for a in range(2):
        for b in range(2):
            for c in range(2):
                idx = (a << 2) | (b << 1) | c
                out = (a << 2) | ((c if a else b) << 1) | (b if a else c)
                v = np.zeros(8)
                v[idx] = 1.0
                w = u @ v
                assert abs(w[out] - 1.0) < 1e-14, (a, b, c)


# ---------------------------------------------------------------------------
# Qubit-permutation utilities at d=2 and d=3
# ---------------------------------------------------------------------------


def test_two_qubit_exchange_matches_permute():
    rng = np.random.default_rng(7)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    np.testing.assert_allclose(
        two_qubit_exchange(m), permute_qubits(m, (1, 0)), atol=1e-14
    )


def test_permute_qubits_qutrit_two_site():
    # d=3 exchange: check on a product operator A (x) B -> B (x) A.
    rng = np.random.default_rng(3)
    a = rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))
    b = rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))
    np.testing.assert_allclose(
        permute_qubits(np.kron(a, b), (1, 0), d=3), np.kron(b, a), atol=1e-12
    )


def test_permute_qubits_three_site_cycle():
    rng = np.random.default_rng(11)
    ops = [rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2)) for _ in range(3)]
    u = np.kron(np.kron(ops[0], ops[1]), ops[2])
    # perm (2, 0, 1): new position j carries old qubit perm[j]
    got = permute_qubits(u, (2, 0, 1))
    expected = np.kron(np.kron(ops[2], ops[0]), ops[1])
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_permute_qubits_identity_perm_is_noop():
    rng = np.random.default_rng(5)
    u = rng.normal(size=(8, 8))
    np.testing.assert_allclose(permute_qubits(u, (0, 1, 2)), u, atol=0)


# ---------------------------------------------------------------------------
# Operator library: d-level arithmetic + noise-name resolution
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("d", [2, 3, 5])
def test_destroy_create_matrix_elements(d):
    a = destroy(d)
    adag = create(d)
    # a|n> = sqrt(n)|n-1>: a[n-1, n] = sqrt(n)
    for n in range(1, d):
        assert abs(a[n - 1, n] - np.sqrt(n)) < 1e-14
    assert np.count_nonzero(a) == d - 1
    np.testing.assert_allclose(adag, a.conj().T, atol=0)


@pytest.mark.parametrize("d", [2, 3, 5])
def test_number_operator_and_commutator(d):
    a, adag, n = destroy(d), create(d), number_op(d)
    np.testing.assert_allclose(n, adag @ a, atol=1e-14)
    np.testing.assert_allclose(np.diag(n), np.arange(d), atol=1e-14)
    # truncated CCR: [a, adag] = 1 except the top corner (-(d-1) there)
    comm = a @ adag - adag @ a
    expected = np.eye(d)
    expected[d - 1, d - 1] = -(d - 1)
    np.testing.assert_allclose(comm, expected, atol=1e-12)


def test_qubit_destroy_is_lowering():
    np.testing.assert_allclose(destroy(2), [[0, 1], [0, 0]], atol=0)
    np.testing.assert_allclose(noise_operator("lowering"), destroy(2), atol=0)
    np.testing.assert_allclose(noise_operator("raising"), create(2), atol=0)


def test_noise_operator_aliases():
    np.testing.assert_allclose(noise_operator("bitflip"), PAULI["X"], atol=0)
    np.testing.assert_allclose(noise_operator("dephasing"), PAULI["Z"], atol=0)
    np.testing.assert_allclose(noise_operator("relaxation"), destroy(2), atol=0)
    np.testing.assert_allclose(noise_operator("excitation"), create(2), atol=0)
    with pytest.raises(KeyError):
        noise_operator("not-a-noise-name")


def test_is_pauli_matrix_detects_paulis_and_rejects_others():
    assert is_pauli_matrix(PAULI["X"])
    assert is_pauli_matrix(PAULI["Y"])
    assert is_pauli_matrix(PAULI["Z"])
    assert not is_pauli_matrix(destroy(2))
    assert not is_pauli_matrix(np.array([[1, 1], [1, -1]]) / SQ2)  # Hadamard
    assert not is_pauli_matrix(2.0 * PAULI["X"])  # scaled: not a bare Pauli
    assert not is_pauli_matrix(np.array([[2.0, 0], [0, 1.0]]))


# ---------------------------------------------------------------------------
# Observable metadata: entropy / schmidt set_sites flexibility, PVM
# (reference test_meta_entropy_sites_len_flexible / schmidt / pvm placeholder)
# ---------------------------------------------------------------------------


def test_entropy_single_index_means_bond():
    for spec in (2, [2]):
        o = Observable("entropy", spec)
        assert list(o.site_list) == [2, 3]


def test_schmidt_single_index_means_bond():
    for spec in (0, [0]):
        o = Observable("schmidt_spectrum", spec)
        assert list(o.site_list) == [0, 1]


def test_entropy_explicit_pair_kept():
    o = Observable("entropy", [4, 5])
    assert list(o.site_list) == [4, 5]


def test_pvm_bitstring_records_placeholder():
    o = Observable("0110")
    assert o.name == "pvm"
    assert o.bitstring == "0110"


def test_named_observable_rejects_parameters():
    with pytest.raises(ValueError, match="does not accept parameters"):
        Observable("z", 0, theta=0.3)


def test_matrix_observable_rejects_named_parameters():
    with pytest.raises(ValueError, match="Matrix observables"):
        Observable(np.eye(2), 0, theta=0.1)
