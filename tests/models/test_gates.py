"""Gate-library oracle tests.

Parity target: /root/reference/tests/core/libraries/test_gate_library.py
(965 LoC) — every named gate checked against an independent dense oracle
(explicit matrices / scipy.linalg.expm), plus the product-form generator
contract used by the windowed-TDVP gate modes.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.linalg

from yaqs_tpu.models.gates import (
    GATES,
    controlled,
    gate_arity,
    gate_generator,
    gate_matrix,
    permute_qubits,
    two_qubit_exchange,
)

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.diag([1.0, -1.0]).astype(complex)
H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)

THETAS = (0.0, 0.37, -1.2, np.pi, 2.6)


def _params_for(name: str) -> tuple:
    n_params = GATES[name][1]
    return tuple((0.37, -0.8, 1.9)[:n_params])


# ---------------------------------------------------------------------------
# Structural contracts over the whole library
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(GATES))
def test_gate_shape_matches_arity(name):
    arity, _, _ = GATES[name]
    u = gate_matrix(name, _params_for(name))
    assert u.shape == (2**arity, 2**arity)
    assert gate_arity(name) == arity


@pytest.mark.parametrize("name", sorted(set(GATES) - {"p0", "p1"}))
def test_gate_unitary(name):
    u = gate_matrix(name, _params_for(name))
    np.testing.assert_allclose(u @ u.conj().T, np.eye(u.shape[0]), atol=1e-12)


def test_projectors_not_unitary_but_idempotent():
    for name, vec in (("p0", [1, 0]), ("p1", [0, 1])):
        p = gate_matrix(name)
        np.testing.assert_allclose(p @ p, p, atol=1e-15)
        np.testing.assert_allclose(p @ np.asarray(vec, dtype=complex), vec, atol=1e-15)


def test_param_count_validation():
    with pytest.raises(ValueError, match="expects"):
        gate_matrix("rx")
    with pytest.raises(ValueError, match="expects"):
        gate_matrix("h", (0.3,))
    with pytest.raises(ValueError, match="expects"):
        gate_matrix("u3", (0.1, 0.2))


# ---------------------------------------------------------------------------
# Fixed gates vs explicit oracles
# ---------------------------------------------------------------------------


def test_paulis_and_clifford_singles():
    np.testing.assert_allclose(gate_matrix("x"), X, atol=1e-15)
    np.testing.assert_allclose(gate_matrix("y"), Y, atol=1e-15)
    np.testing.assert_allclose(gate_matrix("z"), Z, atol=1e-15)
    np.testing.assert_allclose(gate_matrix("h"), H, atol=1e-15)
    np.testing.assert_allclose(gate_matrix("id"), I2, atol=1e-15)
    np.testing.assert_allclose(gate_matrix("s"), np.diag([1, 1j]), atol=1e-15)
    np.testing.assert_allclose(
        gate_matrix("t"), np.diag([1, np.exp(1j * np.pi / 4)]), atol=1e-15
    )


def test_sx_is_sqrt_x():
    sx = gate_matrix("sx")
    np.testing.assert_allclose(sx @ sx, X, atol=1e-12)


@pytest.mark.parametrize(
    ("name", "base"), [("sdg", "s"), ("tdg", "t"), ("sxdg", "sx")]
)
def test_dagger_pairs(name, base):
    np.testing.assert_allclose(
        gate_matrix(name), gate_matrix(base).conj().T, atol=1e-15
    )
    np.testing.assert_allclose(
        gate_matrix(name) @ gate_matrix(base), I2, atol=1e-12
    )


@pytest.mark.parametrize("theta", THETAS)
@pytest.mark.parametrize(("name", "pauli"), [("rx", X), ("ry", Y), ("rz", Z)])
def test_rotations_vs_expm(name, pauli, theta):
    oracle = scipy.linalg.expm(-0.5j * theta * pauli)
    np.testing.assert_allclose(gate_matrix(name, (theta,)), oracle, atol=1e-12)


@pytest.mark.parametrize("theta", THETAS)
def test_phase_family_aliases(theta):
    oracle = np.diag([1.0, np.exp(1j * theta)])
    for name in ("p", "u1", "phase"):
        np.testing.assert_allclose(gate_matrix(name, (theta,)), oracle, atol=1e-12)


def test_u3_decomposition():
    theta, phi, lam = 0.7, -0.4, 1.3
    # u3(theta, phi, lam) == rz-like phases around ry(theta), up to the
    # qiskit global-phase convention: check column action explicitly
    u = gate_matrix("u3", (theta, phi, lam))
    oracle = np.array(
        [
            [np.cos(theta / 2), -np.exp(1j * lam) * np.sin(theta / 2)],
            [
                np.exp(1j * phi) * np.sin(theta / 2),
                np.exp(1j * (phi + lam)) * np.cos(theta / 2),
            ],
        ]
    )
    np.testing.assert_allclose(u, oracle, atol=1e-12)
    np.testing.assert_allclose(gate_matrix("u", (theta, phi, lam)), oracle, atol=1e-12)
    np.testing.assert_allclose(
        gate_matrix("u2", (phi, lam)),
        gate_matrix("u3", (np.pi / 2, phi, lam)),
        atol=1e-12,
    )


def test_swap_and_iswap_explicit():
    swap = np.eye(4)[[0, 2, 1, 3]]
    np.testing.assert_allclose(gate_matrix("swap"), swap, atol=1e-15)
    iswap = np.array(
        [[1, 0, 0, 0], [0, 0, 1j, 0], [0, 1j, 0, 0], [0, 0, 0, 1]], dtype=complex
    )
    np.testing.assert_allclose(gate_matrix("iswap"), iswap, atol=1e-15)


@pytest.mark.parametrize("theta", THETAS)
@pytest.mark.parametrize(
    ("name", "p1", "p2"),
    [("rxx", X, X), ("ryy", Y, Y), ("rzz", Z, Z), ("rzx", Z, X)],
)
def test_exchange_rotations_vs_expm(name, p1, p2, theta):
    oracle = scipy.linalg.expm(-0.5j * theta * np.kron(p1, p2))
    np.testing.assert_allclose(gate_matrix(name, (theta,)), oracle, atol=1e-12)


def test_pauli_kron_pairs():
    for name, p1, p2 in (("xx", X, X), ("yy", Y, Y), ("zz", Z, Z)):
        np.testing.assert_allclose(gate_matrix(name), np.kron(p1, p2), atol=1e-15)


# ---------------------------------------------------------------------------
# Controlled family: block structure |0><0| (x) I + |1><1| (x) U
# ---------------------------------------------------------------------------

CONTROLLED_1 = [
    ("cx", "x"),
    ("cnot", "x"),
    ("cy", "y"),
    ("cz", "z"),
    ("ch", "h"),
    ("cp", "p"),
    ("cu1", "u1"),
    ("cphase", "phase"),
    ("crx", "rx"),
    ("cry", "ry"),
    ("crz", "rz"),
    ("cu3", "u3"),
]


@pytest.mark.parametrize(("cname", "base"), CONTROLLED_1)
def test_singly_controlled_block_structure(cname, base):
    params = _params_for(cname)
    u = gate_matrix(base, params)
    oracle = np.block(
        [[np.eye(2), np.zeros((2, 2))], [np.zeros((2, 2)), u]]
    )
    np.testing.assert_allclose(gate_matrix(cname, params), oracle, atol=1e-12)


def test_doubly_controlled_block_structure():
    for cname, base in (("ccx", X), ("ccz", Z)):
        oracle = np.eye(8, dtype=complex)
        oracle[6:, 6:] = base
        np.testing.assert_allclose(gate_matrix(cname), oracle, atol=1e-15)
    cswap = np.eye(8, dtype=complex)
    cswap[4:, 4:] = np.eye(4)[[0, 2, 1, 3]]
    np.testing.assert_allclose(gate_matrix("cswap"), cswap, atol=1e-15)


def test_controlled_helper_matches_library():
    np.testing.assert_allclose(controlled(X), gate_matrix("cx"), atol=1e-15)
    np.testing.assert_allclose(
        controlled(controlled(X)), gate_matrix("ccx"), atol=1e-15
    )


# ---------------------------------------------------------------------------
# Qubit-permutation helpers
# ---------------------------------------------------------------------------


def test_two_qubit_exchange_involution_and_kron():
    rng = np.random.default_rng(5)
    m = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    np.testing.assert_allclose(two_qubit_exchange(two_qubit_exchange(m)), m)
    a = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    b = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    np.testing.assert_allclose(two_qubit_exchange(np.kron(a, b)), np.kron(b, a))


def test_two_qubit_exchange_on_cx_flips_control():
    # cx with control on the SECOND qubit: |x,0> -> |x,0>? no: target first.
    flipped = two_qubit_exchange(gate_matrix("cx"))
    oracle = np.eye(4, dtype=complex)[[0, 3, 2, 1]]  # X on first iff second=1
    np.testing.assert_allclose(flipped, oracle, atol=1e-15)


def test_permute_qubits_three_qubit_kron():
    rng = np.random.default_rng(6)
    mats = [
        rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        for _ in range(3)
    ]
    u = np.kron(np.kron(mats[0], mats[1]), mats[2])
    perm = (2, 0, 1)
    expected = np.kron(np.kron(mats[2], mats[0]), mats[1])
    np.testing.assert_allclose(permute_qubits(u, perm), expected)
    np.testing.assert_allclose(permute_qubits(u, (0, 1, 2)), u)


# ---------------------------------------------------------------------------
# Product-form generators: gate == exp(-i f_1 (x) ... (x) f_k) EXACTLY
# ---------------------------------------------------------------------------

GENERATOR_GATES = [
    ("cx", ()),
    ("cnot", ()),
    ("cy", ()),
    ("cz", ()),
    ("ch", ()),
    ("cp", (0.37,)),
    ("crx", (0.9,)),
    ("cry", (-1.3,)),
    ("crz", (2.2,)),
    ("cu3", (0.37, -0.8, 1.9)),
    ("ccx", ()),
    ("ccz", ()),
    ("rxx", (0.7,)),
    ("ryy", (-0.5,)),
    ("rzz", (1.1,)),
    ("rzx", (0.3,)),
]


@pytest.mark.parametrize(("name", "params"), GENERATOR_GATES)
def test_generator_reproduces_gate(name, params):
    factors = gate_generator(name, params)
    assert factors is not None
    kron = factors[0]
    for f in factors[1:]:
        kron = np.kron(kron, f)
    np.testing.assert_allclose(
        scipy.linalg.expm(-1j * kron), gate_matrix(name, params), atol=1e-10
    )


@pytest.mark.parametrize("name", ["swap", "iswap", "cswap", "h", "x"])
def test_gates_without_product_generator(name):
    assert gate_generator(name, _params_for(name)) is None


def test_generator_zero_angle_controlled():
    factors = gate_generator("crz", (0.0,))
    assert factors is not None
    kron = np.kron(factors[0], factors[1])
    np.testing.assert_allclose(scipy.linalg.expm(-1j * kron), np.eye(4), atol=1e-12)


def test_generator_param_validation():
    with pytest.raises(ValueError, match="expects"):
        gate_generator("crx", ())
