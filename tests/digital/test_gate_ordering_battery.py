"""Qubit-argument ordering battery for non-symmetric and custom gates.

TPU-native analogue of the reference's DAG translation orientation tests
(/root/reference/tests/digital/utils/test_dag_utils.py:144-470: reversed
qargs, fixed non-symmetric unitaries at every qarg ordering, custom 1q/2q/3q
unitary gates, long-range custom gates).  The classic failure mode these
catch is an engine that silently transposes a gate when qubits arrive in
descending order or across a distance; the oracle is a dense statevector
built by explicit axis-wise tensordot (independent of the MPS engine).

Full final-state comparison (up to global phase) via ``get_state`` — stronger
than per-site expectation values, which miss orientation errors on states
with symmetric marginals.
"""

from __future__ import annotations

import numpy as np
import pytest

from test_engine import run_dense

from yaqs_tpu import DigitalSimParams, Simulator, State
from yaqs_tpu.core import mps_ops
from yaqs_tpu.digital.circuit import Circuit

EXACT_MODES = ["swaps", "mpo"]


def _zeros(length: int) -> np.ndarray:
    psi = np.zeros(2**length, dtype=complex)
    psi[0] = 1.0
    return psi


def _mps_state(circuit: Circuit, gate_mode: str, chi: int = 32) -> np.ndarray:
    res = Simulator().run(
        State(circuit.num_qubits),
        circuit,
        DigitalSimParams(
            get_state=True,
            gate_mode=gate_mode,
            max_bond_dim=chi,
            svd_threshold=1e-12,
            random_seed=0,
        ),
        None,
    )
    return mps_ops.to_statevector_np(np.asarray(res.output_state.tensors))


def _assert_state_matches(circuit: Circuit, gate_mode: str, atol: float = 1e-8):
    golden = run_dense(circuit, _zeros(circuit.num_qubits))
    psi = _mps_state(circuit, gate_mode)
    i = int(np.argmax(np.abs(golden)))
    assert abs(golden[i]) > 1e-6
    phase = psi[i] / golden[i]
    np.testing.assert_allclose(abs(phase), 1.0, atol=atol)
    np.testing.assert_allclose(psi, phase * golden, atol=atol)


def _entangle(c: Circuit) -> Circuit:
    """Break every symmetry the later gate could hide behind."""
    for q in range(c.num_qubits):
        c.h(q)
        c.rz(q, params=(0.21 + 0.17 * q,))
        c.ry(q, params=(0.4 - 0.09 * q,))
    return c


def _random_unitary(dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    q, r = np.linalg.qr(m)
    return q * (np.diag(r) / np.abs(np.diag(r)))


# -- non-symmetric builtin 2q gates at every orientation/distance -------------

NONSYM_2Q = [
    ("cx", ()),
    ("cy", ()),
    ("ch", ()),
    ("crz", (0.37,)),
    ("crx", (0.83,)),
    ("rzx", (0.55,)),  # generator differs per side: classic transpose trap
    ("ecr", ()),
]
PLACEMENTS_2Q = [(0, 1), (1, 0), (3, 4), (4, 3), (0, 3), (3, 0), (1, 4), (4, 1)]


@pytest.mark.parametrize("gate_mode", EXACT_MODES)
@pytest.mark.parametrize(("name", "params"), NONSYM_2Q, ids=lambda g: g if isinstance(g, str) else "")
def test_nonsymmetric_2q_every_orientation(gate_mode, name, params):
    length = 5
    for qubits in PLACEMENTS_2Q:
        c = _entangle(Circuit(length))
        c.append(name, qubits, params=params)
        _assert_state_matches(c, gate_mode)


# -- custom raw-matrix unitaries ----------------------------------------------


@pytest.mark.parametrize("gate_mode", EXACT_MODES)
def test_custom_1q_unitary(gate_mode):
    length = 3
    mat = _random_unitary(2, seed=11)
    for q in range(length):
        c = _entangle(Circuit(length))
        c.append("u_custom", (q,), matrix=mat)
        _assert_state_matches(c, gate_mode)


@pytest.mark.parametrize("gate_mode", EXACT_MODES)
def test_custom_2q_unitary_forward_and_reversed(gate_mode):
    """A fixed non-symmetric random unitary: reversing the qargs must act as
    SWAP . U . SWAP, never as U or U^T (reference test_dag_utils.py:349)."""
    length = 4
    mat = _random_unitary(4, seed=23)
    for qubits in [(1, 2), (2, 1), (0, 3), (3, 0)]:
        c = _entangle(Circuit(length))
        c.append("u_custom", qubits, matrix=mat)
        _assert_state_matches(c, gate_mode)


@pytest.mark.parametrize("gate_mode", EXACT_MODES)
def test_custom_3q_unitary_all_orderings(gate_mode):
    """Every permutation of a fixed random 3q unitary's qargs is a distinct
    operator; all six must match the dense oracle (test_dag_utils.py:428)."""
    import itertools

    length = 3
    mat = _random_unitary(8, seed=31)
    for qubits in itertools.permutations((0, 1, 2)):
        c = _entangle(Circuit(length))
        c.append("u_custom", qubits, matrix=mat)
        _assert_state_matches(c, gate_mode)


@pytest.mark.parametrize("gate_mode", EXACT_MODES)
def test_custom_3q_unitary_spread_placements(gate_mode):
    length = 5
    mat = _random_unitary(8, seed=47)
    for qubits in [(0, 2, 4), (4, 2, 0), (3, 0, 4)]:
        c = _entangle(Circuit(length))
        c.append("u_custom", qubits, matrix=mat)
        _assert_state_matches(c, gate_mode)


def test_custom_gate_unknown_name_without_matrix_rejected():
    c = Circuit(2)
    with pytest.raises(ValueError, match="unknown gate"):
        c.append("mystery", (0, 1))


def test_custom_gate_matrix_shape_validated():
    c = Circuit(2)
    with pytest.raises(ValueError, match="matrix shape"):
        c.append("u_custom", (0, 1), matrix=np.eye(2))


# -- sequencing: reversed gate pairs, inverses, barriers ----------------------


@pytest.mark.parametrize("gate_mode", EXACT_MODES)
def test_cx_both_orientations_in_one_circuit(gate_mode):
    """cx(a,b) then cx(b,a) is NOT the identity and not symmetric under the
    engine's half-layer batching — the composition must still match."""
    length = 4
    c = _entangle(Circuit(length))
    c.cx(0, 1)
    c.cx(1, 0)
    c.cx(2, 3)
    c.cx(3, 2)
    c.cx(0, 3)
    c.cx(3, 0)
    _assert_state_matches(c, gate_mode)


@pytest.mark.parametrize("gate_mode", EXACT_MODES)
def test_custom_unitary_inverse_roundtrip(gate_mode):
    """U then U^dagger at the same (reversed-distance) placement restores the
    pre-gate state exactly — a sign/transpose error cannot cancel."""
    length = 4
    mat = _random_unitary(4, seed=59)
    base = _entangle(Circuit(length))
    golden = run_dense(base, _zeros(length))

    c = _entangle(Circuit(length))
    c.append("u_custom", (3, 0), matrix=mat)
    c.append("u_custom_dg", (3, 0), matrix=mat.conj().T)
    psi = _mps_state(c, gate_mode)
    i = int(np.argmax(np.abs(golden)))
    phase = psi[i] / golden[i]
    np.testing.assert_allclose(psi, phase * golden, atol=1e-8)


@pytest.mark.parametrize("gate_mode", EXACT_MODES)
def test_barriers_are_transparent(gate_mode):
    length = 3
    c = _entangle(Circuit(length))
    c.barrier()
    c.cx(2, 0)
    c.barrier()
    c.append("crz", (2, 1), params=(0.7,))
    _assert_state_matches(c, gate_mode)


# -- approximate modes converge on the same orientations ----------------------


def test_window_tdvp_respects_orientation():
    """The windowed-TDVP route must see the same oriented generator: at high
    sweep count the long-range reversed CRX agrees with the dense oracle."""
    length = 4
    c = _entangle(Circuit(length))
    c.append("crx", (3, 0), params=(0.9,))
    golden = run_dense(c, _zeros(length))
    res = Simulator().run(
        State(length),
        c,
        DigitalSimParams(
            get_state=True,
            gate_mode="tdvp",
            tdvp_sweeps=8,
            max_bond_dim=16,
            svd_threshold=1e-12,
            random_seed=0,
        ),
        None,
    )
    psi = mps_ops.to_statevector_np(np.asarray(res.output_state.tensors))
    i = int(np.argmax(np.abs(golden)))
    phase = psi[i] / golden[i]
    np.testing.assert_allclose(psi, phase * golden, atol=5e-3)
