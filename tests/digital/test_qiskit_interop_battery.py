"""Duck-typed qiskit interop battery.

The image carries no qiskit, so ``Circuit.from_qiskit`` is exercised with
minimal stand-in objects implementing the attribute surface it consumes
(``num_qubits``, ``data`` -> instructions with ``operation.name/params/
to_matrix/label``, ``qubits``, ``find_bit``).  Mirrors the translation
contracts of the reference DAG suite
(/root/reference/tests/digital/utils/test_dag_utils.py:63-495): named-gate
passthrough, custom-matrix fallback with qiskit's little-endian convention,
barrier labels, measures, and unbound-parameter rejection.  Oracles are
dense statevectors.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.digital.circuit import Circuit, load_circuit
from yaqs_tpu.equivalence import EquivalenceChecker
from yaqs_tpu.models.gates import gate_matrix


class FakeOp:
    def __init__(self, name, params=(), matrix=None, label=None):
        self.name = name
        self.params = list(params)
        self._matrix = matrix
        self.label = label

    def to_matrix(self):
        if self._matrix is None:
            raise AttributeError("no matrix")
        return self._matrix


class FakeBit:
    def __init__(self, index):
        self.index = index


class FakeInstruction:
    def __init__(self, op, qubit_indices):
        self.operation = op
        self.qubits = [FakeBit(i) for i in qubit_indices]


class FakeLoc:
    def __init__(self, index):
        self.index = index


class FakeQC:
    """Duck-typed QuantumCircuit: num_qubits + data + find_bit."""

    def __init__(self, num_qubits):
        self.num_qubits = num_qubits
        self.data = []

    def find_bit(self, bit):
        return FakeLoc(bit.index)

    def add(self, name, qubits, params=(), matrix=None, label=None):
        self.data.append(FakeInstruction(FakeOp(name, params, matrix, label), qubits))
        return self


def test_named_gates_pass_through():
    qc = FakeQC(3)
    qc.add("h", [0]).add("cx", [0, 1]).add("rz", [2], params=[0.7])
    c = Circuit.from_qiskit(qc)
    assert [(op.name, op.qubits, op.params) for op in c.ops] == [
        ("h", (0,), ()),
        ("cx", (0, 1), ()),
        ("rz", (2,), (0.7,)),
    ]


def test_barrier_label_and_measure_translate():
    qc = FakeQC(2)
    qc.add("h", [0])
    qc.add("barrier", [0, 1], label="SAMPLE_OBSERVABLES")
    qc.add("x", [1])
    qc.add("measure", [0])
    qc.add("measure", [1])
    c = Circuit.from_qiskit(qc)
    names = [op.name for op in c.ops]
    assert names == ["h", "barrier", "x"]
    assert c.ops[1].label == "SAMPLE_OBSERVABLES"
    assert sorted(c.measured_qubits) == [0, 1]
    assert not c.has_mid_circuit_measurements


def test_gate_after_measure_flags_mid_circuit():
    qc = FakeQC(2)
    qc.add("h", [0]).add("measure", [0]).add("x", [1])
    c = Circuit.from_qiskit(qc)
    assert c.has_mid_circuit_measurements


def test_custom_matrix_gate_little_endian_reversal():
    """qiskit matrices are little-endian; the converter reverses the qubit
    tuple so the embedded operator matches.  Oracle: the same circuit built
    natively must be equivalent (dense backend)."""
    # non-symmetric two-qubit unitary: CX in qiskit's little-endian layout
    cx_little = np.array(
        [[1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0], [0, 1, 0, 0]], dtype=complex
    )
    qc = FakeQC(2)
    qc.add("h", [0])
    qc.add("my_cx", [0, 1], matrix=cx_little)
    translated = Circuit.from_qiskit(qc)
    native = Circuit(2).h(0).cx(0, 1)
    res = EquivalenceChecker().check(translated, native)
    assert res.equivalent, res.fidelity


@pytest.mark.parametrize("qargs", [(0, 1), (1, 0), (2, 0), (1, 2)])
def test_custom_nonsymmetric_two_qubit_qarg_ordering(qargs):
    """A random non-symmetric 2q unitary applied at arbitrary (also
    descending / long-range) qargs must match the native matrix-gate route."""
    rng = np.random.default_rng(7)
    a = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    q, _ = np.linalg.qr(a)
    qc = FakeQC(3)
    qc.add("u_rand", list(qargs), matrix=q)
    translated = Circuit.from_qiskit(qc)
    # native convention: first-listed qubit is MOST significant, so the
    # little-endian qiskit matrix lands on reversed qargs
    native = Circuit(3)
    native.append("u_rand", tuple(reversed(qargs)), matrix=q)
    res = EquivalenceChecker().check(translated, native)
    assert res.equivalent, (qargs, res.fidelity)


def test_named_gate_qarg_order_preserved_not_reversed():
    # named gates take the library route: qargs must NOT be reversed
    qc = FakeQC(2)
    qc.add("cx", [1, 0])  # control 1, target 0
    translated = Circuit.from_qiskit(qc)
    native = Circuit(2).cx(1, 0)
    res = EquivalenceChecker().check(translated, native)
    assert res.equivalent, res.fidelity
    # and it differs from the ascending cx
    assert not EquivalenceChecker().check(translated, Circuit(2).cx(0, 1)).equivalent


def test_unbound_parameter_rejected():
    class Unbound:
        def __float__(self):
            msg = "unbound parameter"
            raise TypeError(msg)

    qc = FakeQC(1)
    qc.add("rz", [0], params=[Unbound()])
    with pytest.raises(TypeError):
        Circuit.from_qiskit(qc)


def test_unknown_gate_without_matrix_raises():
    qc = FakeQC(1)
    qc.add("mystery", [0])  # no to_matrix available
    with pytest.raises((AttributeError, ValueError)):
        Circuit.from_qiskit(qc)


def test_load_circuit_dispatches_ducktyped_qiskit():
    qc = FakeQC(2)
    qc.add("h", [0]).add("cx", [0, 1])
    c = load_circuit(qc)
    assert isinstance(c, Circuit)
    assert [op.name for op in c.ops] == ["h", "cx"]


def test_translated_statevector_matches_gate_library():
    """End-to-end: a translated 1q custom gate reproduces the library gate's
    dense action (reference test_custom_one_qubit_unitary_matches_qiskit)."""
    theta = 0.6
    ry = gate_matrix("ry", (theta,))
    qc = FakeQC(1)
    qc.add("my_ry", [0], matrix=ry)
    c = Circuit.from_qiskit(qc)
    u = EquivalenceChecker._circuit_unitary(c)
    np.testing.assert_allclose(u, ry, atol=1e-12)
