"""Circuit IR and OpenQASM 2 parser tests."""

from __future__ import annotations

import numpy as np

from yaqs_tpu.digital.circuit import Circuit, load_circuit, parse_qasm2
from yaqs_tpu.models.gates import gate_matrix


def test_builder_api():
    c = Circuit(3)
    c.h(0).cx(0, 1).rz(2, params=(0.5,)).sample_observables().cx(1, 2)
    assert c.num_qubits == 3
    names = [op.name for op in c.ops]
    assert names == ["h", "cx", "rz", "barrier", "cx"]
    assert c.ops[3].label == "SAMPLE_OBSERVABLES"


def test_qasm2_basic():
    qasm = """
    OPENQASM 2.0;
    include "qelib1.inc";
    qreg q[3];
    creg c[3];
    h q[0];
    cx q[0], q[1];
    rz(pi/4) q[2];
    u3(0.1, 0.2, 0.3) q[1];
    barrier q;
    measure q -> c;
    """
    c = parse_qasm2(qasm)
    assert c.num_qubits == 3
    names = [op.name for op in c.ops]
    assert names == ["h", "cx", "rz", "u3", "barrier"]
    np.testing.assert_allclose(c.ops[2].params[0], np.pi / 4)
    assert sorted(c.measured_qubits) == [0, 1, 2]


def test_qasm2_register_broadcast():
    qasm = "OPENQASM 2.0; qreg q[4]; h q;"
    c = parse_qasm2(qasm)
    assert [op.qubits for op in c.ops] == [(0,), (1,), (2,), (3,)]


def test_qasm2_custom_gate_expansion():
    qasm = """
    OPENQASM 2.0;
    include "qelib1.inc";
    gate bell a, b { h a; cx a, b; }
    gate rot(t) a { rz(t) a; rx(2*t) a; }
    qreg q[2];
    bell q[0], q[1];
    rot(pi/2) q[1];
    """
    c = parse_qasm2(qasm)
    names = [op.name for op in c.ops]
    assert names == ["h", "cx", "rz", "rx"]
    np.testing.assert_allclose(c.ops[2].params[0], np.pi / 2)
    np.testing.assert_allclose(c.ops[3].params[0], np.pi)


def test_qasm2_comments_and_expressions():
    qasm = """
    OPENQASM 2.0; // header comment
    qreg q[1];
    /* block
       comment */
    rx(-pi/2 + 0.5) q[0];
    """
    c = parse_qasm2(qasm)
    np.testing.assert_allclose(c.ops[0].params[0], -np.pi / 2 + 0.5)


def test_load_circuit_from_string_and_passthrough():
    c = Circuit(2).h(0)
    assert load_circuit(c) is c
    c2 = load_circuit("OPENQASM 2.0; qreg q[2]; cz q[0], q[1];")
    assert c2.ops[0].name == "cz"


def test_gate_matrices_unitary():
    import itertools

    for name in ("h", "s", "t", "sx", "cx", "cz", "swap", "iswap", "ch"):
        u = gate_matrix(name)
        np.testing.assert_allclose(u @ u.conj().T, np.eye(u.shape[0]), atol=1e-12)
    for name, n in (("rx", 1), ("rzz", 1), ("u3", 3)):
        u = gate_matrix(name, tuple(0.3 * (i + 1) for i in range(n)))
        np.testing.assert_allclose(u @ u.conj().T, np.eye(u.shape[0]), atol=1e-12)


def test_qasm3_subset():
    from yaqs_tpu.digital.circuit import parse_qasm3

    qasm = """
    OPENQASM 3.0;
    include "stdgates.inc";
    qubit[3] q;
    bit[3] c;
    h q[0];
    cx q[0], q[1];
    rz(pi/2) q[2];
    c = measure q;
    """
    circ = parse_qasm3(qasm)
    assert circ.num_qubits == 3
    assert [op.name for op in circ.ops] == ["h", "cx", "rz"]
    assert sorted(circ.measured_qubits) == [0, 1, 2]


def test_load_circuit_dispatches_qasm3():
    c = load_circuit("OPENQASM 3.0; qubit[2] q; cz q[0], q[1];")
    assert c.ops[0].name == "cz"
