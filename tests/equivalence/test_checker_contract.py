"""Equivalence-checker input/contract tests.

Port of the reference behaviors in /root/reference/tests/test_equivalence_checker.py
that go beyond the physics checks in test_checker.py: QASM 2/3 path + raw-string
inputs, custom-gate expansion equivalence, u1/u3/ecr self-equivalence,
mid-circuit measurement rejection, descending-CX, auto backend selection,
matrix_max_qubits override, and diagnostics fields.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import EquivalenceChecker
from yaqs_tpu.digital.circuit import Circuit

QASM2 = """OPENQASM 2.0;
include "qelib1.inc";
qreg q[3];
h q[0];
cx q[0],q[1];
rz(0.4) q[2];
"""

QASM3 = """OPENQASM 3.0;
qubit[3] q;
h q[0];
cx q[0], q[1];
rz(0.4) q[2];
"""


def test_accepts_qasm2_path(tmp_path):
    p = tmp_path / "c.qasm"
    p.write_text(QASM2)
    res = EquivalenceChecker().check(p, QASM2)
    assert res.equivalent
    res2 = EquivalenceChecker().check(str(p), QASM2)
    assert res2.equivalent


def test_accepts_qasm3_path_and_string(tmp_path):
    p = tmp_path / "c3.qasm"
    p.write_text(QASM3)
    res = EquivalenceChecker().check(p, QASM3)
    assert res.equivalent
    # QASM2 and QASM3 encodings of the same circuit are equivalent
    assert EquivalenceChecker().check(QASM2, QASM3).equivalent


def test_custom_gate_vs_expanded_equivalence():
    # user-defined QASM2 gate vs its inlined body
    custom = """OPENQASM 2.0;
include "qelib1.inc";
gate bell a, b { h a; cx a, b; }
qreg q[2];
bell q[0], q[1];
"""
    expanded = """OPENQASM 2.0;
include "qelib1.inc";
qreg q[2];
h q[0];
cx q[0],q[1];
"""
    assert EquivalenceChecker().check(custom, expanded).equivalent


@pytest.mark.parametrize("gate_line", ["u1(0.5) q[0];", "u3(0.4,0.2,-0.3) q[0];"])
def test_u_gate_self_equivalence(gate_line):
    q = f"""OPENQASM 2.0;
include "qelib1.inc";
qreg q[2];
{gate_line}
cx q[0],q[1];
"""
    assert EquivalenceChecker().check(q, q).equivalent


def test_ecr_self_equivalence_and_unitarity():
    c = Circuit(2)
    c.append("ecr", (0, 1))
    assert EquivalenceChecker().check(c, c).equivalent
    from yaqs_tpu.models.gates import gate_matrix

    m = gate_matrix("ecr")
    np.testing.assert_allclose(m @ m.conj().T, np.eye(4), atol=1e-14)


def test_ecr_decomposition_equivalence():
    # ECR = (X (x) I - Y (x) X)/sqrt(2) must equal its rzx/x decomposition
    # ECR = RZX(-pi/4) . (X on q0) . RZX(pi/4) as a matrix product, i.e. the
    # circuit applies rzx(pi/4) first (qiskit's documented identity)
    c1 = Circuit(2)
    c1.append("ecr", (0, 1))
    c2 = Circuit(2)
    c2.append("rzx", (0, 1), params=(np.pi / 4,))
    c2.x(0)
    c2.append("rzx", (0, 1), params=(-np.pi / 4,))
    res = EquivalenceChecker().check(c1, c2)
    assert res.equivalent, res.fidelity


def test_mid_circuit_measurement_rejected():
    c = Circuit(2)
    c.h(0)
    c.append("measure", (0,))
    c.cx(0, 1)
    ref = Circuit(2)
    ref.h(0)
    ref.cx(0, 1)
    with pytest.raises(ValueError, match="mid-circuit"):
        EquivalenceChecker().check(c, ref)


def test_mid_circuit_measure_op_rejected_by_compiler():
    from yaqs_tpu.digital.compile import compile_circuit

    c = Circuit(2)
    c.h(0)
    c.append("measure", (0,))
    c.cx(0, 1)
    with pytest.raises(ValueError, match="mid-circuit"):
        compile_circuit(c, "swaps")


def test_final_measurements_allowed():
    c = Circuit(2)
    c.h(0)
    c.cx(0, 1)
    c.measure(0)
    c.measure(1)
    c.append("measure", (0,))  # trailing measure op is also fine
    ref = Circuit(2)
    ref.h(0)
    ref.cx(0, 1)
    assert EquivalenceChecker().check(c, ref).equivalent


def test_descending_cx_matrix_backend():
    # control above target (descending listed order) must match its SWAP
    # sandwich
    c1 = Circuit(2)
    c1.cx(1, 0)
    c2 = Circuit(2)
    c2.append("swap", (0, 1))
    c2.cx(0, 1)
    c2.append("swap", (0, 1))
    assert EquivalenceChecker().check(c1, c2).equivalent


def test_auto_representation_selects_by_qubit_count():
    small = Circuit(3)
    small.h(0)
    res = EquivalenceChecker().check(small, small)
    assert res.method == "matrix"
    wide = Circuit(9)
    wide.h(0)
    res = EquivalenceChecker().check(wide, wide)
    assert res.method == "mpo"


def test_matrix_max_qubits_override():
    c = Circuit(5)
    c.h(0)
    res = EquivalenceChecker(matrix_max_qubits=4).check(c, c)
    assert res.method == "mpo"
    res = EquivalenceChecker(matrix_max_qubits=5).check(c, c)
    assert res.method == "matrix"


def test_explicit_method_overrides_auto():
    c = Circuit(3)
    c.h(0)
    res = EquivalenceChecker().check(c, c, method="mpo")
    assert res.method == "mpo"
    assert res.equivalent


def test_unknown_method_raises():
    c = Circuit(2)
    with pytest.raises(ValueError, match="unknown method"):
        EquivalenceChecker().check(c, c, method="tensor")


def test_matrix_backend_returns_fidelity():
    c1 = Circuit(2)
    c1.h(0)
    c2 = Circuit(2)
    c2.h(0)
    c2.append("rz", (0,), params=(0.3,))
    res = EquivalenceChecker().check(c1, c2)
    assert not res.equivalent
    assert 0.0 <= res.fidelity < 1.0
    assert res.elapsed_time >= 0.0


def test_mpo_backend_returns_operator_diagnostics():
    length = 9
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for q in range(length - 1):
        c.cx(q, q + 1)
    res = EquivalenceChecker().check(c, c)
    assert res.method == "mpo"
    assert res.equivalent
    assert res.schmidt_values is not None
    assert res.entanglement_entropies is not None
    assert res.kept_weight is not None and res.kept_weight > 0.99
    assert res.bond_dim_used >= 1


def test_non_equivalent_pair_still_returns_diagnostics():
    length = 9
    c1 = Circuit(length)
    c1.h(0)
    c2 = Circuit(length)
    c2.h(0)
    c2.x(4)
    res = EquivalenceChecker().check(c1, c2)
    assert not res.equivalent
    assert res.fidelity < 0.9
    assert res.schmidt_values is not None


def test_qasm3_decidable_if_through_checker():
    """Round-5 QASM3 if-unrolling composes with the checker: a circuit whose
    if-branches are compile-time decidable is equivalent to its manual
    expansion."""
    from yaqs_tpu import EquivalenceChecker

    q3 = (
        "OPENQASM 3.0;\nqubit[3] q;\nbit[1] c;\n"
        "if (c == 0) { h q[0]; cx q[0], q[1]; }\n"
        "if (c == 1) { x q[2]; }\n"
        "cx q[1], q[2];\n"
    )
    q2 = (
        'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[3];\n'
        "h q[0];\ncx q[0],q[1];\ncx q[1],q[2];\n"
    )
    res = EquivalenceChecker().check(q3, q2)
    assert res.equivalent
    q2_different = (
        'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[3];\n'
        "h q[0];\ncx q[0],q[1];\nx q[2];\ncx q[1],q[2];\n"
    )
    assert not EquivalenceChecker().check(q3, q2_different).equivalent
