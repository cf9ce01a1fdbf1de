"""OpenQASM parser battery: the hand-written QASM2/QASM3 front end.

The reference delegates parsing to qiskit; this package ships its own parser
(digital/circuit.py — no qiskit in the image), which makes the parser itself
a first-class component needing reference-grade coverage (reference QASM
round-trip tests: tests/test_equivalence_checker.py:234-252, 538-626).
Oracles: hand-built Circuit objects compared gate-by-gate, and dense
statevectors via test_engine.run_dense for end-to-end programs.
"""

from __future__ import annotations

import numpy as np
import pytest

from test_engine import run_dense

from yaqs_tpu.digital.circuit import Circuit, load_circuit, parse_qasm2, parse_qasm3
from yaqs_tpu.models.gates import gate_matrix

HEADER = 'OPENQASM 2.0;\ninclude "qelib1.inc";\n'


def _ops(c: Circuit):
    return [(o.name, tuple(o.qubits), tuple(np.round(o.params, 12))) for o in c.ops]


# -- registers and indexing ----------------------------------------------------


def test_multiple_qregs_map_to_flat_offsets():
    c = parse_qasm2(HEADER + "qreg a[2];\nqreg b[3];\ncx a[1],b[0];\nx b[2];")
    assert c.num_qubits == 5
    assert _ops(c) == [("cx", (1, 2), ()), ("x", (4,), ())]


def test_unknown_register_raises():
    with pytest.raises(ValueError, match="unknown qreg"):
        parse_qasm2(HEADER + "qreg q[2];\nx r[0];")


def test_out_of_line_register_use_before_declaration_ok():
    """Registers are collected in a first pass, so a gate may textually
    precede a later qreg (matches qiskit's two-pass tolerance)."""
    c = parse_qasm2(HEADER + "qreg q[1];\nx q[0];\nqreg r[1];\ncx q[0],r[0];")
    assert c.num_qubits == 2
    assert _ops(c) == [("x", (0,), ()), ("cx", (0, 1), ())]


def test_duplicate_qubits_in_gate_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        parse_qasm2(HEADER + "qreg q[2];\ncx q[0],q[0];")


# -- broadcast ------------------------------------------------------------------


def test_whole_register_broadcast_1q():
    c = parse_qasm2(HEADER + "qreg q[3];\nh q;")
    assert _ops(c) == [("h", (0,), ()), ("h", (1,), ()), ("h", (2,), ())]


def test_register_register_broadcast_elementwise():
    c = parse_qasm2(HEADER + "qreg q[2];\nqreg r[2];\ncx q,r;")
    assert _ops(c) == [("cx", (0, 2), ()), ("cx", (1, 3), ())]


def test_scalar_register_broadcast_pins_scalar():
    c = parse_qasm2(HEADER + "qreg q[1];\nqreg r[2];\ncx q[0],r;")
    assert _ops(c) == [("cx", (0, 1), ()), ("cx", (0, 2), ())]


def test_mismatched_broadcast_sizes_raise():
    with pytest.raises(ValueError, match="mismatched register sizes"):
        parse_qasm2(HEADER + "qreg q[2];\nqreg r[3];\ncx q,r;")


# -- parameter expressions ------------------------------------------------------


@pytest.mark.parametrize(
    ("expr", "value"),
    [
        ("pi/2", np.pi / 2),
        ("-pi/4", -np.pi / 4),
        ("2*pi/3", 2 * np.pi / 3),
        ("pi*0.25", np.pi * 0.25),
        ("0.5e-1", 0.05),
        ("(pi+pi)/4", np.pi / 2),
        ("3.25", 3.25),
    ],
)
def test_parameter_expressions(expr, value):
    c = parse_qasm2(HEADER + f"qreg q[1];\nrz({expr}) q[0];")
    assert _ops(c)[0][0] == "rz"
    np.testing.assert_allclose(c.ops[0].params[0], value, atol=1e-12)


def test_multi_parameter_gate():
    c = parse_qasm2(HEADER + "qreg q[1];\nu3(pi/2,0,pi) q[0];")
    got = c.ops[0].resolved_matrix()
    h = gate_matrix("h", ())
    phase = got[0, 0] / h[0, 0]
    np.testing.assert_allclose(got, phase * h, atol=1e-12)


# -- user gate definitions ------------------------------------------------------


def test_gate_definition_with_params_and_nesting():
    src = HEADER + (
        "qreg q[2];\n"
        "gate mine(t) a { rz(t) a; h a; }\n"
        "gate outer(t) a, b { mine(t/2) a; cx a, b; mine(-t) b; }\n"
        "outer(pi/3) q[0], q[1];"
    )
    c = parse_qasm2(src)
    assert _ops(c) == [
        ("rz", (0,), (round(np.pi / 6, 12),)),
        ("h", (0,), ()),
        ("cx", (0, 1), ()),
        ("rz", (1,), (round(-np.pi / 3, 12),)),
        ("h", (1,), ()),
    ]


def test_gate_definition_arity_mismatch_raises():
    src = HEADER + "qreg q[2];\ngate mine a { h a; }\nmine q[0], q[1];"
    with pytest.raises(ValueError, match="arity"):
        parse_qasm2(src)


def test_gate_body_barrier_is_ignored():
    src = HEADER + "qreg q[1];\ngate mine a { h a; barrier a; h a; }\nmine q[0];"
    c = parse_qasm2(src)
    assert _ops(c) == [("h", (0,), ()), ("h", (0,), ())]


def test_custom_vs_expanded_statevector_equivalence():
    """A program through a user gate equals its hand-expanded circuit on a
    dense statevector (reference issue-regression pattern)."""
    src = HEADER + (
        "qreg q[3];\n"
        "gate entangle(t) a, b { h a; cx a, b; rz(t) b; }\n"
        "entangle(0.7) q[0], q[2];\n"
        "entangle(-0.3) q[1], q[0];"
    )
    parsed = parse_qasm2(src)
    manual = Circuit(3)
    manual.h(0); manual.cx(0, 2); manual.rz(2, params=(0.7,))
    manual.h(1); manual.cx(1, 0); manual.rz(0, params=(-0.3,))
    psi0 = np.zeros(8, dtype=complex); psi0[0] = 1.0
    np.testing.assert_allclose(
        run_dense(parsed, psi0), run_dense(manual, psi0), atol=1e-12
    )


# -- measure / barrier / unsupported -------------------------------------------


def test_measure_all_and_single():
    c = parse_qasm2(HEADER + "qreg q[3];\ncreg c[3];\nh q[0];\nmeasure q -> c;")
    assert c.measured_qubits == [0, 1, 2]
    c2 = parse_qasm2(HEADER + "qreg q[3];\ncreg c[1];\nmeasure q[1] -> c[0];")
    assert c2.measured_qubits == [1]


def test_barrier_recorded_not_gated():
    c = parse_qasm2(HEADER + "qreg q[2];\nh q[0];\nbarrier q;\nh q[1];")
    assert [o.name for o in c.ops] == ["h", "barrier", "h"]


@pytest.mark.parametrize("stmt", ["reset q[0];", "if(c==1) x q[0];", "opaque g q;"])
def test_non_unitary_statements_rejected(stmt):
    with pytest.raises(NotImplementedError, match="unsupported"):
        parse_qasm2(HEADER + "qreg q[1];\ncreg c[1];\n" + stmt)


def test_unknown_gate_raises():
    with pytest.raises(ValueError, match="unknown gate"):
        parse_qasm2(HEADER + "qreg q[1];\nfrobnicate q[0];")


def test_comments_stripped_everywhere():
    src = (
        "// leading comment\n" + HEADER
        + "qreg q[1]; // trailing\n// full line\nx q[0];"
    )
    assert _ops(parse_qasm2(src)) == [("x", (0,), ())]


# -- gate alias semantics --------------------------------------------------------


def test_cu1_is_controlled_phase():
    c = parse_qasm2(HEADER + "qreg q[2];\ncu1(0.9) q[0],q[1];")
    want = np.diag([1, 1, 1, np.exp(0.9j)])
    np.testing.assert_allclose(c.ops[0].resolved_matrix(), want, atol=1e-12)


def test_p_u1_phase_aliases_agree():
    mats = []
    for name in ("p", "u1", "phase"):
        c = parse_qasm2(HEADER + f"qreg q[1];\n{name}(0.4) q[0];")
        mats.append(c.ops[0].resolved_matrix())
    np.testing.assert_allclose(mats[0], mats[1], atol=1e-14)
    np.testing.assert_allclose(mats[0], mats[2], atol=1e-14)


def test_case_insensitive_gate_names():
    c = parse_qasm2(HEADER + "qreg q[1];\nH q[0];\nX q[0];")
    assert [o.name for o in c.ops] == ["h", "x"]


# -- QASM 3 subset ---------------------------------------------------------------


def test_qasm3_declarations_and_measure():
    src = (
        "OPENQASM 3.0;\n"
        "qubit[3] q;\n"
        "bit[3] c;\n"
        "h q[0];\n"
        "cx q[0], q[1];\n"
        "c = measure q;\n"
    )
    c = parse_qasm3(src)
    assert c.num_qubits == 3
    assert [o.name for o in c.ops if o.name != "measure"][:2] == ["h", "cx"]
    assert c.measured_qubits == [0, 1, 2]


@pytest.mark.parametrize(
    "stmt",
    ["while (true) { x q[0]; }", "def f() { }", "reset q[0];"],
)
def test_qasm3_unsupported_constructs_rejected(stmt):
    src = "OPENQASM 3.0;\nqubit[1] q;\nbit[1] c;\n" + stmt
    with pytest.raises((NotImplementedError, ValueError)):
        parse_qasm3(src)


def test_qasm3_reset_rejection_parity_with_reference():
    """`reset` is rejected here at parse; the reference rejects it in its DAG
    walk (_REJECTED_INSTRUCTIONS, dag_utils.py:49) — neither engine executes
    it, so rejection is the parity behavior."""
    with pytest.raises(NotImplementedError, match="reset"):
        parse_qasm3("OPENQASM 3.0;\nqubit[2] q;\nh q[0];\nreset q[0];\nh q[0];")


# -- QASM3 compile-time-decidable if -------------------------------------------
# Classical bits are 0-initialized and the execution model is terminal-
# measure-only, so an `if` on a never-measured register is statically
# decidable: the branch inlines or drops at parse time.  `if` on a measured
# register is genuine mid-circuit control flow and stays rejected.


def test_qasm3_if_on_zero_bit_inlines_body():
    src = (
        "OPENQASM 3.0;\nqubit[2] q;\nbit[2] c;\n"
        "if (c == 0) { h q[0]; cx q[0], q[1]; }\n"
    )
    c = parse_qasm3(src)
    assert [(o.name, tuple(o.qubits)) for o in c.ops] == [("h", (0,)), ("cx", (0, 1))]


def test_qasm3_if_on_nonzero_comparison_drops_body():
    src = "OPENQASM 3.0;\nqubit[1] q;\nbit[1] c;\nif (c == 1) { x q[0]; }\nh q[0];\n"
    c = parse_qasm3(src)
    assert [o.name for o in c.ops] == ["h"]


def test_qasm3_if_single_statement_form():
    src = "OPENQASM 3.0;\nqubit[1] q;\nbit[1] c;\nif (c[0] == 0) x q[0];\n"
    c = parse_qasm3(src)
    assert [o.name for o in c.ops] == ["x"]


def test_qasm3_if_bare_condition_is_falsy():
    src = "OPENQASM 3.0;\nqubit[1] q;\nbit[1] c;\nif (c) x q[0];\nh q[0];\n"
    assert [o.name for o in parse_qasm3(src).ops] == ["h"]


def test_qasm3_if_not_equal_forms():
    src = (
        "OPENQASM 3.0;\nqubit[1] q;\nbit[1] c;\n"
        "if (c != 0) x q[0];\nif (c != 1) h q[0];\n"
    )
    assert [o.name for o in parse_qasm3(src).ops] == ["h"]


def test_qasm3_if_on_measured_register_rejected():
    src = (
        "OPENQASM 3.0;\nqubit[1] q;\nbit[1] c;\n"
        "h q[0];\nc = measure q;\nif (c == 1) x q[0];\n"
    )
    with pytest.raises(NotImplementedError, match="measured classical register"):
        parse_qasm3(src)


def test_qasm3_if_on_other_unmeasured_register_still_decides():
    src = (
        "OPENQASM 3.0;\nqubit[2] q;\nbit[1] c;\nbit[1] d;\n"
        "h q[0];\nc = measure q[0];\nif (d == 0) x q[1];\n"
    )
    c = parse_qasm3(src)
    assert [o.name for o in c.ops if o.name != "measure"] == ["h", "x"]


def test_qasm3_else_rejected():
    src = (
        "OPENQASM 3.0;\nqubit[1] q;\nbit[1] c;\n"
        "if (c == 0) { x q[0]; } else { h q[0]; }\n"
    )
    with pytest.raises(NotImplementedError, match="else"):
        parse_qasm3(src)


def test_qasm3_if_body_with_for_loop_unrolls():
    src = (
        "OPENQASM 3.0;\nqubit[3] q;\nbit[1] c;\n"
        "if (c == 0) { for int i in [0:2] { h q[i]; } }\n"
    )
    c = parse_qasm3(src)
    assert [(o.name, tuple(o.qubits)) for o in c.ops] == [
        ("h", (0,)), ("h", (1,)), ("h", (2,)),
    ]


# -- QASM3 for-loop unrolling ---------------------------------------------------
# OpenQASM 3 `for` over literal integer ranges/sets is unrolled at parse time
# (reference route: qiskit's qasm3 importer, qasm_utils.py:133). Ranges are
# inclusive of the stop value per the OpenQASM 3 spec.

Q3HEADER = 'OPENQASM 3.0;\ninclude "stdgates.inc";\n'


def test_qasm3_for_brickwork_matches_unrolled_qasm2():
    """A looped brickwork circuit must match its hand-unrolled QASM2 twin
    (round-3 VERDICT item 9's battery case), checked on the dense oracle."""
    n = 6
    q3 = Q3HEADER + (
        f"qubit[{n}] q;\n"
        f"for uint i in [0:{n - 1}] h q[i];\n"
        "for int l in [0:1] {\n"
        f"  for int i in [0:2:{n - 2}] {{ cx q[i], q[i+1]; }}\n"
        f"  for int i in [1:2:{n - 3}] {{ cx q[i], q[i+1]; }}\n"
        f"  for int i in [0:{n - 1}] {{ rz(0.3*(i+1)) q[i]; }}\n"
        "}\n"
    )
    lines = [f"qreg q[{n}];"]
    lines += [f"h q[{i}];" for i in range(n)]
    for _ in range(2):
        lines += [f"cx q[{i}],q[{i + 1}];" for i in range(0, n - 1, 2)]
        lines += [f"cx q[{i}],q[{i + 1}];" for i in range(1, n - 2, 2)]
        lines += [f"rz({0.3 * (i + 1)!r}) q[{i}];" for i in range(n)]
    q2 = HEADER + "\n".join(lines)
    c3, c2 = parse_qasm3(q3), parse_qasm2(q2)
    assert _ops(c3) == _ops(c2)
    psi0 = np.zeros(2**n, dtype=complex)
    psi0[0] = 1.0
    np.testing.assert_allclose(run_dense(c3, psi0), run_dense(c2, psi0), atol=1e-12)


def test_qasm3_for_range_is_stop_inclusive():
    c = parse_qasm3(Q3HEADER + "qubit[4] q;\nfor int i in [0:3] x q[i];")
    assert _ops(c) == [("x", (i,), ()) for i in range(4)]


def test_qasm3_for_range_with_step():
    c = parse_qasm3(Q3HEADER + "qubit[5] q;\nfor int i in [0:2:4] x q[i];")
    assert _ops(c) == [("x", (0,), ()), ("x", (2,), ()), ("x", (4,), ())]


def test_qasm3_for_negative_step():
    c = parse_qasm3(Q3HEADER + "qubit[4] q;\nfor int i in [3:-1:1] x q[i];")
    assert _ops(c) == [("x", (3,), ()), ("x", (2,), ()), ("x", (1,), ())]


def test_qasm3_for_discrete_set():
    c = parse_qasm3(Q3HEADER + "qubit[5] q;\nfor int k in {4, 0, 2} x q[k];")
    assert _ops(c) == [("x", (4,), ()), ("x", (0,), ()), ("x", (2,), ())]


def test_qasm3_for_loop_var_in_parameter_expression():
    """QFT-style controlled-phase cascade: the loop variable feeds the angle."""
    c = parse_qasm3(
        Q3HEADER + "qubit[4] q;\nfor int i in [1:3] { cp(pi/2**i) q[0], q[i]; }"
    )
    assert [(o.name, o.qubits) for o in c.ops] == [
        ("cp", (0, 1)), ("cp", (0, 2)), ("cp", (0, 3))
    ]
    np.testing.assert_allclose(
        [o.params[0] for o in c.ops], [np.pi / 2, np.pi / 4, np.pi / 8], atol=1e-12
    )


def test_qasm3_for_nested_with_index_arithmetic():
    c = parse_qasm3(
        Q3HEADER
        + "qubit[6] q;\nfor int a in [0:1] { for int b in [0:1] { cx q[2*a+b], q[2*a+b+1]; } }"
    )
    assert [(o.name, o.qubits) for o in c.ops] == [
        ("cx", (0, 1)), ("cx", (1, 2)), ("cx", (2, 3)), ("cx", (3, 4))
    ]


def test_qasm3_for_body_set_with_braced_block():
    c = parse_qasm3(Q3HEADER + "qubit[3] q;\nfor int k in {0, 2} { h q[k]; t q[k]; }")
    assert _ops(c) == [
        ("h", (0,), ()), ("t", (0,), ()), ("h", (2,), ()), ("t", (2,), ())
    ]


def test_qasm3_for_empty_range_emits_nothing():
    c = parse_qasm3(Q3HEADER + "qubit[2] q;\nfor int i in [1:0] x q[i];\nh q[0];")
    assert _ops(c) == [("h", (0,), ())]


@pytest.mark.parametrize(
    ("stmt", "match"),
    [
        ("for int i in [0:n] x q[0];", "literal integer"),
        ("for int i in [0:1:2:3] x q[0];", "range"),
        ("for int i in [0:0:3] x q[0];", "step"),
        ("for q_iter in [0:2] x q[0];", "for statement"),
    ],
)
def test_qasm3_for_malformed_rejected(stmt, match):
    src = "OPENQASM 3.0;\nqubit[2] q;\nint n = 2;\n" + stmt
    with pytest.raises((NotImplementedError, ValueError), match=match):
        parse_qasm3(src)


def test_load_circuit_dispatch_and_passthrough():
    q2 = HEADER + "qreg q[1];\nx q[0];"
    q3 = "OPENQASM 3.0;\nqubit[1] q;\nx q[0];"
    assert _ops(load_circuit(q2)) == [("x", (0,), ())]
    assert _ops(load_circuit(q3)) == [("x", (0,), ())]
    circ = Circuit(2).h(0)
    assert load_circuit(circ) is circ


def test_qasm2_end_to_end_statevector():
    """A representative program (superposition, entanglement, rotations,
    broadcast, user gate) against the dense oracle built by hand."""
    src = HEADER + (
        "qreg q[4];\n"
        "gate prep a { h a; t a; }\n"
        "prep q[0];\n"
        "h q;\n"
        "cx q[0],q[3];\n"
        "rzz(0.5) q[1],q[2];\n"
        "u3(0.3,0.2,0.1) q[2];\n"
    )
    parsed = parse_qasm2(src)
    manual = Circuit(4)
    manual.h(0); manual.t(0)
    for i in range(4):
        manual.h(i)
    manual.cx(0, 3)
    manual.append("rzz", (1, 2), params=(0.5,))
    manual.append("u", (2,), params=(0.3, 0.2, 0.1))
    psi0 = np.zeros(16, dtype=complex); psi0[0] = 1.0
    np.testing.assert_allclose(
        run_dense(parsed, psi0), run_dense(manual, psi0), atol=1e-12
    )
