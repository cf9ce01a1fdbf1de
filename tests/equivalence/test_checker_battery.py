"""Equivalence-checker breadth battery.

Mirrors the input-handling, backend-selection, gate-coverage, and
diagnostics cases of the reference suite
(/root/reference/tests/test_equivalence_checker.py) against this package's
checker.  Verdicts are oracle-backed: every fidelity asserted here is also
computable densely (n <= 8), and the dense value is the pin.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.digital.circuit import Circuit, load_circuit
from yaqs_tpu.equivalence import EquivalenceChecker
from yaqs_tpu.models.gates import gate_matrix

QASM2_HEADER = 'OPENQASM 2.0;\ninclude "qelib1.inc";\n'
QASM3_HEADER = 'OPENQASM 3.0;\ninclude "stdgates.inc";\n'


def _bell_qasm2(n: int = 3, measure: bool = False) -> str:
    lines = [QASM2_HEADER + f"qreg q[{n}];"]
    if measure:
        lines.append(f"creg c[{n}];")
    lines += ["h q[0];", "cx q[0],q[1];"]
    if measure:
        lines.append("measure q -> c;")
    return "\n".join(lines) + "\n"


def _bell_qasm3(n: int = 3) -> str:
    return QASM3_HEADER + f"qubit[{n}] q;\nh q[0];\ncx q[0], q[1];\n"


def _dense_unitary(circ: Circuit) -> np.ndarray:
    return EquivalenceChecker._circuit_unitary(circ)


def _dense_fidelity(c1: Circuit, c2: Circuit) -> float:
    u1, u2 = _dense_unitary(c1), _dense_unitary(c2)
    return abs(np.trace(u2.conj().T @ u1)) / u1.shape[0]


# ---------------------------------------------------------------------------
# Input handling: QASM2/QASM3 as Path, str path, raw string, and mixed pairs
# (reference test_check_accepts_qasm2_path_object .. _mixed_*, lines 538-626)
# ---------------------------------------------------------------------------


def test_check_accepts_qasm2_path_object(tmp_path):
    p = tmp_path / "bell.qasm"
    p.write_text(_bell_qasm2())
    res = EquivalenceChecker().check(p, _bell_qasm2())
    assert res.equivalent
    np.testing.assert_allclose(res.fidelity, 1.0, atol=1e-12)


def test_check_accepts_qasm2_str_path(tmp_path):
    p = tmp_path / "bell.qasm"
    p.write_text(_bell_qasm2())
    res = EquivalenceChecker().check(str(p), _bell_qasm2())
    assert res.equivalent


def test_check_accepts_qasm3_path_object(tmp_path):
    p = tmp_path / "bell3.qasm"
    p.write_text(_bell_qasm3())
    res = EquivalenceChecker().check(p, _bell_qasm3())
    assert res.equivalent


def test_check_accepts_qasm3_raw_string():
    res = EquivalenceChecker().check(_bell_qasm3(), _bell_qasm3())
    assert res.equivalent


def test_check_qasm2_vs_qasm3_same_circuit():
    # the two dialects describe the same unitary -> equivalent
    res = EquivalenceChecker().check(_bell_qasm2(), _bell_qasm3())
    assert res.equivalent, res.fidelity


def test_check_mixed_qasm_path_and_circuit(tmp_path):
    p = tmp_path / "bell.qasm"
    p.write_text(_bell_qasm2())
    c = Circuit(3).h(0).cx(0, 1)
    res = EquivalenceChecker().check(p, c)
    assert res.equivalent
    res2 = EquivalenceChecker().check(c, str(p))
    assert res2.equivalent


def test_check_qasm3_for_loop_vs_unrolled_qasm2():
    """QASM3 literal-range for loops unroll to the same unitary as the
    hand-unrolled QASM2 twin (reference qasm3-import route)."""
    n = 5
    q3 = QASM3_HEADER + f"qubit[{n}] q;\n"
    q3 += f"for int i in [0:{n - 1}] h q[i];\n"
    q3 += f"for int i in [0:{n - 2}] cx q[i], q[i + 1];\n"
    q2 = QASM2_HEADER + f"qreg q[{n}];\n"
    q2 += "".join(f"h q[{i}];\n" for i in range(n))
    q2 += "".join(f"cx q[{i}],q[{i + 1}];\n" for i in range(n - 1))
    res = EquivalenceChecker().check(q3, q2)
    assert res.equivalent, res.fidelity


def test_load_circuit_rejects_unknown_type():
    with pytest.raises(TypeError, match="cannot load circuit"):
        load_circuit(12345)


# ---------------------------------------------------------------------------
# Measurement handling (reference lines 234-241, 281-332)
# ---------------------------------------------------------------------------


def test_self_equivalence_with_final_measurements():
    # final measurements are stripped on both sides before comparison
    res = EquivalenceChecker().check(_bell_qasm2(measure=True), _bell_qasm2())
    assert res.equivalent
    res2 = EquivalenceChecker().check(
        _bell_qasm2(measure=True), _bell_qasm2(measure=True)
    )
    assert res2.equivalent


def test_rejects_mid_circuit_measurements():
    qasm = (
        QASM2_HEADER
        + "qreg q[2];\ncreg c[2];\nh q[0];\nmeasure q[0] -> c[0];\nx q[1];\n"
    )
    with pytest.raises(ValueError, match="mid-circuit"):
        EquivalenceChecker().check(qasm, _bell_qasm2(2))


def test_rejects_mid_circuit_measurement_on_second_circuit():
    c1 = Circuit(2).h(0)
    c2 = Circuit(2).h(0)
    c2.measure(0)
    c2.x(1)
    with pytest.raises(ValueError, match="mid-circuit"):
        EquivalenceChecker().check(c1, c2)


def test_trailing_measurements_after_barrier_still_stripped():
    c1 = Circuit(2).h(0).cx(0, 1)
    c2 = Circuit(2).h(0).cx(0, 1)
    c2.barrier()
    c2.measure(0)
    c2.measure(1)
    res = EquivalenceChecker().check(c1, c2)
    assert res.equivalent


# ---------------------------------------------------------------------------
# Backend selection (reference lines 399-434)
# ---------------------------------------------------------------------------


def test_auto_representation_selects_by_qubit_count():
    small = Circuit(7).h(0)
    large = Circuit(8).h(0)
    assert EquivalenceChecker().check(small, small).method == "matrix"
    assert EquivalenceChecker().check(large, large).method == "mpo"


def test_matrix_max_qubits_override():
    c = Circuit(9).h(0).cx(0, 1)
    res = EquivalenceChecker(matrix_max_qubits=10).check(c, c)
    assert res.method == "matrix"
    assert res.equivalent
    res2 = EquivalenceChecker(matrix_max_qubits=3).check(
        Circuit(4).h(0), Circuit(4).h(0)
    )
    assert res2.method == "mpo"


def test_unknown_method_raises():
    c = Circuit(2).h(0)
    with pytest.raises(ValueError, match="unknown method"):
        EquivalenceChecker().check(c, c, method="tensor")


def test_matrix_backend_supports_three_qubit_gates():
    # reference test_matrix_backend_supports_multi_qubit_gates (line 386)
    c1 = Circuit(3)
    c1.ccx(0, 1, 2)
    c2 = Circuit(3)
    # ccx = h(t) ccz h(t)
    c2.h(2)
    c2.append("ccz", (0, 1, 2))
    c2.h(2)
    res = EquivalenceChecker().check(c1, c2, method="matrix")
    assert res.equivalent, res.fidelity


# ---------------------------------------------------------------------------
# Gate coverage: u1/u3/ecr and descending-control cx
# (reference lines 252-279, 299-316)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("gate_name", ["u1", "u2", "u3", "ecr", "sx", "sxdg"])
def test_extended_gate_self_equivalence(gate_name):
    nparams = {"u1": 1, "u2": 2, "u3": 3, "ecr": 0, "sx": 0, "sxdg": 0}[gate_name]
    nq = 2 if gate_name == "ecr" else 1
    params = tuple(0.3 + 0.2 * k for k in range(nparams))
    c = Circuit(3)
    sites = (0, 1) if nq == 2 else (1,)
    c.append(gate_name, sites, params=params)
    c.cx(1, 2)
    res = EquivalenceChecker().check(c, c)
    assert res.equivalent
    # and the gate is genuinely non-identity: dropping it must be detected
    c2 = Circuit(3).cx(1, 2)
    res2 = EquivalenceChecker().check(c, c2)
    assert not res2.equivalent, (gate_name, res2.fidelity)


def test_u3_decomposition_equivalence():
    """u3(theta, phi, lam) == rz(phi) ry(theta) rz(lam) up to global phase."""
    theta, phi, lam = 0.7, -0.4, 1.1
    c1 = Circuit(2)
    c1.append("u3", (0,), params=(theta, phi, lam))
    c2 = Circuit(2)
    c2.rz(0, params=(lam,))
    c2.ry(0, params=(theta,))
    c2.rz(0, params=(phi,))
    res = EquivalenceChecker().check(c1, c2)
    assert res.equivalent, res.fidelity


def test_matrix_backend_descending_cx_equivalence():
    # control above target (q1 -> q0): ordering must not be silently swapped
    c1 = Circuit(2)
    c1.cx(1, 0)
    c2 = Circuit(2)
    c2.h(0)
    c2.h(1)
    c2.cx(0, 1)
    c2.h(0)
    c2.h(1)
    res = EquivalenceChecker().check(c1, c2)
    assert res.equivalent, res.fidelity
    # against the plain ascending cx it must NOT be equivalent
    c3 = Circuit(2)
    c3.cx(0, 1)
    assert not EquivalenceChecker().check(c1, c3).equivalent


def test_descending_cx_equivalence_mpo_backend():
    n = 8  # force the mpo path
    c1 = Circuit(n)
    c1.cx(5, 2)
    c2 = Circuit(n)
    for q in (2, 5):
        c2.h(q)
    c2.cx(2, 5)
    for q in (2, 5):
        c2.h(q)
    res = EquivalenceChecker().check(c1, c2, max_bond_dim=16)
    assert res.method == "mpo"
    assert res.equivalent, res.fidelity


# ---------------------------------------------------------------------------
# Verdict + diagnostics contracts (reference lines 42-140, 649-720)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    ("threshold", "angle", "expect_equiv"),
    [
        (1e-6, 0.0, True),
        (1e-6, 0.3, False),
        (0.5, 0.3, True),  # loose threshold admits the small rotation
        (1e-13, 1e-8, True),  # fidelity error is O(angle^2) ~ 1e-16
    ],
)
def test_threshold_fidelity_matrix(threshold, angle, expect_equiv):
    c1 = Circuit(2).h(0).cx(0, 1)
    c2 = Circuit(2).h(0).cx(0, 1)
    if angle:
        c2.rz(0, params=(angle,))
    res = EquivalenceChecker().check(c1, c2, threshold=threshold)
    assert res.equivalent is expect_equiv, (res.fidelity, threshold)
    # the fidelity itself must match the dense oracle
    np.testing.assert_allclose(res.fidelity, _dense_fidelity(c1, c2), atol=1e-12)


def test_long_range_equivalence_and_non_equivalence():
    # reference test_long_range_equivalence / _non_equivalence (lines 102-140)
    n = 9
    c1 = Circuit(n)
    c1.h(0)
    c1.cx(0, n - 1)
    c2 = Circuit(n)
    c2.h(0)
    c2.cx(0, n - 1)
    res = EquivalenceChecker().check(c1, c2, max_bond_dim=16)
    assert res.method == "mpo"
    assert res.equivalent
    c3 = Circuit(n)
    c3.h(0)
    c3.cx(0, n - 2)
    res2 = EquivalenceChecker().check(c1, c3, max_bond_dim=16)
    assert not res2.equivalent


def test_non_equivalent_pair_still_returns_diagnostics():
    # diagnostics (schmidt spectra, entropies, kept weight) are populated on
    # the mpo path even when the verdict is negative
    n = 8
    c1 = Circuit(n)
    c2 = Circuit(n)
    for q in range(n):
        c1.ry(q, params=(0.2,))
        c2.ry(q, params=(0.2,))
    c2.x(4)
    res = EquivalenceChecker().check(c1, c2, max_bond_dim=16)
    assert res.method == "mpo"
    assert not res.equivalent
    assert res.schmidt_values is not None
    assert res.entanglement_entropies.shape == (n - 1,)
    assert np.all(np.isfinite(res.entanglement_entropies))
    assert 0.0 <= res.kept_weight <= 1.0 + 1e-12
    assert res.bond_dim_used >= 16
    assert res.elapsed_time >= 0.0


def test_identity_circuit_operator_diagnostics_trivial():
    # U^dag U = I is a product operator: zero operator entanglement on all cuts
    n = 8
    c = Circuit(n)
    for q in range(n):
        c.ry(q, params=(0.1 * (q + 1),))
    for q in range(n - 1):
        c.cx(q, q + 1)
    res = EquivalenceChecker().check(c, c, max_bond_dim=32)
    assert res.equivalent
    np.testing.assert_allclose(res.entanglement_entropies, 0.0, atol=1e-7)


def test_mpo_fidelity_matches_dense_oracle_nonequivalent():
    """The mpo backend's fidelity is |Tr(U2^dag U1)|/2^n exactly (no
    truncation at these widths) — pin it against the dense contraction for a
    structurally different pair, not just a rotation perturbation."""
    n = 6
    rng = np.random.default_rng(7)
    c1 = Circuit(n)
    c2 = Circuit(n)
    for c, seed in ((c1, 1), (c2, 2)):
        r = np.random.default_rng(seed)
        for q in range(n):
            c.ry(q, params=(float(r.uniform(0, np.pi)),))
        for q in range(n - 1):
            c.cx(q, q + 1)
        for q in range(n):
            c.rz(q, params=(float(r.uniform(0, np.pi)),))
    del rng
    fid_dense = _dense_fidelity(c1, c2)
    res = EquivalenceChecker().check(c1, c2, method="mpo", max_bond_dim=64)
    np.testing.assert_allclose(res.fidelity, fid_dense, atol=1e-8)


def test_empty_circuits_are_equivalent():
    res = EquivalenceChecker().check(Circuit(3), Circuit(3))
    assert res.equivalent
    np.testing.assert_allclose(res.fidelity, 1.0, atol=1e-12)
    res_mpo = EquivalenceChecker().check(
        Circuit(3), Circuit(3), method="mpo", max_bond_dim=4
    )
    assert res_mpo.equivalent


def test_gate_matrix_oracle_consistency():
    """The checker's dense backend and the gate library agree: a one-gate
    circuit's unitary is the library matrix embedded at the site."""
    for name, sites, params in [
        ("ry", (0,), (0.4,)),
        ("cp", (0, 1), (0.7,)),
        ("ecr", (0, 1), ()),
    ]:
        c = Circuit(2)
        c.append(name, sites, params=params)
        u = _dense_unitary(c)
        g = gate_matrix(name, params)
        if len(sites) == 1:
            expect = np.kron(np.eye(2), g)  # little-endian: site 0 is LSB
            if not np.allclose(u, expect, atol=1e-12):
                expect = np.kron(g, np.eye(2))
            np.testing.assert_allclose(u, expect, atol=1e-12)
        else:
            assert u.shape == (4, 4)
            np.testing.assert_allclose(
                abs(np.trace(u.conj().T @ u)), 4.0, atol=1e-12
            )
