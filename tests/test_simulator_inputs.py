"""Simulator input-mode acceptance and rejection contracts.

Mirrors the reference's Simulator.run input matrix (tests/test_simulator.py:
QASM path/str/raw-string acceptance for shots and observables, operator/
initial-state type rejections, matrix-Hamiltonian acceptance with an MPS
state) against the yaqs_tpu facade.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from yaqs_tpu import (
    AnalogSimParams,
    DigitalSimParams,
    Hamiltonian,
    Observable,
    Simulator,
    State,
)

QASM2 = """
OPENQASM 2.0;
include "qelib1.inc";
qreg q[3];
creg c[3];
h q[0];
cx q[0],q[1];
cx q[1],q[2];
measure q -> c;
"""

QASM3 = """
OPENQASM 3.0;
include "stdgates.inc";
qubit[3] q;
bit[3] c;
h q[0];
cx q[0], q[1];
cx q[1], q[2];
c = measure q;
"""


def _shots_params(**kw):
    return DigitalSimParams(shots=256, num_traj=1, max_bond_dim=8, random_seed=7, **kw)


def _obs_params(**kw):
    return DigitalSimParams(
        observables=[Observable("z", i) for i in range(3)],
        shots=0,
        num_traj=1,
        max_bond_dim=8,
        random_seed=7,
        **kw,
    )


def _ghz_counts_ok(counts: dict) -> None:
    # GHZ: only |000> and |111>
    assert set(counts) <= {0, 7}
    assert sum(counts.values()) == 256


def test_qasm2_path_object(tmp_path: Path) -> None:
    p = tmp_path / "ghz.qasm"
    p.write_text(QASM2)
    res = Simulator().run(State(3), p, _shots_params(), None)
    _ghz_counts_ok(res.counts)


def test_qasm2_str_path(tmp_path: Path) -> None:
    p = tmp_path / "ghz.qasm"
    p.write_text(QASM2)
    res = Simulator().run(State(3), str(p), _shots_params(), None)
    _ghz_counts_ok(res.counts)


def test_qasm2_raw_string() -> None:
    res = Simulator().run(State(3), QASM2, _shots_params(), None)
    _ghz_counts_ok(res.counts)


def test_qasm3_path_object(tmp_path: Path) -> None:
    p = tmp_path / "ghz3.qasm"
    p.write_text(QASM3)
    res = Simulator().run(State(3), p, _shots_params(), None)
    _ghz_counts_ok(res.counts)


def test_qasm3_raw_string_shots() -> None:
    res = Simulator().run(State(3), QASM3, _shots_params(), None)
    _ghz_counts_ok(res.counts)


def test_qasm_path_and_string_observables_match(tmp_path: Path) -> None:
    p = tmp_path / "ghz.qasm"
    p.write_text(QASM2)
    r_path = Simulator().run(State(3), p, _obs_params(), None)
    r_str = Simulator().run(State(3), QASM2, _obs_params(), None)
    np.testing.assert_allclose(
        r_path.expectation_values, r_str.expectation_values, atol=1e-12
    )
    # GHZ has <Z_i> = 0 on every qubit
    np.testing.assert_allclose(r_path.expectation_values[:, -1], 0.0, atol=1e-8)


def test_qasm3_observables_match_qasm2() -> None:
    r2 = Simulator().run(State(3), QASM2, _obs_params(), None)
    r3 = Simulator().run(State(3), QASM3, _obs_params(), None)
    np.testing.assert_allclose(
        r2.expectation_values, r3.expectation_values, atol=1e-12
    )


def test_analog_rejects_str_operator() -> None:
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.1, dt=0.1
    )
    with pytest.raises(TypeError):
        Simulator().run(State(2), "OPENQASM 2.0;", params, None)


def test_analog_rejects_non_state_initial_state() -> None:
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.1, dt=0.1
    )
    with pytest.raises(TypeError):
        Simulator().run(np.zeros(4), Hamiltonian.ising(2), params, None)


def test_circuit_rejects_state_list() -> None:
    with pytest.raises(TypeError):
        Simulator().run([State(3), State(3)], QASM2, _shots_params(), None)


def test_circuit_rejects_non_circuit_operator() -> None:
    with pytest.raises(TypeError):
        Simulator().run(State(3), 12345, _shots_params(), None)


def test_circuit_rejects_non_state_initial_state() -> None:
    with pytest.raises(TypeError):
        Simulator().run("not-a-state", QASM2, _shots_params(), None)


def test_matrix_hamiltonian_with_mps_state_matches_mpo() -> None:
    """A dense-matrix Hamiltonian with an MPS-representation State must run
    through the TJM and agree with the factory-MPO run (reference
    test_analog_run_accepts_matrix_hamiltonian_with_mps_state)."""
    L = 3
    ham_mpo = Hamiltonian.ising(L, 1.0, 0.5)
    ham_mat = Hamiltonian.from_matrix(ham_mpo.ensure_matrix(), length=L)
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=0.2,
        dt=0.1,
        max_bond_dim=8,
        svd_threshold=1e-12,
        random_seed=0,
    )
    r_mat = Simulator().run(State(L, state="x+"), ham_mat, params, None)
    r_mpo = Simulator().run(State(L, state="x+"), ham_mpo, params, None)
    np.testing.assert_allclose(
        r_mat.expectation_values, r_mpo.expectation_values, atol=1e-8
    )
