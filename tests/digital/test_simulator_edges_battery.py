"""Simulator-level digital edge battery.

Mirrors the via-Simulator edge cases of the reference digital TJM suite
(/root/reference/tests/digital/test_digital_tjm.py:1680-2100): combined
observables+shots runs, get_state with shots, mid-measurement column
contracts with mixed barrier kinds, output validation, and cross-gate-mode
agreement.  All values are pinned against dense statevector oracles.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import DigitalSimParams, Observable, Simulator, State
from yaqs_tpu.digital.circuit import Circuit
from yaqs_tpu.models.gates import gate_matrix

LENGTH = 3


def _dense_state(circ: Circuit) -> np.ndarray:
    """Little-endian dense statevector of the circuit from |0...0>."""
    n = circ.num_qubits
    psi = np.zeros(2**n, dtype=complex)
    psi[0] = 1.0
    for op in circ.ops:
        if op.name in {"barrier", "measure"}:
            continue
        g = op.matrix if op.matrix is not None else gate_matrix(op.name, op.params)
        psi = _apply_dense(psi, g, op.qubits, n)
    return psi


def _apply_dense(psi, g, qubits, n):
    t = psi.reshape([2] * n)
    k = len(qubits)
    axes = [n - 1 - q for q in qubits]  # state index order: site 0 = LSB
    t = np.moveaxis(t, axes, range(k))
    t = (g.reshape([2] * (2 * k)).reshape(2**k, 2**k) @ t.reshape(2**k, -1)).reshape(
        [2] * n
    )
    return np.moveaxis(t, range(k), axes).reshape(-1)


def _zexp(psi: np.ndarray, site: int, n: int) -> float:
    p = np.abs(psi) ** 2
    idx = np.arange(2**n)
    signs = 1 - 2 * ((idx >> site) & 1)
    return float(np.sum(p * signs))


def _ghz(n: int) -> Circuit:
    c = Circuit(n)
    c.h(0)
    for q in range(n - 1):
        c.cx(q, q + 1)
    return c


# ---------------------------------------------------------------------------
# Combined outputs (reference test_digital_tjm_observables_and_shots_*,
# test_shots_noiseless_get_state_returns_mps)
# ---------------------------------------------------------------------------


def test_observables_and_shots_together():
    c = _ghz(LENGTH)
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(LENGTH)],
        shots=64,
        max_bond_dim=8,
        random_seed=3,
    )
    res = Simulator().run(State(LENGTH), c, params, None)
    psi = _dense_state(c)
    for i in range(LENGTH):
        np.testing.assert_allclose(
            res.expectation_values[i, -1], _zexp(psi, i, LENGTH), atol=1e-8
        )
    assert res.counts is not None
    assert sum(res.counts.values()) == 64
    assert set(res.counts) <= {0, 2**LENGTH - 1}


def test_shots_noiseless_get_state_returns_mps():
    c = _ghz(2)
    params = DigitalSimParams(shots=4, max_bond_dim=4, random_seed=0, get_state=True)
    res = Simulator().run(State(2), c, params, None)
    assert res.counts is not None
    assert sum(res.counts.values()) == 4
    assert res.output_state is not None
    vec = np.asarray(res.output_state.to_vector()).reshape(-1)
    psi = _dense_state(c)
    overlap = abs(np.vdot(vec, psi))
    np.testing.assert_allclose(overlap, 1.0, atol=1e-8)


def test_get_state_only_no_observables_no_shots():
    c = Circuit(2).h(0).rz(1, params=(0.4,))
    params = DigitalSimParams(get_state=True, max_bond_dim=4, random_seed=0)
    res = Simulator().run(State(2), c, params, None)
    assert res.output_state is not None
    vec = np.asarray(res.output_state.to_vector()).reshape(-1)
    np.testing.assert_allclose(abs(np.vdot(vec, _dense_state(c))), 1.0, atol=1e-8)


def test_no_output_specified_raises():
    # reference simulator.py:610 — no observables, no shots, no get_state
    c = Circuit(2).h(0)
    with pytest.raises(ValueError):
        Simulator().run(State(2), c, DigitalSimParams(max_bond_dim=4), None)


# ---------------------------------------------------------------------------
# Mid-measurement column contracts (reference
# test_no_mid_measurements_results_have_two_columns,
# test_counts_multiple_mid_measurement_barriers,
# test_ignores_non_mid_barriers_and_handles_measures)
# ---------------------------------------------------------------------------


def _z_params(n: int, **kw) -> DigitalSimParams:
    return DigitalSimParams(
        observables=[Observable("z", i) for i in range(n)],
        max_bond_dim=8,
        sample_layers=True,
        random_seed=0,
        **kw,
    )


def test_no_mid_barriers_results_have_two_columns():
    c = Circuit(LENGTH).x(0).x(1)
    res = Simulator().run(State(LENGTH), c, _z_params(LENGTH), None)
    assert np.asarray(res.expectation_values).shape == (LENGTH, 2)
    np.testing.assert_allclose(
        np.asarray(res.expectation_values)[:, 0], [1, 1, 1], atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.expectation_values)[:, 1], [-1, -1, 1], atol=1e-10
    )


def test_multiple_mid_barriers_column_values_match_dense_prefixes():
    n = 3
    c = Circuit(n)
    c.x(0)
    c.sample_observables()
    c.h(1)
    c.cx(1, 2)
    c.sample_observables()
    c.x(0)
    res = Simulator().run(State(n), c, _z_params(n), None)
    vals = np.asarray(res.expectation_values)
    assert vals.shape == (n, 4)
    # prefix oracles
    prefixes = [
        Circuit(n),
        Circuit(n).x(0),
        Circuit(n).x(0).h(1).cx(1, 2),
        Circuit(n).x(0).h(1).cx(1, 2).x(0),
    ]
    for col, pc in enumerate(prefixes):
        psi = _dense_state(pc)
        for i in range(n):
            np.testing.assert_allclose(
                vals[i, col], _zexp(psi, i, n), atol=1e-8, err_msg=f"col {col} site {i}"
            )


def test_unlabeled_and_foreign_barriers_do_not_sample():
    n = 2
    c = Circuit(n)
    c.x(0)
    c.barrier()  # plain barrier: no sampling column
    c.barrier("SOMETHING_ELSE")
    c.x(1)
    res = Simulator().run(State(n), c, _z_params(n), None)
    assert np.asarray(res.expectation_values).shape == (n, 2)


def test_mid_barriers_with_final_measurements_and_shots():
    # barriers + terminal measure + shots all in one circuit
    n = 3
    c = Circuit(n)
    c.x(0)
    c.sample_observables()
    c.cx(0, 1)
    c.measure()
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(n)],
        shots=32,
        max_bond_dim=8,
        sample_layers=True,
        random_seed=1,
    )
    res = Simulator().run(State(n), c, params, None)
    vals = np.asarray(res.expectation_values)
    assert vals.shape == (n, 3)
    np.testing.assert_allclose(vals[:, -1], [-1, -1, 1], atol=1e-10)
    assert res.counts == {0b011: 32}


# ---------------------------------------------------------------------------
# Gate-mode agreement on a NN circuit (reference
# test_nearest_neighbor_gate_modes_agree, test_ccx_statevector_vs_qiskit)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("gate_mode", ["swaps", "tdvp", "full-tdvp", "mpo"])
def test_nearest_neighbor_gate_modes_agree(gate_mode):
    n = 4
    c = Circuit(n)
    for q in range(n):
        c.ry(q, params=(0.2 + 0.1 * q,))
    for q in range(n - 1):
        c.cx(q, q + 1)
    for q in range(n):
        c.rz(q, params=(0.3,))
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(n)],
        max_bond_dim=16,
        gate_mode=gate_mode,
        random_seed=0,
    )
    res = Simulator().run(State(n), c, params, None)
    psi = _dense_state(c)
    for i in range(n):
        np.testing.assert_allclose(
            res.expectation_values[i, -1], _zexp(psi, i, n), atol=1e-6
        )


@pytest.mark.parametrize("gate_mode", ["swaps", "tdvp", "mpo"])
def test_ccx_superposition_vs_dense(gate_mode):
    # CCX on a superposed control pair (reference test_ccx_statevector_vs_qiskit)
    n = 3
    c = Circuit(n)
    c.h(0)
    c.h(1)
    c.ccx(0, 1, 2)
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(n)],
        max_bond_dim=8,
        gate_mode=gate_mode,
        random_seed=0,
    )
    res = Simulator().run(State(n), c, params, None)
    psi = _dense_state(c)
    for i in range(n):
        np.testing.assert_allclose(
            res.expectation_values[i, -1], _zexp(psi, i, n), atol=1e-6
        )


def test_shots_from_nonzero_initial_state():
    # shots sample the evolved INITIAL state, not |0...0>
    n = 3
    c = Circuit(n).cx(0, 1)
    params = DigitalSimParams(shots=16, max_bond_dim=4, random_seed=5)
    res = Simulator().run(State(n, state="ones"), c, params, None)
    # |111> -> cx(0,1) flips qubit 1? no: control 0 is 1 -> target flips to 0
    assert res.counts == {0b101: 16}
