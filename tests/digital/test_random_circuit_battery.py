"""Randomized digital-circuit regression battery vs a dense statevector oracle.

Mirrors the breadth of the reference's long-range/gate-mode matrix
(/root/reference/tests/digital/test_digital_tjm.py, the ``test_lr_*`` /
``test_tebd_*`` / ``test_mpo_*`` families) with seeded random circuits: every
exact gate mode must reproduce the dense statevector built gate-by-gate with
an independent numpy embedding (tests/digital/test_engine.py::dense_apply —
no MPS code in the oracle path).
"""

from __future__ import annotations

import numpy as np
import pytest

from test_engine import dense_apply, run_dense, zexp
from yaqs_tpu import DigitalSimParams, Observable, Simulator, State
from yaqs_tpu.core import mps_ops
from yaqs_tpu.digital.circuit import Circuit

EXACT_MODES = ["swaps", "mpo"]

ONE_Q = ["h", "x", "y", "z", "s", "t", "sx"]
ONE_Q_PARAM = ["rx", "ry", "rz", "phase"]
TWO_Q = ["cx", "cz", "swap"]
TWO_Q_PARAM = ["rzz", "rxx", "ryy", "cphase"]


def rand_circuit(rng, length, depth, *, lr=False, threeq=False):
    c = Circuit(length)
    for _ in range(depth):
        kind = rng.integers(0, 4)
        if kind == 0:
            q = int(rng.integers(0, length))
            name = ONE_Q[rng.integers(0, len(ONE_Q))]
            c.append(name, (q,))
        elif kind == 1:
            q = int(rng.integers(0, length))
            name = ONE_Q_PARAM[rng.integers(0, len(ONE_Q_PARAM))]
            c.append(name, (q,), params=(float(rng.uniform(-np.pi, np.pi)),))
        elif kind == 2:
            if lr:
                a, b = rng.choice(length, size=2, replace=False)
            else:
                a = int(rng.integers(0, length - 1))
                b = a + 1
                if rng.integers(0, 2):
                    a, b = b, a
            name = TWO_Q[rng.integers(0, len(TWO_Q))]
            c.append(name, (int(a), int(b)))
        else:
            if lr:
                a, b = rng.choice(length, size=2, replace=False)
            else:
                a = int(rng.integers(0, length - 1))
                b = a + 1
            name = TWO_Q_PARAM[rng.integers(0, len(TWO_Q_PARAM))]
            c.append(
                name, (int(a), int(b)), params=(float(rng.uniform(-np.pi, np.pi)),)
            )
    if threeq:
        trip = rng.choice(length, size=3, replace=False)
        c.append("ccx", tuple(int(q) for q in trip))
        c.append("ccz", tuple(int(q) for q in np.sort(trip)))
    return c


def _check_modes(c, length, chi=16, atol=1e-6):
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    psi_exact = run_dense(c, psi0)
    exact_z = [zexp(psi_exact, i, length) for i in range(length)]
    for mode in EXACT_MODES:
        params = DigitalSimParams(
            observables=[Observable("z", i) for i in range(length)],
            max_bond_dim=chi,
            svd_threshold=1e-12,
            random_seed=7,
            gate_mode=mode,
            get_state=True,
        )
        res = Simulator().run(State(length), c, params, None)
        np.testing.assert_allclose(
            res.expectation_values[:, -1], exact_z, atol=atol, err_msg=mode
        )
        psi = np.asarray(mps_ops.to_statevector(res.output_state.mps.tensors))
        fid = abs(np.vdot(psi_exact, psi)) ** 2
        assert fid > 1 - 1e-8, f"{mode}: fidelity {fid}"


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_nn_circuit_all_modes(seed):
    rng = np.random.default_rng(100 + seed)
    length = int(rng.integers(4, 7))
    c = rand_circuit(rng, length, depth=18)
    _check_modes(c, length)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_lr_circuit_all_modes(seed):
    rng = np.random.default_rng(200 + seed)
    length = 6
    c = rand_circuit(rng, length, depth=14, lr=True)
    _check_modes(c, length, chi=24)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_threeq_circuit_all_modes(seed):
    rng = np.random.default_rng(300 + seed)
    length = 5
    c = rand_circuit(rng, length, depth=10, lr=True, threeq=True)
    _check_modes(c, length, chi=24)


def test_random_circuit_x_y_observables_vs_dense():
    """Non-Z observable columns agree with the dense oracle (reference
    exercises arbitrary observables through evaluate_observables)."""
    rng = np.random.default_rng(42)
    length = 5
    c = rand_circuit(rng, length, depth=16)
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    psi = run_dense(c, psi0)
    x = np.array([[0, 1], [1, 0]], dtype=complex)
    y = np.array([[0, -1j], [1j, 0]], dtype=complex)

    def dense_exp(op, site):
        full = dense_apply(psi, op, [site], length)
        return np.vdot(psi, full).real

    obs = [Observable("x", 1), Observable("y", 2), Observable("z", 3)]
    params = DigitalSimParams(
        observables=obs, max_bond_dim=16, svd_threshold=1e-12, random_seed=1
    )
    res = Simulator().run(State(length), c, params, None)
    np.testing.assert_allclose(res.expectation_values[0, -1], dense_exp(x, 1), atol=1e-8)
    np.testing.assert_allclose(res.expectation_values[1, -1], dense_exp(y, 2), atol=1e-8)
    np.testing.assert_allclose(res.expectation_values[2, -1], dense_exp(z_mat(), 3), atol=1e-8)


def z_mat():
    return np.array([[1, 0], [0, -1]], dtype=complex)


def test_random_circuit_two_site_correlators_vs_dense():
    """Two-site correlator observables (zz at boundary/center/right) match a
    dense kron oracle — the reference's test_two_site_correlator_* family
    (tests/test_simulator.py:301ff)."""
    rng = np.random.default_rng(7)
    length = 5
    c = rand_circuit(rng, length, depth=14)
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    psi = run_dense(c, psi0)
    zz = np.kron(z_mat(), z_mat())

    pairs = [(0, 1), (2, 3), (3, 4)]
    obs = [Observable(zz, [a, b]) for a, b in pairs]
    params = DigitalSimParams(
        observables=obs, max_bond_dim=16, svd_threshold=1e-12, random_seed=1
    )
    res = Simulator().run(State(length), c, params, None)
    for k, (a, b) in enumerate(pairs):
        expect = np.vdot(psi, dense_apply(psi, zz, [b, a], length)).real
        np.testing.assert_allclose(res.expectation_values[k, -1], expect, atol=1e-8)


def test_mid_circuit_columns_vs_dense_checkpoints():
    """sample_observables barriers produce per-column expectations equal to
    the dense state evaluated at the same circuit positions (reference
    mid-measurement column semantics, digital_tjm.py:526-533)."""
    length = 4
    rng = np.random.default_rng(11)
    seg1 = rand_circuit(rng, length, depth=8)
    seg2 = rand_circuit(rng, length, depth=8)

    c = Circuit(length)
    for op in seg1.ops:
        c.append(op.name, op.qubits, params=op.params, matrix=op.matrix)
    c.sample_observables()
    for op in seg2.ops:
        c.append(op.name, op.qubits, params=op.params, matrix=op.matrix)

    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    psi_mid = run_dense(seg1, psi0)
    psi_end = run_dense(seg2, psi_mid)

    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        max_bond_dim=16,
        svd_threshold=1e-12,
        sample_layers=True,
        random_seed=2,
    )
    res = Simulator().run(State(length), c, params, None)
    # initial, after the barrier, final
    assert res.expectation_values.shape[1] == 3
    for i in range(length):
        np.testing.assert_allclose(
            res.expectation_values[i, 0], zexp(psi0, i, length), atol=1e-8
        )
        np.testing.assert_allclose(
            res.expectation_values[i, -2], zexp(psi_mid, i, length), atol=1e-8
        )
        np.testing.assert_allclose(
            res.expectation_values[i, -1], zexp(psi_end, i, length), atol=1e-8
        )


def test_plus_state_initial_random_circuit():
    """Non-|0...0> initial states thread through the digital engine exactly
    (reference runs circuits from arbitrary State presets)."""
    rng = np.random.default_rng(5)
    length = 4
    c = rand_circuit(rng, length, depth=12)
    psi0 = np.full(2**length, 1 / 2 ** (length / 2), dtype=complex)
    psi_exact = run_dense(c, psi0)
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        max_bond_dim=16,
        svd_threshold=1e-12,
        random_seed=3,
    )
    res = Simulator().run(State(length, state="x+"), c, params, None)
    for i in range(length):
        np.testing.assert_allclose(
            res.expectation_values[i, -1], zexp(psi_exact, i, length), atol=1e-8
        )
