"""Digital engine result contract: shot encoding, mid-circuit columns,
observable ordering, output state, 3-qubit gates across modes.

Reference parity: mqt-yaqs tests/digital/test_digital_tjm.py:1835-2340 —
bitstring/qubit ordering, mid-measurement column counting, get_state,
ccx/ccz/cswap statevector goldens, observable order alignment. Oracles are
dense statevector simulation and hand-built kron operators only.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import DigitalSimParams, NoiseModel, Observable, Simulator, State
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.core import mps_ops
from yaqs_tpu.digital.circuit import Circuit
from yaqs_tpu.models.operators import pauli_x, pauli_y, pauli_z

PAULI = {"x": pauli_x, "y": pauli_y, "z": pauli_z}


def dense_apply(psi, mat, qubits, length):
    """Apply a k-qubit gate (first listed = most significant) to a dense
    state with site 0 least significant."""
    k = len(qubits)
    t = mat.reshape([2] * (2 * k))
    psi_t = psi.reshape([2] * length)  # axes: site L-1 ... site 0
    axes = [length - 1 - q for q in qubits]
    out = np.tensordot(t, psi_t, axes=(list(range(k, 2 * k)), axes))
    remaining = [ax for ax in range(length) if ax not in axes]
    perm = np.argsort(axes + remaining)
    return out.transpose(perm).reshape(-1)


def run_dense(circuit: Circuit, psi0):
    psi = psi0.copy()
    for op in circuit.ops:
        if op.name in {"barrier", "measure"}:
            continue
        psi = dense_apply(psi, op.resolved_matrix(), list(op.qubits), circuit.num_qubits)
    return psi


def dense_exp(psi, name, site, length):
    return np.vdot(psi, embed_one_site(PAULI[name], site, length) @ psi).real


def zeros_vec(length):
    psi = np.zeros(2**length, dtype=complex)
    psi[0] = 1.0
    return psi


# -- shot encoding contract ---------------------------------------------------


@pytest.mark.parametrize("ones", [(0,), (2,), (4,), (0, 2), (1, 3, 4)])
def test_shot_counts_qubit_bit_positions(ones):
    """Deterministic basis state: counts key has qubit i at bit 2**i."""
    length = 5
    c = Circuit(length)
    for q in ones:
        c.x(q)
    res = Simulator().run(
        State(length), c, DigitalSimParams(shots=17, max_bond_dim=4, random_seed=0), None
    )
    expected = sum(2**q for q in ones)
    assert res.counts == {expected: 17}


def test_shots_and_observables_same_run():
    length = 3
    c = Circuit(length)
    c.h(0)
    c.cx(0, 1)
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        shots=300,
        max_bond_dim=8,
        random_seed=5,
    )
    res = Simulator().run(State(length), c, params, None)
    # Bell pair on (0,1): shots only 00x / 11x; Z expectations 0,0,1
    assert set(res.counts) <= {0, 3}
    assert sum(res.counts.values()) == 300
    psi = run_dense(c, zeros_vec(length))
    for i in range(length):
        np.testing.assert_allclose(
            res.expectation_values[i, -1], dense_exp(psi, "z", i, length), atol=1e-8
        )


def test_noiseless_observables_single_trajectory():
    c = Circuit(2)
    c.h(0)
    res = Simulator().run(
        State(2),
        c,
        DigitalSimParams(observables=[Observable("z", 0)], max_bond_dim=4),
        None,
    )
    assert res.num_trajectories == 1  # deterministic circuit: no ensemble


def test_noisy_shots_one_per_trajectory():
    """Reference digital_tjm semantics: with noise, every shot is drawn from
    its own freshly sampled trajectory."""
    length = 2
    c = Circuit(length)
    c.h(0)
    c.cx(0, 1)
    noise = NoiseModel([{"name": "x", "sites": [0], "strength": 0.3}])
    res = Simulator().run(
        State(length),
        c,
        DigitalSimParams(shots=64, max_bond_dim=4, random_seed=1),
        noise,
    )
    assert sum(res.counts.values()) == 64
    assert res.num_trajectories == 64
    # strong bit-flip noise must populate states outside the Bell pair
    assert any(k not in (0, 3) for k in res.counts)


# -- mid-circuit sampling columns ---------------------------------------------


def test_two_sample_barriers_give_four_columns():
    length = 2
    c = Circuit(length)
    c.x(0)
    c.sample_observables()
    c.x(0)
    c.sample_observables()
    c.x(0)
    params = DigitalSimParams(
        observables=[Observable("z", 0)],
        max_bond_dim=4,
        sample_layers=True,
        random_seed=0,
    )
    res = Simulator().run(State(length), c, params, None)
    # initial, after each barrier segment, final
    np.testing.assert_allclose(
        res.expectation_values[0], [1.0, -1.0, 1.0, -1.0], atol=1e-10
    )


def test_unlabeled_barriers_do_not_add_columns():
    length = 2
    c = Circuit(length)
    c.x(0)
    c.barrier()  # plain barrier: scheduling hint only
    c.x(0)
    params = DigitalSimParams(
        observables=[Observable("z", 0)],
        max_bond_dim=4,
        sample_layers=True,
        random_seed=0,
    )
    res = Simulator().run(State(length), c, params, None)
    np.testing.assert_allclose(res.expectation_values[0], [1.0, 1.0], atol=1e-10)


def test_without_sample_layers_single_final_column():
    """Reference digital_tjm.py:491 — num_cols = 1 when sample_layers=False."""
    length = 2
    c = Circuit(length)
    c.x(0)
    res = Simulator().run(
        State(length),
        c,
        DigitalSimParams(observables=[Observable("z", 0)], max_bond_dim=4),
        None,
    )
    assert res.expectation_values.shape[1] == 1
    np.testing.assert_allclose(res.expectation_values[0], [-1.0], atol=1e-10)


def test_sample_layers_without_barriers_two_columns():
    """Reference test_no_mid_measurements_results_have_two_columns: layer
    sampling with zero labeled barriers still records initial + final."""
    length = 3
    c = Circuit(length)
    c.rx(0, params=(0.3,))
    c.cx(0, 1)
    c.rzz(1, 2, params=(0.1,))
    res = Simulator().run(
        State(length),
        c,
        DigitalSimParams(
            observables=[Observable("z", i) for i in range(length)],
            max_bond_dim=8,
            sample_layers=True,
        ),
        None,
    )
    assert res.expectation_values.shape == (length, 2)
    psi = run_dense(c, zeros_vec(length))
    for i in range(length):
        np.testing.assert_allclose(res.expectation_values[i, 0], 1.0, atol=1e-10)
        np.testing.assert_allclose(
            res.expectation_values[i, -1], dense_exp(psi, "z", i, length), atol=1e-8
        )


# -- observable ordering ------------------------------------------------------


def test_observable_rows_follow_user_order():
    """Shuffled sites and mixed bases must come back in user order."""
    length = 4
    c = Circuit(length)
    c.h(0)
    c.cx(0, 1)
    c.rx(2, params=(0.7,))
    obs = [
        Observable("y", 2),
        Observable("z", 3),
        Observable("x", 0),
        Observable("z", 1),
        Observable("x", 2),
    ]
    res = Simulator().run(
        State(length), c, DigitalSimParams(observables=obs, max_bond_dim=8), None
    )
    psi = run_dense(c, zeros_vec(length))
    for row, o in enumerate(obs):
        np.testing.assert_allclose(
            res.expectation_values[row, -1],
            dense_exp(psi, o.name, o.sites, length),
            atol=1e-8,
            err_msg=f"row {row} = {o.name}@{o.sites}",
        )


# -- get_state ----------------------------------------------------------------


def test_get_state_returns_final_mps():
    length = 3
    c = Circuit(length)
    c.h(0)
    c.cx(0, 1)
    c.x(2)
    res = Simulator().run(
        State(length),
        c,
        DigitalSimParams(get_state=True, max_bond_dim=8, random_seed=0),
        None,
    )
    assert res.output_state is not None
    psi = mps_ops.to_statevector_np(np.asarray(res.output_state.tensors))
    golden = run_dense(c, zeros_vec(length))
    i = int(np.argmax(np.abs(golden)))
    phase = psi[i] / golden[i]
    np.testing.assert_allclose(abs(phase), 1.0, atol=1e-8)
    np.testing.assert_allclose(psi, phase * golden, atol=1e-8)


def test_get_state_with_noise_rejected_at_simulator_level():
    """Reference simulator.py:887: noisy circuit get_state raises (the
    trajectory state is a stochastic sample, not the mixed state)."""
    length = 2
    c = Circuit(length)
    c.h(0)
    noise = NoiseModel([{"name": "z", "sites": [0], "strength": 0.1}])
    with pytest.raises(ValueError, match="noisy circuit"):
        Simulator().run(
            State(length),
            c,
            DigitalSimParams(get_state=True, max_bond_dim=4, random_seed=2),
            noise,
        )


# -- three-qubit gates vs dense golden across modes ---------------------------


@pytest.mark.parametrize("gate_mode", ["swaps", "mpo"])
@pytest.mark.parametrize(
    ("gate", "qubits"),
    [
        ("ccx", (0, 1, 2)),
        ("ccx", (3, 1, 0)),  # long-range + reversed control order
        ("ccz", (0, 2, 3)),
        ("cswap", (1, 0, 3)),
    ],
)
def test_three_qubit_gates_statevector(gate_mode, gate, qubits):
    length = 4
    c = Circuit(length)
    # non-trivial superposition input so controls actually fire
    for q in range(length):
        c.h(q)
    c.rz(1, params=(0.4,))
    getattr(c, gate)(*qubits)
    obs = [Observable("z", i) for i in range(length)] + [
        Observable("x", i) for i in range(length)
    ]
    res = Simulator().run(
        State(length),
        c,
        DigitalSimParams(observables=obs, max_bond_dim=16, gate_mode=gate_mode),
        None,
    )
    psi = run_dense(c, zeros_vec(length))
    for row, o in enumerate(obs):
        np.testing.assert_allclose(
            res.expectation_values[row, -1],
            dense_exp(psi, o.name, o.sites, length),
            atol=1e-6,
            err_msg=f"{gate}{qubits} mode={gate_mode} {o.name}@{o.sites}",
        )


# -- PVM observables ----------------------------------------------------------


def test_pvm_mixing_rejected():
    with pytest.raises(ValueError, match="pvm"):
        DigitalSimParams(
            observables=[Observable("pvm", 0), Observable("z", 1)], max_bond_dim=4
        )


def test_unknown_gate_mode_rejected():
    with pytest.raises(ValueError, match="gate_mode"):
        DigitalSimParams(shots=1, max_bond_dim=4, gate_mode="teleport")
