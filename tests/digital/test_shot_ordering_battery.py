"""Shot-count bit-ordering and cross-engine Trotter consistency.

Mirrors the reference's deterministic counts-ordering sweep
(/root/reference/tests/digital/test_digital_tjm.py:1975-1996: X-prepared
basis states must map to the qiskit ``int(bitstring, 2)`` key with qubit 0
as the LEAST significant bit) and its analog-vs-Trotter-circuit agreement
test (test_simulator.py:1188-1228) using this package's own dense oracle.
"""

from __future__ import annotations

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
from yaqs_tpu.digital.circuit import Circuit
from yaqs_tpu.models.circuits import create_ising_circuit


@pytest.mark.parametrize(
    ("num_qubits", "ones"),
    [
        (2, ()),
        (2, (0,)),
        (2, (1,)),
        (3, (0, 2)),
        (4, (1, 3)),
        (5, (0, 1, 4)),
    ],
)
def test_deterministic_basis_state_counts_key(num_qubits, ones):
    # key = sum(2^q for flipped qubits): qubit 0 is the least significant bit
    c = Circuit(num_qubits)
    for q in ones:
        c.x(q)
    shots = 16
    params = DigitalSimParams(
        shots=shots, max_bond_dim=4, svd_threshold=1e-12, random_seed=0
    )
    res = Simulator().run(State(num_qubits), c, params, None)
    expected_key = sum(2**q for q in ones)
    assert res.counts == {expected_key: shots}


def test_ghz_counts_two_keys_only():
    length, shots = 4, 256
    c = Circuit(length)
    c.h(0)
    for q in range(length - 1):
        c.cx(q, q + 1)
    params = DigitalSimParams(
        shots=shots, max_bond_dim=8, svd_threshold=1e-12, random_seed=2
    )
    res = Simulator().run(State(length), c, params, None)
    assert set(res.counts) <= {0, 2**length - 1}
    assert sum(res.counts.values()) == shots
    # both branches appear at 256 shots with overwhelming probability
    assert len(res.counts) == 2


def test_counts_sum_matches_requested_shots_noisy():
    from yaqs_tpu import NoiseModel

    length, shots = 3, 64
    c = Circuit(length)
    c.h(0)
    c.cx(0, 1)
    c.cx(1, 2)
    noise = NoiseModel(
        [{"name": "dephasing", "sites": [i], "strength": 0.05} for i in range(length)]
    )
    params = DigitalSimParams(
        shots=shots, max_bond_dim=8, svd_threshold=1e-12, random_seed=5
    )
    res = Simulator().run(State(length), c, params, noise)
    assert sum(res.counts.values()) == shots
    assert all(0 <= k < 2**length for k in res.counts)


def test_analog_vs_trotter_circuit_center_correlators():
    # the digital Trotterization of the Ising Hamiltonian reproduces the
    # analog TJM's two-site center correlators at O(dt^2) (reference
    # test_two_site_correlator_center_circuit, test_simulator.py:1188-1228)
    L, J, g, dt, steps = 4, 1.0, 0.1, 0.1, 20
    pairs = [L // 2, L // 2 + 1]
    obs = [
        Observable("xx", list(pairs)),
        Observable("yy", list(pairs)),
        Observable("zz", list(pairs)),
    ]

    ap = AnalogSimParams(
        observables=obs,
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=8,
        svd_threshold=1e-12,
        order=2,
        random_seed=0,
    )
    ares = Simulator().run(State(L), Hamiltonian.ising(L, J, g), ap, None)

    circ = create_ising_circuit(L, J, g, dt=dt, timesteps=steps)
    dp = DigitalSimParams(
        observables=obs, max_bond_dim=8, svd_threshold=1e-12, random_seed=0
    )
    dres = Simulator().run(State(L), circ, dp, None)

    np.testing.assert_allclose(
        dres.expectation_values[:, -1],
        ares.expectation_values[:, -1],
        atol=2e-3,
    )
