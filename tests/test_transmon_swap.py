"""Coupled-transmon iSWAP physics test (reference test_simulator.py:1228).

A qubit-resonator-qubit chain at qubit/resonator resonance realizes a
resonator-mediated excitation swap between the outer qubits after
``T = pi / (sqrt(2) g)``. Checked on the analog MPS TJM path with PVM
bitstring observables and mixed physical dimensions (d=3 transmons).
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State


def test_transmon_swap_via_resonator():
    length, qd, rd = 3, 3, 3
    w = 4 / (2 * np.pi)
    alpha = -0.3 / (2 * np.pi)
    g = 0.2 / (2 * np.pi)
    ham = Hamiltonian.coupled_transmon(
        length,
        qubit_dim=qd,
        resonator_dim=rd,
        qubit_freq=w,
        resonator_freq=w,
        anharmonicity=alpha,
        coupling=g,
    )
    state = State(
        length,
        state="basis",
        basis_string="100",
        physical_dimensions=[qd, rd, qd],
    )
    t_swap = np.pi / (np.sqrt(2) * g)
    bitstrings = ["000", "001", "010", "011", "100", "101", "110", "111"]
    params = AnalogSimParams(
        observables=[Observable(b) for b in bitstrings],
        elapsed_time=t_swap,
        dt=t_swap / 100,
        sample_timesteps=False,
        max_bond_dim=9,
        svd_threshold=1e-12,
    )
    res = Simulator().run(state, ham, params)

    vals = {b: np.asarray(res.expectation_values[i]).reshape(-1) for i, b in enumerate(bitstrings)}
    leakage = np.ones_like(vals["000"])
    for b in bitstrings:
        leakage = leakage - vals[b]
    # excitation moved 100 -> 001 through the resonator
    np.testing.assert_array_less(np.max(vals["111"]), 1e-2)
    np.testing.assert_allclose(vals["100"][-1], 0.0, atol=5e-2)
    np.testing.assert_allclose(vals["001"][-1], 1.0, atol=1e-1)
    np.testing.assert_allclose(vals["010"][-1], 0.0, atol=5e-2)
    np.testing.assert_array_less(leakage, 5e-2)
