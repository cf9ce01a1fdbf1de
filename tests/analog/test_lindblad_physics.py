"""Simulator-level Lindblad physics vs analytic oracles + ensemble contracts.

Port of the reference behaviors in /root/reference/tests/analog/test_lindblad.py
and test_ensemble.py: analytic amplitude-damping / Rabi / dephasing curves
through the density-matrix representation, cross-representation agreement,
timepoint recording, and the list-of-State unitary-ensemble validation rules.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State


def run_dm(length, ham, noise, observables, elapsed=1.0, dt=0.05, sample=True):
    params = AnalogSimParams(
        observables=observables,
        elapsed_time=elapsed,
        dt=dt,
        sample_timesteps=sample,
        num_traj=1,
    )
    state = State(length, representation="density_matrix")
    return Simulator(parallel=False).run(state, ham, params, noise), params


def test_lindblad_amplitude_damping_analytic():
    # |1> with L = sqrt(gamma) sigma-: <Z>(t) = 1 - 2 exp(-gamma t)
    gamma = 0.4
    ham = Hamiltonian.from_pauli_sum([(0.0, "Z0")], 1)
    nm = NoiseModel([{"name": "lowering", "sites": [0], "strength": gamma}])
    res, params = run_dm(
        1, ham, nm, [Observable("z", 0)], elapsed=1.0, dt=0.05,
    )
    # need |1> start: use basis_string
    state = State(1, representation="density_matrix", basis_string="1")
    res = Simulator(parallel=False).run(state, ham, params, nm)
    times = params.times
    np.testing.assert_allclose(
        res.observable(0), 1 - 2 * np.exp(-gamma * times), atol=1e-6
    )


def test_lindblad_unitary_rabi():
    # H = (Omega/2) X, no noise: <Z>(t) = cos(Omega t)
    omega = 2.0
    ham = Hamiltonian.from_pauli_sum([(omega / 2, "X0")], 1)
    res, params = run_dm(1, ham, None, [Observable("z", 0)], elapsed=2.0, dt=0.02)
    np.testing.assert_allclose(
        res.observable(0), np.cos(omega * params.times), atol=1e-5
    )


def test_lindblad_dephasing_analytic():
    # |+> with L = sqrt(gamma) Z: <X>(t) = exp(-2 gamma t)
    gamma = 0.35
    ham = Hamiltonian.from_pauli_sum([(0.0, "Z0")], 1)
    nm = NoiseModel([{"name": "dephasing", "sites": [0], "strength": gamma}])
    params = AnalogSimParams(
        observables=[Observable("x", 0)],
        elapsed_time=1.5,
        dt=0.05,
        sample_timesteps=True,
        num_traj=1,
    )
    state = State(1, state="x+", representation="density_matrix")
    res = Simulator(parallel=False).run(state, ham, params, nm)
    np.testing.assert_allclose(
        res.observable(0), np.exp(-2 * gamma * params.times), atol=1e-6
    )


def test_lindblad_dephasing_both_qubits():
    gamma = 0.2
    ham = Hamiltonian.from_pauli_sum([(0.0, "Z0")], 2)
    nm = NoiseModel(
        [{"name": "dephasing", "sites": [i], "strength": gamma} for i in range(2)]
    )
    params = AnalogSimParams(
        observables=[Observable("x", 0), Observable("x", 1)],
        elapsed_time=1.0,
        dt=0.05,
        sample_timesteps=True,
        num_traj=1,
    )
    state = State(2, state="x+", representation="density_matrix")
    res = Simulator(parallel=False).run(state, ham, params, nm)
    for i in range(2):
        np.testing.assert_allclose(
            res.observable(i), np.exp(-2 * gamma * params.times), atol=1e-6
        )


def test_lindblad_zero_strength_noise_matches_unitary():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    nm = NoiseModel([{"name": "lowering", "sites": [0], "strength": 0.0}])
    res_noisy, params = run_dm(2, ham, nm, [Observable("z", 0)])
    res_clean, _ = run_dm(2, ham, None, [Observable("z", 0)])
    np.testing.assert_allclose(
        res_noisy.observable(0), res_clean.observable(0), atol=1e-10
    )


def test_lindblad_records_all_timepoints():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    res, params = run_dm(2, ham, None, [Observable("z", 0)], elapsed=0.5, dt=0.1)
    assert res.observable(0).shape == (6,)
    np.testing.assert_allclose(res.times, np.arange(6) * 0.1, atol=1e-12)


def test_lindblad_final_only_when_not_sampling():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    res, _ = run_dm(2, ham, None, [Observable("z", 0)], sample=False)
    assert res.observable(0).shape == (1,)


def test_noiseless_mps_matches_density_matrix():
    # the MPS TJM path and the dense Lindblad propagator agree without noise
    length = 3
    ham = Hamiltonian.ising(length, 1.0, 0.7)
    obs = [Observable("z", i) for i in range(length)]
    res_dm, params = run_dm(length, ham, None, obs, elapsed=0.5, dt=0.05)
    mps_params = AnalogSimParams(
        observables=obs,
        elapsed_time=0.5,
        dt=0.05,
        sample_timesteps=True,
        num_traj=1,
        max_bond_dim=8,
    )
    res_mps = Simulator(parallel=False).run(
        State(length, representation="mps"), ham, mps_params, None
    )
    for i in range(length):
        np.testing.assert_allclose(
            res_mps.observable(i), res_dm.observable(i), atol=2e-3
        )


# -- unitary ensemble (list-of-State) contracts --------------------------------


def _ensemble_setup(length=2):
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.3,
        dt=0.1,
        num_traj=1,
        max_bond_dim=4,
        sample_timesteps=True,
    )
    return ham, params


def test_ensemble_rejects_noise():
    ham, params = _ensemble_setup()
    states = [State(2), State(2, basis_string="11")]
    nm = NoiseModel([{"name": "lowering", "sites": [0], "strength": 0.1}])
    with pytest.raises(ValueError, match="noiseless"):
        Simulator(parallel=False).run(states, ham, params, nm)


def test_ensemble_rejects_empty_list():
    ham, params = _ensemble_setup()
    with pytest.raises(ValueError, match="at least one"):
        Simulator(parallel=False).run([], ham, params, None)


def test_ensemble_rejects_length_mismatch():
    ham, params = _ensemble_setup()
    with pytest.raises(ValueError, match="length"):
        Simulator(parallel=False).run([State(2), State(3)], ham, params, None)


def test_ensemble_rejects_non_mps_members():
    ham, params = _ensemble_setup()
    with pytest.raises(ValueError, match="representation"):
        Simulator(parallel=False).run(
            [State(2, representation="vector")], ham, params, None
        )


def test_ensemble_rejects_get_state():
    ham, params = _ensemble_setup()
    params.get_state = True
    with pytest.raises(ValueError, match="get_state"):
        Simulator(parallel=False).run([State(2)], ham, params, None)


def test_ensemble_requires_analog_params():
    """Digital params reject a list initial_state with the circuit-simulation
    contract error (reference simulator.py:622-624: "Circuit simulation
    requires a single State initial_state") — ensembles are analog-only."""
    from yaqs_tpu import DigitalSimParams

    params = DigitalSimParams(observables=[Observable("z", 0)], num_traj=1)
    with pytest.raises(TypeError, match="single State initial_state"):
        Simulator(parallel=False).run([State(2)], Hamiltonian.ising(2), params, None)


def test_ensemble_mean_matches_member_average():
    # ensemble expectation = mean over members of single-state runs
    length = 2
    ham, params = _ensemble_setup(length)
    members = [State(length, basis_string="00"), State(length, basis_string="10")]
    res = Simulator(parallel=False).run(members, ham, params, None)
    singles = []
    for bs in ("00", "10"):
        r = Simulator(parallel=False).run(
            State(length, basis_string=bs), ham, params, None
        )
        singles.append(r.observable(0))
    np.testing.assert_allclose(
        res.observable(0), np.mean(singles, axis=0), atol=1e-6
    )


def test_ensemble_final_timestep_when_not_sampling():
    ham, params = _ensemble_setup()
    params.sample_timesteps = False
    res = Simulator(parallel=False).run([State(2), State(2)], ham, params, None)
    assert res.observable(0).shape == (1,)


def test_two_time_correlator_t0_diagonal_matches_expectation():
    # <A(0)B(0)> from the co-evolved pair at t=0 equals <psi|AB|psi>
    length = 2
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.2,
        dt=0.1,
        num_traj=1,
        max_bond_dim=4,
        sample_timesteps=True,
        multi_time_observables=[(Observable("x", 0), Observable("x", 0))],
    )
    state = State(length, basis_string="00")
    res = Simulator(parallel=False).run([state], ham, params, None)
    assert res.multi_time_correlators is not None
    # X X = I so <A(0)B(0)> = 1
    np.testing.assert_allclose(res.multi_time_correlators[0, 0], 1.0, atol=1e-8)
