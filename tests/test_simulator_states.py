"""Simulator state-output and rejection contracts vs the reference.

Mirrors /root/reference/tests/test_simulator.py's get_state battery
(density_matrix :349-501, vector :1586), scheduled-jump rejections
(:1739-1797), and the ensemble final-timestep semantics
(/root/reference/tests/analog/test_ensemble.py:103-305). Oracles are
closed-form amplitude-damping solutions and dense expm evolution.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.linalg

from yaqs_tpu import (
    AnalogSimParams,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)

SIGMA_MINUS = np.array([[0, 1], [0, 0]], dtype=complex)


# -- density-matrix (Lindblad) get_state -------------------------------------------


def test_density_matrix_get_state():
    state = State(2, state="zeros", representation="density_matrix")
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.1, dt=0.1, get_state=True
    )
    res = Simulator().run(state, ham, params, None)
    assert res.output_state is not None
    assert res.output_state.representation == "density_matrix"
    rho = res.output_state.density_matrix
    assert rho.shape == (4, 4)
    assert np.isclose(np.trace(rho), 1.0)
    # oracle: unitary evolution of |00><00|
    h = ham.ensure_matrix()
    u = scipy.linalg.expm(-1j * h * 0.1)
    rho0 = np.zeros((4, 4), dtype=complex)
    rho0[0, 0] = 1.0
    np.testing.assert_allclose(rho, u @ rho0 @ u.conj().T, atol=1e-8)


def test_density_matrix_get_state_noisy_amplitude_damping():
    gamma, t = 1.0, 1.0
    state = State(1, state="ones", representation="density_matrix")
    ham = Hamiltonian.ising(1, 0.0, 0.0)
    noise = NoiseModel(
        processes=[
            {"name": "destroy", "sites": [0], "strength": gamma, "matrix": SIGMA_MINUS}
        ]
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=t, dt=0.1, get_state=True
    )
    res = Simulator().run(state, ham, params, noise)
    rho = res.output_state.density_matrix
    expected = np.array(
        [[1.0 - np.exp(-gamma * t), 0.0], [0.0, np.exp(-gamma * t)]], dtype=complex
    )
    np.testing.assert_allclose(rho, expected, atol=1e-4)
    assert np.isclose(np.trace(rho), 1.0)
    assert np.allclose(rho.imag, 0.0, atol=1e-10)


def test_density_matrix_non_qubit_physical_dimension():
    d = 3
    rho0 = np.zeros((d, d), dtype=complex)
    rho0[2, 2] = 1.0
    state = State(length=1, density_matrix=rho0, physical_dimensions=[d])
    ham = Hamiltonian(matrix=np.zeros((d, d), dtype=complex), length=1, d=d)
    lowering_21 = np.zeros((d, d), dtype=complex)
    lowering_21[1, 2] = 1.0
    gamma, t = 0.7, 0.4
    noise = NoiseModel(
        processes=[
            {
                "name": "qutrit_decay_2_to_1",
                "sites": [0],
                "strength": gamma,
                "matrix": lowering_21,
            }
        ]
    )
    params = AnalogSimParams(
        observables=[], elapsed_time=t, dt=0.1, get_state=True
    )
    res = Simulator().run(state, ham, params, noise)
    assert res.output_state is not None
    assert res.output_state.length == 1
    assert res.output_state.physical_dimensions == [d]
    rho = res.output_state.density_matrix
    expected = np.zeros_like(rho)
    expected[1, 1] = 1.0 - np.exp(-gamma * t)
    expected[2, 2] = np.exp(-gamma * t)
    np.testing.assert_allclose(rho, expected, atol=1e-4)


def test_density_matrix_get_state_at_elapsed_time():
    gamma, t = 1.0, 0.3
    state = State(1, state="ones", representation="density_matrix")
    ham = Hamiltonian.ising(1, 0.0, 0.0)
    noise = NoiseModel(
        processes=[
            {"name": "destroy", "sites": [0], "strength": gamma, "matrix": SIGMA_MINUS}
        ]
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=t,
        dt=0.1,
        get_state=True,
        sample_timesteps=False,
    )
    assert params.times[-1] == pytest.approx(t)
    res = Simulator().run(state, ham, params, noise)
    rho = res.output_state.density_matrix
    expected = np.array(
        [[1.0 - np.exp(-gamma * t), 0.0], [0.0, np.exp(-gamma * t)]], dtype=complex
    )
    np.testing.assert_allclose(rho, expected, atol=1e-4)


def test_density_matrix_get_state_preserves_metadata():
    state = State(
        2, state="zeros", representation="density_matrix", physical_dimensions=[2, 2]
    )
    ham = Hamiltonian.ising(2, 0.0, 0.0)
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.1, dt=0.1, get_state=True
    )
    res = Simulator().run(state, ham, params, None)
    assert res.output_state.length == 2
    assert res.output_state.physical_dimensions == [2, 2]
    assert res.output_state.representation == "density_matrix"


def test_density_matrix_without_get_state_leaves_output_state_empty():
    state = State(1, state="ones", representation="density_matrix")
    ham = Hamiltonian.ising(1, 0.0, 0.0)
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.1, dt=0.1, get_state=False
    )
    res = Simulator().run(state, ham, params, None)
    assert res.output_state is None


# -- vector (MCWF) get_state --------------------------------------------------------


def test_mcwf_get_state_noiseless_matches_dense():
    L, dt, steps = 2, 0.1, 3
    state = State(L, state="zeros", representation="vector")
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=dt * steps,
        dt=dt,
        get_state=True,
    )
    res = Simulator().run(state, ham, params, None)
    out = res.output_state
    assert out is not None
    assert out.representation == "vector"
    h = ham.ensure_matrix()
    psi = np.zeros(4, dtype=complex)
    psi[0] = 1.0
    expected = scipy.linalg.expm(-1j * h * dt * steps) @ psi
    got = out.to_vector()
    phase = np.vdot(expected, got)
    np.testing.assert_allclose(got, expected * phase / abs(phase), atol=1e-6)


def test_mcwf_get_state_noisy_is_normalized_vector():
    state = State(2, state="ones", representation="vector")
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    noise = NoiseModel(
        processes=[
            {"name": "destroy", "sites": [0], "strength": 0.5, "matrix": SIGMA_MINUS}
        ]
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.5,
        dt=0.1,
        num_traj=3,
        get_state=True,
        random_seed=11,
    )
    res = Simulator().run(state, ham, params, noise)
    psi = res.output_state.to_vector()
    assert psi.shape == (4,)
    np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-6)


def test_tjm_get_state_is_state_with_metadata():
    state = State(3, state="zeros")
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    noise = NoiseModel(
        processes=[
            {"name": "x", "sites": [i], "strength": 0.05} for i in range(3)
        ]
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.2,
        dt=0.1,
        num_traj=2,
        get_state=True,
        max_bond_dim=8,
        random_seed=3,
    )
    res = Simulator().run(state, ham, params, noise)
    out = res.output_state
    assert out is not None
    assert out.representation == "mps"
    assert out.length == 3
    # final state is a valid normalized MPS
    psi = out.to_vector()
    np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-6)


# -- scheduled-jump rejection contracts ---------------------------------------------


def test_scheduled_jumps_rejected_for_mcwf_and_lindblad():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    noise = NoiseModel(scheduled_jumps=[{"time": 0.0, "sites": [0], "name": "x"}])
    params = AnalogSimParams(
        observables=[Observable("z", 0)], dt=0.1, elapsed_time=0.1, num_traj=1
    )
    for representation in ("vector", "density_matrix"):
        state = State(2, representation=representation)
        with pytest.raises(ValueError, match="scheduled_jumps"):
            Simulator().run(state, ham, params, noise)


def test_scheduled_jumps_rejected_for_ensemble():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    noise = NoiseModel(scheduled_jumps=[{"time": 0.0, "sites": [0], "name": "x"}])
    params = AnalogSimParams(
        observables=[Observable("z", 0)], dt=0.1, elapsed_time=0.1, num_traj=1
    )
    with pytest.raises(ValueError, match="scheduled_jumps"):
        Simulator().run([State(2), State(2)], ham, params, noise)


def test_ensemble_accepts_zero_strength_noise():
    ham = Hamiltonian.ising(2, 0.3, 0.2)
    noise = NoiseModel(
        processes=[{"name": "x", "sites": [0], "strength": 0.0}]
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)], dt=0.1, elapsed_time=0.1,
        max_bond_dim=8,
    )
    res = Simulator().run([State(2)], ham, params, noise)
    assert res.num_trajectories == 1


def test_ensemble_rejects_positive_strength_noise():
    ham = Hamiltonian.ising(2, 0.3, 0.2)
    noise = NoiseModel(
        processes=[{"name": "x", "sites": [0], "strength": 0.1}]
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)], dt=0.1, elapsed_time=0.1
    )
    with pytest.raises(ValueError, match="noiseless"):
        Simulator().run([State(2)], ham, params, noise)


# -- ensemble final-timestep / t0-only semantics ------------------------------------


def test_ensemble_final_timestep_when_not_sampling():
    length = 2
    ham = Hamiltonian.ising(length, 0.2, 0.1)
    states = [State(length, state="zeros"), State(length, state="ones")]
    z0, z1 = Observable("z", 0), Observable("z", 1)
    params = AnalogSimParams(
        observables=[z0],
        elapsed_time=0.2,
        dt=0.1,
        sample_timesteps=False,
        multi_time_observables=[(z0, z0), (z0, z1)],
        max_bond_dim=8,
        svd_threshold=1e-10,
    )
    assert len(params.times) >= 3
    res = Simulator().run(states, ham, params, None)
    assert res.expectation_values[0].shape == (1,)
    assert res.multi_time_results is not None
    assert res.multi_time_results.shape == (2, 1)
    assert res.multi_time_times is not None
    assert res.multi_time_times[-1] == pytest.approx(0.2)
    assert res.times.shape == (1,)
    assert res.trajectories.shape == (2, 1, 1)


def test_ensemble_t0_only_records_when_not_sampling():
    length = 2
    ham = Hamiltonian.ising(length, 0.2, 0.1)
    z0, z1 = Observable("z", 0), Observable("z", 1)
    params = AnalogSimParams(
        observables=[z0],
        elapsed_time=0.0,
        dt=0.1,
        sample_timesteps=False,
        multi_time_observables=[(z0, z0), (z0, z1)],
        max_bond_dim=8,
    )
    res = Simulator().run([State(length, state="zeros")], ham, params, None)
    assert res.expectation_values[0].shape == (1,)
    np.testing.assert_allclose(res.expectation_values[0][0], 1.0, atol=1e-10)
    assert res.multi_time_results.shape == (2, 1)
    # (Z0, Z0) autocorrelator at t=0: <0|Z0^2|0> = 1
    np.testing.assert_allclose(res.multi_time_results[0, 0], 1.0 + 0.0j, atol=1e-10)


def test_ensemble_clears_multi_time_outputs_when_feature_disabled():
    ham = Hamiltonian.ising(2, 0.2, 0.1)
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.1, dt=0.1, max_bond_dim=8
    )
    res = Simulator().run([State(2)], ham, params, None)
    assert res.multi_time_results is None
    assert res.multi_time_times is None


# -- State construction parity ------------------------------------------------------


def test_state_initial_kwarg_alias():
    a = State(3, initial="ones")
    b = State(3, state="ones")
    np.testing.assert_allclose(a.to_vector(), b.to_vector())


def test_state_physical_dimensions_default_and_explicit():
    assert State(3).physical_dimensions == [2, 2, 2]
    assert State(physical_dimensions=[2, 3]).physical_dimensions == [2, 3]
    assert State(2, physical_dimensions=3).physical_dimensions == [3, 3]


# -- State encoding surface (reference state.py:167-277) ----------------------------


def test_state_ensure_encoded_and_mps_property():
    s = State(3, state="y+")
    m = s.mps
    np.testing.assert_allclose(m.norm(), 1.0, atol=1e-10)
    # Bell vector encodes to a chi-2 MPS that reproduces the vector
    bell = np.array([1, 0, 0, 1]) / np.sqrt(2)
    v = State(2, vector=bell).ensure_encoded("mps")
    psi = v.mps.to_vec()
    phase = np.vdot(bell, psi)
    np.testing.assert_allclose(psi, bell * phase / abs(phase), atol=1e-10)


def test_state_from_mps_roundtrip():
    s = State(3, state="x-")
    s2 = State.from_mps(s.mps)
    assert s2.representation == "mps"
    assert s2.length == 3
    np.testing.assert_allclose(
        np.abs(np.vdot(s2.to_vector(), s.to_vector())), 1.0, atol=1e-10
    )


def test_state_ensure_encoded_density_matrix():
    d = State(2, state="zeros").ensure_encoded("density_matrix")
    assert d.density_matrix is not None
    np.testing.assert_allclose(np.trace(d.density_matrix), 1.0, atol=1e-12)


def test_state_ensure_encoded_rejects_unknown():
    with pytest.raises(ValueError, match="representation"):
        State(2).ensure_encoded("qutrit_soup")
