"""End-to-end Simulator tests: the minimum slice (BASELINE config 1 shrunk),
cross-backend agreement (TJM vs MCWF vs Lindblad), and parallel/serial
equivalence on the virtual 8-device mesh."""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import (
    AnalogSimParams,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)


def tfim_setup(length, gamma=0.1, dt=0.1, steps=5, num_traj=100, representation="mps"):
    state = State(length, state="x+", representation=representation)
    ham = Hamiltonian.ising(length, J=1.0, g=0.5)
    obs = [Observable("z", i) for i in range(length)]
    params = AnalogSimParams(
        observables=obs,
        elapsed_time=dt * steps,
        dt=dt,
        num_traj=num_traj,
        max_bond_dim=8,
        svd_threshold=1e-12,
        krylov_dim=12,
        order=2,
        sample_timesteps=True,
        random_seed=17,
    )
    noise = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": gamma} for i in range(length)]
    )
    return state, ham, params, noise


def test_noiseless_run_single_trajectory():
    state, ham, params, _ = tfim_setup(4, num_traj=64)
    sim = Simulator(show_progress=False)
    result = sim.run(state, ham, params, None)
    assert result.num_trajectories == 1  # deterministic -> 1 trajectory
    assert result.expectation_values.shape == (4, 6)
    # t=0: <Z> = 0 in |x+>
    np.testing.assert_allclose(result.expectation_values[:, 0], 0.0, atol=1e-10)


def test_cross_backend_agreement():
    """TJM ensemble vs MCWF ensemble vs exact Lindblad (reference test
    strategy: cross-backend agreement as the physics oracle)."""
    length, gamma, dt, steps = 3, 0.2, 0.1, 4
    results = {}
    for rep in ("mps", "vector", "density_matrix"):
        state, ham, params, noise = tfim_setup(
            length, gamma=gamma, dt=dt, steps=steps, num_traj=250, representation=rep
        )
        sim = Simulator()
        results[rep] = sim.run(state, ham, params, noise)

    exact = results["density_matrix"].expectation_values
    for rep in ("mps", "vector"):
        vals = results[rep].expectation_values
        n_traj = results[rep].num_trajectories
        stderr = results[rep].trajectories.std(axis=0) / np.sqrt(n_traj)
        tol = 5 * stderr + 0.03
        assert np.all(np.abs(vals - exact) < tol), (rep, np.abs(vals - exact).max())


@pytest.mark.slow
def test_parallel_serial_equivalence():
    """Same seeded ensemble with parallel=True/False must be identical —
    fold_in key streams are device-layout independent (reference
    test_simulator.py:86)."""
    state, ham, params, noise = tfim_setup(3, num_traj=16)
    res_par = Simulator(parallel=True).run(state, ham, params, noise)
    res_ser = Simulator(parallel=False).run(state, ham, params, noise)
    np.testing.assert_allclose(
        res_par.expectation_values, res_ser.expectation_values, atol=1e-12
    )
    res_chunk = Simulator(parallel=True, batch_size=5).run(state, ham, params, noise)
    np.testing.assert_allclose(
        res_par.expectation_values, res_chunk.expectation_values, atol=1e-12
    )


def test_observable_user_order_restored():
    length = 4
    state = State(length, state="Neel")
    ham = Hamiltonian.ising(length, 1.0, 0.3)
    # deliberately unsorted observables
    obs = [Observable("z", 3), Observable("x", 1), Observable("z", 0)]
    params = AnalogSimParams(
        observables=obs,
        elapsed_time=0.0,
        dt=0.1,
        max_bond_dim=4,
        sample_timesteps=True,
        random_seed=3,
    )
    result = Simulator().run(state, ham, params, None)
    # Neel = |0101...>: site 0 -> Z=+1, site 3 -> Z=-1, X always 0
    np.testing.assert_allclose(result.expectation_values[0, 0], -1.0, atol=1e-10)
    np.testing.assert_allclose(result.expectation_values[1, 0], 0.0, atol=1e-10)
    np.testing.assert_allclose(result.expectation_values[2, 0], 1.0, atol=1e-10)


def test_get_state_returns_final_mps():
    state, ham, params, noise = tfim_setup(3, num_traj=4)
    params.get_state = True
    result = Simulator().run(state, ham, params, noise)
    assert result.output_state is not None
    assert result.output_state.representation == "mps"
    assert np.asarray(result.output_state.tensors).shape == (3, 2, 8, 8)


def test_public_api_contract():
    import yaqs_tpu

    expected = {
        "SIMULATION_PRESETS",
        "AnalogSimParams",
        "DigitalSimParams",
        "Hamiltonian",
        "NoiseModel",
        "Observable",
        "Result",
        "Simulator",
        "State",
        "__version__",
        "version_info",
    }
    assert expected <= set(yaqs_tpu.__all__)


def test_static_disorder_sampling():
    state, ham, params, _ = tfim_setup(3, num_traj=8)
    noise = NoiseModel(
        [
            {
                "name": "lowering",
                "sites": [i],
                "strength": {"distribution": "truncated_normal", "mean": 0.1, "std": 0.02},
            }
            for i in range(3)
        ]
    )
    result = Simulator().run(state, ham, params, noise)
    sampled = result.noise_model
    assert sampled is not noise
    strengths = [p["strength"] for p in sampled.processes]
    assert all(isinstance(s, float) and s >= 0 for s in strengths)
    # reproducible given the same seed
    result2 = Simulator().run(state, ham, params, noise)
    strengths2 = [p["strength"] for p in result2.noise_model.processes]
    np.testing.assert_allclose(strengths, strengths2)


def test_noise_validation_rejects_bad_sites():
    import pytest

    state, ham, params, _ = tfim_setup(3)
    bad = NoiseModel([{"name": "z", "sites": [7], "strength": 0.1}])
    with pytest.raises(ValueError, match="outside"):
        Simulator().run(state, ham, params, bad)


def test_noise_validation_rejects_bad_matrix_shape():
    import pytest

    state, ham, params, _ = tfim_setup(3)
    bad = NoiseModel(
        [{"name": "c", "sites": [0], "strength": 0.1, "matrix": np.eye(4)}]
    )
    with pytest.raises(ValueError, match="shape"):
        Simulator().run(state, ham, params, bad)
