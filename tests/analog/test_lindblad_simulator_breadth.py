"""Lindblad-via-Simulator edge breadth (reference tests/analog/test_lindblad.py).

The physics oracles (amplitude damping, Rabi, dephasing rates) live in
test_lindblad_physics.py; this file mirrors the reference file's remaining
*orchestration* contracts: get_state toggles, diagnostics absence, zero-
strength routing, propagator time-grid completeness, and Simulator
constructor parity knobs (show_progress / retry_exceptions / max_workers —
accepted for reference API compatibility).
"""

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


def _dm_params(**kw):
    base = dict(
        observables=[Observable("z", 0), Observable("z", 1)],
        elapsed_time=0.5,
        dt=0.1,
        sample_timesteps=True,
    )
    base.update(kw)
    return AnalogSimParams(**base)


def _noise(gamma=0.2):
    return NoiseModel([
        {"name": "lowering", "sites": [i], "strength": gamma} for i in range(2)
    ])


def test_density_matrix_records_every_timepoint():
    """The propagator path records t=0 plus every dt step (reference
    test_lindblad_propagator_records_all_timepoints)."""
    res = Simulator().run(
        State(2, representation="density_matrix"),
        Hamiltonian.ising(2, 1.0, 0.5),
        _dm_params(),
        _noise(),
    )
    ev = np.asarray(res.expectation_values)
    assert ev.shape == (2, 6)
    assert res.times is not None and len(res.times) == 6
    np.testing.assert_allclose(res.times, np.arange(6) * 0.1, atol=1e-12)
    # t=0: |00> has <z> = +1 on both sites
    np.testing.assert_allclose(ev[:, 0], [1.0, 1.0], atol=1e-10)


def test_density_matrix_final_only_when_not_sampling():
    res = Simulator().run(
        State(2, representation="density_matrix"),
        Hamiltonian.ising(2, 1.0, 0.5),
        _dm_params(sample_timesteps=False),
        _noise(),
    )
    assert np.asarray(res.expectation_values).shape[-1] == 1


def test_density_matrix_without_get_state_has_no_output_state():
    res = Simulator().run(
        State(2, representation="density_matrix"),
        Hamiltonian.ising(2, 1.0, 0.5),
        _dm_params(),
        _noise(),
    )
    assert res.output_state is None


def test_density_matrix_get_state_is_normalized_hermitian_psd():
    p = _dm_params(get_state=True)
    res = Simulator().run(
        State(2, representation="density_matrix"),
        Hamiltonian.ising(2, 1.0, 0.5),
        p,
        _noise(),
    )
    assert res.output_state is not None
    rho = np.asarray(res.output_state.density_matrix)
    assert rho.shape == (4, 4)
    np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-10)
    np.testing.assert_allclose(rho, rho.conj().T, atol=1e-12)
    assert np.linalg.eigvalsh(rho)[0] > -1e-10


def test_lindblad_result_has_no_trajectory_diagnostics():
    """Bond-dimension/cost curves are MPS-trajectory diagnostics; the exact
    density-matrix path must not fabricate them (reference
    test_lindblad_result_has_no_auto_diagnostics)."""
    res = Simulator().run(
        State(2, representation="density_matrix"),
        Hamiltonian.ising(2, 1.0, 0.5),
        _dm_params(),
        _noise(),
    )
    assert res.runtime_cost is None
    assert res.max_bond is None
    assert res.trajectories is None or res.trajectories.shape[0] == 1


def test_zero_strength_noise_matches_noiseless_density_matrix():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    res0 = Simulator().run(
        State(2, representation="density_matrix"), ham, _dm_params(), None
    )
    resz = Simulator().run(
        State(2, representation="density_matrix"), ham, _dm_params(), _noise(0.0)
    )
    np.testing.assert_allclose(
        np.asarray(res0.expectation_values),
        np.asarray(resz.expectation_values),
        atol=1e-10,
    )


def test_density_matrix_num_trajectories_is_one():
    """The exact solver ignores num_traj (deterministic evolution)."""
    res = Simulator().run(
        State(2, representation="density_matrix"),
        Hamiltonian.ising(2, 1.0, 0.5),
        _dm_params(num_traj=64),
        _noise(),
    )
    assert res.num_trajectories == 1


# ----------------------------------------------------- constructor parity
def test_simulator_parity_knobs_accepted():
    """max_workers / mp_context / retry_exceptions are reference process-pool
    knobs; the TPU runtime accepts them so reference call sites port
    unchanged (simulator.py docstring)."""
    sim = Simulator(max_workers=4, mp_context="spawn",
                    retry_exceptions=(RuntimeError,), max_retries=1)
    res = sim.run(
        State(2), Hamiltonian.ising(2, 1.0, 0.5),
        _dm_params(num_traj=2, max_bond_dim=4), _noise()
    )
    assert np.asarray(res.expectation_values).shape == (2, 6)


def test_simulator_show_progress_prints_nothing_when_disabled(capsys):
    p = AnalogSimParams(observables=[Observable("z", 0)], elapsed_time=0.2,
                        dt=0.1, num_traj=2, max_bond_dim=4, random_seed=0)
    Simulator(show_progress=False).run(
        State(2), Hamiltonian.ising(2, 1.0, 0.5), p, _noise()
    )
    assert capsys.readouterr().out == ""


def test_simulator_module_does_not_export_run():
    """`run` is a Simulator method, not a module-level function (reference
    test_simulator_module_does_not_export_run)."""
    import yaqs_tpu.simulator as sim_mod

    assert not hasattr(sim_mod, "run")
    assert "run" not in getattr(sim_mod, "__all__", [])


def test_simulator_constructor_rejects_bad_workers_and_retries():
    with pytest.raises(TypeError):
        Simulator(max_workers=True)
    with pytest.raises(ValueError):
        Simulator(max_workers=0)
    with pytest.raises(TypeError):
        Simulator(max_retries="2")
    with pytest.raises(ValueError):
        Simulator(max_retries=-1)
