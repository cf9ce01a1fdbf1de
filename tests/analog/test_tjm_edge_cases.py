"""Order-2 TJM short-run / zero-duration edge cases.

Mirrors /root/reference/tests/test_simulator.py:1850-1929 (short runs return
observables and state; zero-duration final-only skips dissipation before
measuring) against the batched TPU-native trajectory program.
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


@pytest.mark.parametrize("elapsed_time", [0.0, 0.1])
@pytest.mark.parametrize("sample_timesteps", [True, False])
def test_order_2_short_runs_return_observables_and_state(
    elapsed_time, sample_timesteps
):
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        dt=0.1,
        elapsed_time=elapsed_time,
        num_traj=1,
        order=2,
        sample_timesteps=sample_timesteps,
        get_state=True,
        random_seed=0,
        max_bond_dim=8,
    )
    res = Simulator().run(State(2, state="zeros"), ham, params)
    z = np.asarray(res.expectation_values[0], dtype=complex).reshape(-1)
    assert res.output_state is not None
    assert np.isfinite(z.real).all()
    # |0> has Z=+1 at t=0; short unitary evolution keeps |Z| near 1
    assert np.all(np.abs(z.real) > 0.5)


def test_order_2_final_only_matches_sampled_final_column_short_run():
    ham = Hamiltonian.ising(2, 1.0, 0.5)

    def run(sample_timesteps):
        params = AnalogSimParams(
            observables=[Observable("z", 0)],
            dt=0.1,
            elapsed_time=0.1,
            num_traj=1,
            order=2,
            sample_timesteps=sample_timesteps,
            random_seed=0,
            max_bond_dim=8,
        )
        res = Simulator().run(State(2, state="zeros"), ham, params)
        return np.asarray(res.expectation_values[0], dtype=complex).reshape(-1)

    z_final = run(False)
    z_sampled = run(True)
    assert float(z_final[0].real) == pytest.approx(
        float(z_sampled[-1].real), abs=1e-10
    )


@pytest.mark.parametrize("sample_timesteps", [True, False])
def test_order_2_zero_duration_skips_noise(sample_timesteps):
    """elapsed_time=0 must not apply the F0 half-step dissipation before the
    t=0 measurement: lowering noise on |+> would shift Z away from 0."""
    ham = Hamiltonian(matrix=np.zeros((2, 2), dtype=complex))
    noise = NoiseModel([{"name": "lowering", "sites": [0], "strength": 1.0}])
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        dt=0.1,
        elapsed_time=0.0,
        num_traj=1,
        order=2,
        sample_timesteps=sample_timesteps,
        random_seed=0,
        max_bond_dim=4,
    )
    res = Simulator().run(State(1, state="x+"), ham, params, noise)
    z = float(np.asarray(res.expectation_values[0], dtype=complex).reshape(-1)[0].real)
    assert z == pytest.approx(0.0, abs=1e-10)


def test_order_1_zero_duration_returns_t0_column():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    noise = NoiseModel([{"name": "x", "sites": [0], "strength": 0.3}])
    params = AnalogSimParams(
        observables=[Observable("z", 0), Observable("z", 1)],
        dt=0.1,
        elapsed_time=0.0,
        num_traj=2,
        order=1,
        random_seed=0,
        max_bond_dim=4,
    )
    res = Simulator().run(State(2, state="zeros"), ham, params, noise)
    vals = np.asarray(res.expectation_values)
    assert vals.shape == (2, 1)
    np.testing.assert_allclose(vals[:, 0], [1.0, 1.0], atol=1e-8)
