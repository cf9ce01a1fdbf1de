"""Scheduled deterministic jumps (order-1 analog TJM)."""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State


def test_scheduled_x_flip():
    """An X jump scheduled mid-run flips <Z> deterministically (H = 0-ish)."""
    L = 3
    ham = Hamiltonian.ising(L, J=0.0, g=0.0)  # trivial Hamiltonian
    nm = NoiseModel(
        processes=[],
        scheduled_jumps=[{"time": 0.2, "sites": [1], "name": "x"}],
    )
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=0.4,
        dt=0.1,
        order=1,
        max_bond_dim=4,
        sample_timesteps=True,
        random_seed=0,
    )
    res = Simulator().run(State(L, state="zeros"), ham, params, nm)
    z1 = res.expectation_values[1]
    np.testing.assert_allclose(z1[:2], 1.0, atol=1e-10)  # t=0, 0.1
    np.testing.assert_allclose(z1[2:], -1.0, atol=1e-10)  # flipped at t=0.2
    np.testing.assert_allclose(res.expectation_values[0], 1.0, atol=1e-10)


def test_scheduled_with_stochastic_noise_runs():
    L = 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    nm = NoiseModel(
        processes=[{"name": "z", "sites": [i], "strength": 0.05} for i in range(L)],
        scheduled_jumps=[{"time": 0.1, "sites": [0], "name": "x"}],
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.2,
        dt=0.1,
        order=1,
        num_traj=8,
        max_bond_dim=4,
        random_seed=1,
    )
    res = Simulator().run(State(L), ham, params, nm)
    assert np.isfinite(res.expectation_values).all()


def test_scheduled_requires_order1():
    L = 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    nm = NoiseModel(processes=[], scheduled_jumps=[{"time": 0.1, "sites": [0], "name": "x"}])
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.2, dt=0.1, order=2, max_bond_dim=4
    )
    with pytest.raises(ValueError, match="order=1"):
        Simulator().run(State(L), ham, params, nm)


def test_scheduled_off_grid_time_rejected():
    from yaqs_tpu.methods.scheduled_jumps import compile_scheduled_jumps

    with pytest.raises(ValueError, match="time grid"):
        compile_scheduled_jumps(
            [{"time": 0.15, "sites": [0], "name": "x"}], np.arange(5) * 0.1, 2
        )
