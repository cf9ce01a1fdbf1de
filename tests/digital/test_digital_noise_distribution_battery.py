"""Digital-path noise-model integration: distributions, result recording.

The analog counterpart lives in tests/core/test_noise_model_breadth.py; the
digital engine samples the same NoiseModel once per run and must record the
realized (float-strength) model on the result, share it across all
trajectories, and reproduce under the same seed.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import DigitalSimParams, NoiseModel, Observable, Simulator, State
from yaqs_tpu.digital.circuit import Circuit


def _circ(n=3):
    c = Circuit(n)
    for i in range(n):
        c.h(i)
    for i in range(0, n - 1, 2):
        c.cx(i, i + 1)
    return c


def _params(**kw):
    base = dict(
        observables=[Observable("z", i) for i in range(3)],
        num_traj=4,
        max_bond_dim=8,
        random_seed=9,
    )
    base.update(kw)
    return DigitalSimParams(**base)


def test_distribution_sampled_once_and_recorded():
    nm = NoiseModel([
        {"name": "lowering", "sites": [i],
         "strength": {"distribution": "normal", "mean": 0.05, "std": 0.005}}
        for i in range(3)
    ])
    res = Simulator().run(State(3), _circ(), _params(), nm)
    assert res.noise_model is not None
    strengths = [p["strength"] for p in res.noise_model.processes]
    assert all(isinstance(s, float) for s in strengths)
    assert len(set(strengths)) > 1  # independent per-site draws
    # user model untouched
    assert isinstance(nm.processes[0]["strength"], dict)


def test_same_seed_reproduces_sampled_model_and_results():
    nm = NoiseModel([
        {"name": "lowering", "sites": [0],
         "strength": {"distribution": "lognormal", "mean": -3.0, "std": 0.2}},
    ])
    r1 = Simulator().run(State(3), _circ(), _params(), nm)
    r2 = Simulator().run(State(3), _circ(), _params(), nm)
    assert r1.noise_model.processes[0]["strength"] == r2.noise_model.processes[0]["strength"]
    np.testing.assert_array_equal(r1.trajectories, r2.trajectories)


def test_different_seed_changes_draw():
    nm = NoiseModel([
        {"name": "lowering", "sites": [0],
         "strength": {"distribution": "normal", "mean": 0.1, "std": 0.05}},
    ])
    r1 = Simulator().run(State(3), _circ(), _params(random_seed=1), nm)
    r2 = Simulator().run(State(3), _circ(), _params(random_seed=2), nm)
    assert (
        r1.noise_model.processes[0]["strength"]
        != r2.noise_model.processes[0]["strength"]
    )


def test_zero_std_distribution_is_deterministic_mean():
    nm = NoiseModel([
        {"name": "lowering", "sites": [0],
         "strength": {"distribution": "normal", "mean": 0.07, "std": 0.0}},
    ])
    res = Simulator().run(State(3), _circ(), _params(), nm)
    assert res.noise_model.processes[0]["strength"] == pytest.approx(0.07)


def test_sampled_zero_strengths_behave_noiseless():
    """A distribution that realizes to all-zero strengths must match the
    noiseless run (single deterministic trajectory)."""
    nm = NoiseModel([
        {"name": "lowering", "sites": [i],
         "strength": {"distribution": "truncated_normal", "mean": -1.0, "std": 0.0}}
        for i in range(3)
    ])
    res = Simulator().run(State(3), _circ(), _params(), nm)
    res0 = Simulator().run(State(3), _circ(), _params(), None)
    np.testing.assert_allclose(
        np.asarray(res.expectation_values),
        np.asarray(res0.expectation_values),
        atol=1e-10,
    )


def test_noise_model_none_not_recorded():
    res = Simulator().run(State(3), _circ(), _params(), None)
    assert res.noise_model is None
