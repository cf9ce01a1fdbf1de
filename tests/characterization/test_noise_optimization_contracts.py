"""Noise-optimization input/validation contracts and CMA backend behavior.

Mirrors the reference's optimization test block (tests/characterization/
noise/optimization/test_{loss,trajectories,results}.py and
backends/test_cma.py): wrong-length bound vectors, mis-shaped reference
trajectories (which would otherwise silently BROADCAST inside the MSE loss),
empty observable lists, seed forwarding, and result-field contracts.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, State
from yaqs_tpu.characterization.noise.cma import cma_opt
from yaqs_tpu.characterization.noise.optimization import (
    run_optimization_characterization,
)


def _setup(L=3):
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.2,
        dt=0.1,
        max_bond_dim=4,
        num_traj=1,
        random_seed=0,
    )
    guess = NoiseModel(
        [{"name": "relaxation", "sites": [i], "strength": 0.05} for i in range(L)]
    )
    obs = [Observable("z", i) for i in range(L)]
    return ham, params, guess, obs


def _run(ham, params, guess, obs, **kw):
    defaults = dict(
        hamiltonian=ham,
        sim_params=params,
        init_state=State(3),
        init_guess=guess,
        observables=obs,
        x_low=np.zeros(len(guess.processes)),
        x_up=np.full(len(guess.processes), 0.2),
        max_iter=1,
        popsize=4,
        seed=0,
    )
    defaults.update(kw)
    return run_optimization_characterization(**defaults)


def test_rejects_empty_observables():
    ham, params, guess, _ = _setup()
    with pytest.raises(ValueError, match="non-empty"):
        _run(ham, params, guess, [], reference_model=guess)


def test_rejects_wrong_length_bounds():
    ham, params, guess, obs = _setup()
    with pytest.raises(ValueError, match="one bound per noise process"):
        _run(ham, params, guess, obs, reference_model=guess, x_low=np.zeros(1))
    with pytest.raises(ValueError, match="one bound per noise process"):
        _run(
            ham,
            params,
            guess,
            obs,
            reference_model=guess,
            x_up=np.full(len(guess.processes) + 2, 0.2),
        )


def test_rejects_misshaped_reference_trajectories():
    ham, params, guess, obs = _setup()
    # one row per observable is the contract; a flat vector must be rejected
    # rather than broadcast into a silently wrong MSE
    with pytest.raises(ValueError, match="num_observables, num_timesteps"):
        _run(ham, params, guess, obs, ref_expectations=np.zeros(5))
    with pytest.raises(ValueError, match="num_observables, num_timesteps"):
        _run(ham, params, guess, obs, ref_expectations=np.zeros((len(obs) + 1, 3)))


def test_result_field_contract():
    ham, params, guess, obs = _setup()
    res = _run(ham, params, guess, obs, reference_model=guess)
    assert res.representation == "density_matrix"  # L=3 resolves to Lindblad
    assert res.ref_expectations.shape == res.fitted_expectations.shape
    assert res.ref_expectations.shape[0] == len(obs)
    assert res.strengths.shape == (len(guess.processes),)
    assert np.all(res.strengths >= 0.0)
    assert res.loss == pytest.approx(res.optimizer.f_best)
    # fitted model carries the fitted strengths in process order
    np.testing.assert_allclose(
        [p["strength"] for p in res.noise_model.processes], res.strengths
    )


# -- CMA backend contracts -----------------------------------------------------


def _sphere(x):
    return float(np.sum((x - 0.3) ** 2))


def test_cma_seed_reproducible():
    a = cma_opt(_sphere, np.zeros(3), 0.5, seed=7, max_iter=20)
    b = cma_opt(_sphere, np.zeros(3), 0.5, seed=7, max_iter=20)
    np.testing.assert_array_equal(a.x_best, b.x_best)
    assert a.f_best == b.f_best


def test_cma_seed_changes_trajectory():
    a = cma_opt(_sphere, np.zeros(3), 0.5, seed=1, max_iter=5)
    b = cma_opt(_sphere, np.zeros(3), 0.5, seed=2, max_iter=5)
    assert not np.array_equal(a.x_best, b.x_best)


def test_cma_history_tracks_best_so_far():
    res = cma_opt(_sphere, np.zeros(2), 0.5, seed=3, max_iter=30)
    hist = np.asarray(res.history)
    assert np.all(np.diff(np.minimum.accumulate(hist)) <= 0)
    assert res.f_best <= hist.min() + 1e-15
    assert len(hist) == res.n_iters + 1  # f(x0) entry + one per iteration


def test_cma_scalar_one_dimensional_problem():
    res = cma_opt(lambda x: float((x[0] - 1.5) ** 2), np.zeros(1), 0.5, seed=0, max_iter=80)
    assert abs(res.x_best[0] - 1.5) < 1e-3


def test_cma_best_never_worse_than_x0():
    f0 = _sphere(np.zeros(3))
    res = cma_opt(_sphere, np.zeros(3), 0.3, seed=4, max_iter=10)
    assert res.f_best <= f0
