"""Noise-characterization recovery battery.

Mirrors the reference's optimization-run contracts
(/root/reference/tests/characterization/noise/optimization/test_run.py:
two-site crosstalk and multi-rate digital-twin recovery;
shared/test_propagation.py: deterministic Lindblad loss; test_run.py
mcwf/tjm smoke) with this package's deterministic density-matrix forward
model as the oracle:

- CMA-ES recovers a known adjacent two-site crosstalk rate;
- a three-parameter digital twin (relaxation + dephasing + crosstalk)
  recovers all rates jointly;
- the whole characterization is seed-deterministic end to end;
- the stochastic representations (vector/MCWF, mps/TJM) run the same
  pipeline at small sizes and return the result contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, State
from yaqs_tpu.noise_characterizer import NoiseCharacterizer


def _characterize(reference, init_guess, *, L=3, obs=None, max_iter=60, seed=3,
                  representation="auto", num_traj=None, elapsed=1.0, dt=0.2):
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    obs = obs or ([Observable("z", i) for i in range(L)]
                  + [Observable("x", 0), Observable("x", L - 1)])
    kwargs = dict(observables=obs, elapsed_time=elapsed, dt=dt, max_bond_dim=8,
                  random_seed=0)
    if num_traj is not None:
        kwargs["num_traj"] = num_traj
    params = AnalogSimParams(**kwargs)
    n = len(init_guess.processes)
    return NoiseCharacterizer().characterize(
        ham,
        params,
        init_state=State(L, state="x+"),
        init_guess=init_guess,
        observables=obs,
        x_low=np.zeros(n),
        x_up=np.ones(n),
        reference_model=reference,
        max_iter=max_iter,
        seed=seed,
        representation=representation,
    )


def test_recover_crosstalk_rate():
    """A single adjacent two-site crosstalk_zz rate is recovered tightly by
    the deterministic Lindblad forward model (reference
    test_run_optimization_characterization_two_site_crosstalk)."""
    gamma_true = 0.18
    reference = NoiseModel(
        [{"name": "crosstalk_zz", "sites": [0, 1], "strength": gamma_true}]
    )
    guess = NoiseModel(
        [{"name": "crosstalk_zz", "sites": [0, 1], "strength": 0.5}]
    )
    res = _characterize(reference, guess, max_iter=60)
    assert res.representation == "density_matrix"
    np.testing.assert_allclose(res.strengths, gamma_true, atol=5e-3)
    assert res.loss < 1e-7


@pytest.mark.slow
def test_recover_three_rate_digital_twin():
    """Relaxation + dephasing + crosstalk recovered jointly.  Identifiability
    needs x/y/z observables on EVERY site: with only z-basis + edge-x probes
    the site-1 dephasing direction is near-degenerate with the crosstalk
    channel (measured: the wrong point [0.15, 0, 0.185] sits at loss 3.8e-6)
    and CMA parks the rate at the boundary (reference three-site
    digital-twin run)."""
    L = 3
    true = np.array([0.15, 0.08, 0.2])
    procs = lambda s: [
        {"name": "relaxation", "sites": [0], "strength": s[0]},
        {"name": "dephasing", "sites": [1], "strength": s[1]},
        {"name": "crosstalk_xx", "sites": [1, 2], "strength": s[2]},
    ]
    obs = [Observable(p, i) for i in range(L) for p in ("x", "y", "z")]
    res = _characterize(NoiseModel(procs(true)), NoiseModel(procs([0.5, 0.5, 0.5])),
                        obs=obs, max_iter=200, seed=5, elapsed=1.5, dt=0.25)
    np.testing.assert_allclose(res.strengths, true, atol=5e-3)
    assert res.loss < 1e-7
    # the fitted model preserves process identities and site assignments
    fitted = res.noise_model.processes
    assert [p["name"] for p in fitted] == ["relaxation", "dephasing", "crosstalk_xx"]
    assert [p["sites"] for p in fitted] == [[0], [1], [1, 2]]


def test_characterization_is_seed_deterministic():
    """Same inputs + seed -> identical strengths, loss, and fitted curves
    (the Lindblad forward is deterministic and CMA is seeded)."""
    reference = NoiseModel([{"name": "z", "sites": [0], "strength": 0.1}])
    guess = NoiseModel([{"name": "z", "sites": [0], "strength": 0.4}])
    a = _characterize(reference, guess, L=2, max_iter=20, seed=11)
    b = _characterize(reference, guess, L=2, max_iter=20, seed=11)
    np.testing.assert_array_equal(a.strengths, b.strengths)
    assert a.loss == b.loss
    np.testing.assert_array_equal(a.fitted_expectations, b.fitted_expectations)


def test_different_seed_changes_the_search():
    reference = NoiseModel([{"name": "z", "sites": [0], "strength": 0.1}])
    guess = NoiseModel([{"name": "z", "sites": [0], "strength": 0.4}])
    a = _characterize(reference, guess, L=2, max_iter=8, seed=1)
    b = _characterize(reference, guess, L=2, max_iter=8, seed=2)
    # the optimum is shared but the sampled search paths differ
    assert not np.array_equal(a.optimizer.history, b.optimizer.history)


@pytest.mark.slow
@pytest.mark.parametrize("representation", ["vector", "mps"])
def test_stochastic_representations_smoke(representation):
    """MCWF (vector) and TJM (mps) forward models run the same pipeline and
    return the full result contract (reference test_mcwf_and_tjm_smoke)."""
    reference = NoiseModel([{"name": "z", "sites": [0], "strength": 0.15}])
    guess = NoiseModel([{"name": "z", "sites": [0], "strength": 0.3}])
    res = _characterize(reference, guess, L=2, max_iter=3, seed=0,
                        representation=representation, num_traj=4,
                        elapsed=0.4, dt=0.2)
    assert res.representation == representation
    assert res.strengths.shape == (1,)
    assert np.isfinite(res.loss)
    assert res.fitted_expectations.shape == res.ref_expectations.shape
    assert len(res.optimizer.history) > 0
