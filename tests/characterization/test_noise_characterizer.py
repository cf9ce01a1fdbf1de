"""Noise characterization: CMA-ES recovers known Lindblad rates."""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, State
from yaqs_tpu.characterization.noise.cma import cma_opt
from yaqs_tpu.characterization.noise.optimization import resolve_noise_representation
from yaqs_tpu.noise_characterizer import NoiseCharacterizer


def test_cma_sphere():
    res = cma_opt(lambda x: float(np.sum((x - 1.5) ** 2)), np.zeros(4), 0.5, max_iter=200, seed=0)
    np.testing.assert_allclose(res.x_best, 1.5, atol=1e-4)


def test_cma_rosenbrock_2d():
    def rosen(x):
        return float(100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2)

    res = cma_opt(rosen, np.array([-1.0, 1.0]), 0.5, max_iter=400, seed=1)
    assert res.f_best < 1e-6, res.f_best


def test_cma_respects_bounds():
    res = cma_opt(
        lambda x: float(np.sum((x + 2.0) ** 2)),  # unconstrained optimum at -2
        np.array([0.5]),
        0.3,
        x_low=np.array([0.0]),
        x_up=np.array([1.0]),
        max_iter=100,
        seed=2,
    )
    assert 0.0 <= res.x_best[0] <= 1e-6


def test_representation_cutover():
    assert resolve_noise_representation(4) == "density_matrix"
    assert resolve_noise_representation(9) == "vector"
    assert resolve_noise_representation(12) == "mps"
    assert resolve_noise_representation(12, representation="vector") == "vector"


def test_recover_dephasing_rate_lindblad():
    """Fit a single dephasing rate on a 2-qubit chain (exact Lindblad forward
    model -> deterministic loss -> tight recovery)."""
    L = 2
    gamma_true = 0.12
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    procs = [{"name": "z", "sites": [i], "strength": gamma_true} for i in range(L)]
    reference = NoiseModel(procs)
    init_guess = NoiseModel(
        [{"name": "z", "sites": [i], "strength": 0.3} for i in range(L)]
    )
    obs = [Observable("z", i) for i in range(L)] + [Observable("x", 0)]
    params = AnalogSimParams(
        observables=obs, elapsed_time=1.0, dt=0.2, max_bond_dim=4, random_seed=0
    )
    nc = NoiseCharacterizer()
    res = nc.characterize(
        ham,
        params,
        init_state=State(L, state="x+"),
        init_guess=init_guess,
        observables=obs,
        x_low=np.zeros(2),
        x_up=np.ones(2),
        reference_model=reference,
        max_iter=80,
        seed=3,
    )
    assert res.representation == "density_matrix"
    np.testing.assert_allclose(res.strengths, gamma_true, atol=5e-3)
    assert res.loss < 1e-8


def test_requires_exactly_one_reference():
    L = 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    nm = NoiseModel([{"name": "z", "sites": [0], "strength": 0.1}])
    obs = [Observable("z", 0)]
    params = AnalogSimParams(observables=obs, elapsed_time=0.2, dt=0.1, max_bond_dim=4)
    nc = NoiseCharacterizer()
    with pytest.raises(ValueError, match="exactly one"):
        nc.characterize(
            ham,
            params,
            init_state=State(L),
            init_guess=nm,
            observables=obs,
            x_low=np.zeros(1),
            x_up=np.ones(1),
        )


def test_with_strengths_clamps_and_preserves_fields():
    from yaqs_tpu.characterization.noise.optimization import _with_strengths

    base = NoiseModel([
        {"name": "z", "sites": [0], "strength": 0.1},
        {"name": "lowering", "sites": [1], "strength": 0.2},
    ])
    out = _with_strengths(base, np.array([-0.5, 0.7]))
    assert [p["strength"] for p in out.processes] == [0.0, 0.7]
    assert [p["name"] for p in out.processes] == ["z", "lowering"]
    assert [p["sites"] for p in out.processes] == [[0], [1]]
    # The input model is untouched.
    assert [p["strength"] for p in base.processes] == [0.1, 0.2]


def test_representation_cutover_custom_cutoffs():
    assert resolve_noise_representation(6, lindblad_max_qubits=4) == "vector"
    assert (
        resolve_noise_representation(6, lindblad_max_qubits=4, vector_max_qubits=5)
        == "mps"
    )
    assert resolve_noise_representation(3, representation="mps") == "mps"


def test_fit_against_experimental_expectations():
    """The ref_expectations= path (experimental data, no reference model) must
    recover the generating rate: generate the 'experiment' with one forward
    Lindblad run, then fit from a wrong initial guess."""
    L = 2
    gamma_true = 0.15
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    obs = [Observable("x", i) for i in range(L)] + [Observable("z", 0)]
    params = AnalogSimParams(
        observables=obs, elapsed_time=0.8, dt=0.2, max_bond_dim=4, random_seed=0
    )
    from yaqs_tpu import Simulator

    truth = NoiseModel([{"name": "z", "sites": [i], "strength": gamma_true} for i in range(L)])
    ref = Simulator().run(
        State(L, state="x+", representation="density_matrix"), ham, params, truth
    ).expectation_values

    nc = NoiseCharacterizer()
    res = nc.characterize(
        ham,
        params,
        init_state=State(L, state="x+"),
        init_guess=NoiseModel(
            [{"name": "z", "sites": [i], "strength": 0.4} for i in range(L)]
        ),
        observables=obs,
        x_low=np.zeros(2),
        x_up=np.ones(2),
        ref_expectations=np.asarray(ref),
        max_iter=80,
        seed=11,
    )
    np.testing.assert_allclose(res.strengths, gamma_true, atol=5e-3)
    assert res.loss < 1e-8
    np.testing.assert_allclose(res.ref_expectations, np.asarray(ref, dtype=float))
