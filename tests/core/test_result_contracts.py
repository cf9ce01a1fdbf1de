"""Result aggregation and diagnostics contracts through the full facade.

Mirrors the reference's aggregate_trajectories battery
(/root/reference/tests/core/data_structures/test_simulation_parameters.py:
577-664: regular-observable means, Schmidt concatenation, mixed regular +
Schmidt rows) and the diagnostics-curve semantics, exercised end to end
rather than on mocks: the aggregation path under test is the one users hit.
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import (
    AnalogSimParams,
    DigitalSimParams,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)
from yaqs_tpu.digital.circuit import Circuit

L = 3
HAM = Hamiltonian.ising(L, 1.0, 0.5)
NOISE = NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.2} for i in range(L)])


def _run(observables, *, num_traj=6, noise=NOISE, seed=1):
    params = AnalogSimParams(
        observables=observables,
        elapsed_time=0.3,
        dt=0.1,
        num_traj=num_traj,
        max_bond_dim=8,
        random_seed=seed,
    )
    return Simulator().run(State(L, state="x+"), HAM, params, noise)


def test_expectation_is_trajectory_mean():
    res = _run([Observable("z", i) for i in range(L)])
    np.testing.assert_allclose(
        res.expectation_values, res.trajectories.mean(axis=0), atol=1e-12
    )
    assert res.num_trajectories == 6
    np.testing.assert_allclose(
        res.aggregate(res.trajectories), res.expectation_values, atol=1e-12
    )


def test_mixed_regular_and_schmidt_rows_keep_user_order():
    """Interleaving a Schmidt-spectrum observable must not shift the regular
    rows: expectation_values stays indexed by user order with the spectrum
    row resolved through Result.observable."""
    obs = [
        Observable("z", 0),
        Observable("schmidt_spectrum", [0, 1]),
        Observable("x", 2),
    ]
    strong = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 1.5} for i in range(L)]
    )
    res = _run(obs, num_traj=8, noise=strong)
    only_regular = _run([Observable("z", 0), Observable("x", 2)], num_traj=8, noise=strong)
    np.testing.assert_allclose(
        res.observable(0), only_regular.expectation_values[0], atol=1e-12
    )
    np.testing.assert_allclose(
        res.observable(2), only_regular.expectation_values[1], atol=1e-12
    )
    spec = res.observable(1)
    assert spec.ndim == 3 and spec.shape[0] == res.num_trajectories
    # spectra are concatenated per trajectory, never averaged
    assert not np.allclose(spec[0], spec.mean(axis=0))
    # squared Schmidt values are normalized at every (trajectory, time)
    np.testing.assert_allclose((spec**2).sum(axis=1), 1.0, atol=1e-6)


def test_diagnostics_curves_shapes_and_bounds():
    # the analog facade always records the cost/bond curves (reference
    # MPS.record_diagnostics parity) — no opt-in knob
    res = _run([Observable("z", 0)])
    n_times = len(res.times)
    for curve in (res.runtime_cost, res.max_bond, res.total_bond):
        assert curve is not None
        assert curve.shape[-1] == n_times
    assert np.all(res.max_bond >= 1)
    assert np.all(res.max_bond <= 8)
    assert np.all(res.total_bond >= res.max_bond)


def test_noise_model_recorded_on_result():
    res = _run([Observable("z", 0)])
    assert res.noise_model is not None
    res_clean = _run([Observable("z", 0)], noise=None)
    assert res_clean.noise_model is None


def test_multi_time_properties_roundtrip():
    z0 = Observable("z", 0)
    params = AnalogSimParams(
        observables=[],
        elapsed_time=0.2,
        dt=0.1,
        multi_time_observables=[(z0, z0)],
        max_bond_dim=8,
    )
    res = Simulator().run(
        [State(L, state="zeros"), State(L, state="ones")], HAM, params, None
    )
    assert res.multi_time_results is not None
    assert res.multi_time_results is res.multi_time_correlators
    np.testing.assert_array_equal(res.multi_time_times, res.times)
    assert np.iscomplexobj(res.multi_time_results)
    # autocorrelator at t=0 is <Z Z> = 1 on basis states
    np.testing.assert_allclose(res.multi_time_results[0, 0], 1.0 + 0j, atol=1e-10)


def test_digital_counts_sum_to_shots_times_traj():
    n = 3
    c = Circuit(n)
    c.h(0)
    c.cx(0, 1)
    c.measure()
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(n)],
        num_traj=4,
        shots=64,
        max_bond_dim=8,
        random_seed=2,
    )
    res = Simulator().run(State(n), c, params, NOISE)
    assert res.counts is not None
    # shots is the TOTAL sample budget, distributed across trajectories
    # (tests/digital/test_digital_contract.py noisy-shots contract)
    assert sum(res.counts.values()) == 64
    # counts keys are ints with qubit i at bit 2**i (frozen digital contract)
    assert all(isinstance(k, (int,)) and 0 <= k < 2**n for k in res.counts)


def test_digital_counts_respect_measured_subset():
    n = 3
    c = Circuit(n)
    c.x(2)
    c.measure([2, 0])
    params = DigitalSimParams(shots=32, max_bond_dim=4, random_seed=3)
    res = Simulator().run(State(n), c, params, None)
    assert res.counts is not None
    # qubit 2 is |1> and measured; qubit 1 is unmeasured so its bit stays 0
    assert res.counts == {4: 32}


def test_seeded_rerun_reproduces_result_exactly():
    # strong noise so different seeds must realize different jump patterns
    strong = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 1.5} for i in range(L)]
    )
    obs = [Observable("z", i) for i in range(L)]
    a = _run(obs, num_traj=16, noise=strong, seed=9)
    b = _run(obs, num_traj=16, noise=strong, seed=9)
    np.testing.assert_array_equal(a.trajectories, b.trajectories)
    c = _run(obs, num_traj=16, noise=strong, seed=10)
    assert not np.array_equal(a.trajectories, c.trajectories)
