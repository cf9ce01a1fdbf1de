"""Realistic noise models (reference docs/examples/realistic_noise_models.md).

Static disorder via distribution-valued strengths, crosstalk (adjacent
two-site) processes, long-range named pairs, and scheduled deterministic
jumps — the machinery for emulating device-calibration data.
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State

L = 6
ham = Hamiltonian.ising(L, 1.0, 0.5)
obs = [Observable("z", i) for i in range(L)]
state = State(L, state="x+")

# 1. per-site calibrated rates (e.g. measured T1 per qubit)
t1 = np.array([38.0, 41.0, 35.0, 47.0, 40.0, 44.0])  # us
nm_calibrated = NoiseModel(
    [{"name": "lowering", "sites": [i], "strength": 1.0 / t1[i]} for i in range(L)]
)

# 2. static disorder: strengths drawn once per run from a distribution
#    (gaussian / uniform dicts), reproducible through random_seed
nm_disorder = NoiseModel(
    [
        {
            "name": "z",
            "sites": [i],
            "strength": {"distribution": "normal", "mean": 0.05, "std": 0.01},
        }
        for i in range(L)
    ]
)
assert nm_disorder.has_distributions
params = AnalogSimParams(
    observables=obs, elapsed_time=0.3, dt=0.1, num_traj=4,
    max_bond_dim=8, random_seed=7,
)
res_a = Simulator().run(state, ham, params, nm_disorder)
res_b = Simulator().run(state, ham, params, nm_disorder)
np.testing.assert_array_equal(res_a.expectation_values, res_b.expectation_values)
print("disorder sampling is seed-reproducible")

# 3. crosstalk: adjacent two-site correlated dephasing (factored ZZ process)
nm_crosstalk = NoiseModel(
    [{"name": "lowering", "sites": [i], "strength": 0.02} for i in range(L)]
    + [
        {"name": "crosstalk_zz", "sites": [i, i + 1], "strength": 0.01}
        for i in range(L - 1)
    ]
)
res_ct = Simulator().run(state, ham, params, nm_crosstalk)
assert np.all(np.isfinite(res_ct.expectation_values))
print("crosstalk run ok")

# 4. scheduled deterministic jumps (e.g. a known reset pulse at t=0.2):
#    order-1 TJM applies the listed operator at the listed time instead of a
#    stochastic jump
nm_scheduled = NoiseModel(
    [{"name": "z", "sites": [i], "strength": 0.02} for i in range(L)],
    scheduled_jumps=[{"time": 0.2, "sites": [2], "name": "x"}],
)
params1 = AnalogSimParams(
    observables=obs, elapsed_time=0.4, dt=0.1, num_traj=4, order=1,
    max_bond_dim=8, random_seed=9,
)
res_sj = Simulator().run(state, ham, params1, nm_scheduled)
assert np.all(np.isfinite(res_sj.expectation_values))
print("scheduled-jump run ok")
