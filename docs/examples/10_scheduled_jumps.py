"""Deterministic scheduled jumps: inject errors at chosen times
(reference scheduled_jumps example)."""

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State

L = 4
ham = Hamiltonian.ising(L, 1.0, 0.3)
noise = NoiseModel(
    processes=[{"name": "z", "sites": [i], "strength": 0.02} for i in range(L)],
    scheduled_jumps=[
        {"time": 0.2, "sites": [1], "name": "x"},  # deterministic bit flip
        {"time": 0.4, "sites": [2], "name": "x"},
    ],
)
params = AnalogSimParams(
    observables=[Observable("z", i) for i in range(L)],
    elapsed_time=0.6,
    dt=0.1,
    order=1,  # scheduled jumps run on the order-1 TJM path
    num_traj=64,
    max_bond_dim=8,
    random_seed=5,
)
res = Simulator().run(State(L, state="zeros"), ham, params, noise)
print("<Z_1>(t):", np.round(res.expectation_values[1], 3))
print("<Z_2>(t):", np.round(res.expectation_values[2], 3))
