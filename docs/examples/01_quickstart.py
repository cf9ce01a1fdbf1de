"""Quickstart: noisy analog evolution of a transverse-field Ising chain.

Mirrors the reference's quickstart notebook (mqt-yaqs docs/examples/
quickstart): build a product state, an Ising Hamiltonian, a relaxation noise
model, and run a TJM trajectory ensemble.
"""

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State

L = 10
state = State(L, state="x+")
ham = Hamiltonian.ising(L, J=1.0, g=0.5)
noise = NoiseModel(
    [{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(L)]
)
params = AnalogSimParams(
    observables=[Observable("z", i) for i in range(L)],
    elapsed_time=1.0,
    dt=0.1,
    num_traj=128,
    order=2,
    max_bond_dim=16,
    svd_threshold=1e-8,
    random_seed=42,
)

result = Simulator().run(state, ham, params, noise)
print("times:", result.times)
print("<Z_0>(t):", np.round(result.expectation_values[0], 4))
print("trajectories:", result.num_trajectories)
