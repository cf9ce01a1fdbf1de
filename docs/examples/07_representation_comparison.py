"""Cross-backend agreement: TJM (MPS) vs MCWF (vector) vs Lindblad (density
matrix) on the same noisy system (reference representation_comparison)."""

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State

L, gamma = 3, 0.2
ham = Hamiltonian.ising(L, 1.0, 0.5)
noise = NoiseModel([{"name": "lowering", "sites": [i], "strength": gamma} for i in range(L)])
obs = [Observable("z", i) for i in range(L)]

for rep in ("density_matrix", "vector", "mps"):
    params = AnalogSimParams(
        observables=obs, elapsed_time=0.5, dt=0.1, num_traj=200,
        max_bond_dim=8, order=2, random_seed=11,
    )
    res = Simulator().run(State(L, state="x+", representation=rep), ham, params, noise)
    print(f"{rep:>15}: <Z>(T) = {np.round(res.expectation_values[:, -1], 3)}"
          f"  ({res.num_trajectories} traj)")
