"""Fit Lindblad rates by CMA-ES trajectory matching (reference "digital twin"
noise characterization example)."""

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseCharacterizer, NoiseModel, Observable, State

L = 3
ham = Hamiltonian.ising(L, 1.0, 0.5)
truth = NoiseModel([{"name": "z", "sites": [i], "strength": 0.12} for i in range(L)])
guess = NoiseModel([{"name": "z", "sites": [i], "strength": 0.4} for i in range(L)])
obs = [Observable("z", i) for i in range(L)] + [Observable("x", 0)]
params = AnalogSimParams(observables=obs, elapsed_time=1.0, dt=0.2, max_bond_dim=8)

nc = NoiseCharacterizer()  # auto representation: Lindblad for small chains
res = nc.characterize(
    ham,
    params,
    init_state=State(L, state="x+"),
    init_guess=guess,
    observables=obs,
    x_low=np.zeros(L),
    x_up=np.ones(L),
    reference_model=truth,
    max_iter=60,
    seed=0,
)
print("fitted strengths:", np.round(res.strengths, 4), "(truth: 0.12)")
print("loss:", res.loss, "representation:", res.representation)
