"""Unitary ensembles and multi-time correlators
<psi(t)| A U(t) B |psi(0)> (reference ensemble_evolution example)."""

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State

L = 4
ham = Hamiltonian.heisenberg(L, 1.0, 1.0, 1.0, h=0.2)
members = [State(L, state="Neel"), State(L, state="wall")]
params = AnalogSimParams(
    observables=[Observable("z", i) for i in range(L)],
    elapsed_time=0.5,
    dt=0.1,
    max_bond_dim=16,
    multi_time_observables=[(Observable("z", 0), Observable("x", 0))],
    random_seed=0,
)
res = Simulator().run(members, ham, params, None)
print("member-mean <Z_i>(T):", np.round(res.expectation_values[:, -1], 4))
print("two-time correlator <Z_0(t) X_0(0)>:")
print(np.round(res.multi_time_correlators[0], 4))
