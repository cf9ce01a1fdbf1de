"""Transmon-resonator chain emulation (reference docs/examples/transmon_emulation.md).

A qubit-resonator-qubit chain built with ``Hamiltonian.coupled_transmon``
(qutrit local dimensions so |2> leakage is representable).  We prepare |100>
(left transmon excited) and evolve for one resonant swap period
``T_swap = pi / (sqrt(2) g)``, once noiselessly and once with relaxation noise
on the qubit sites; PVM observables track bitstring probabilities.
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State

length = 3  # qubit - resonator - qubit
dims = [3, 3, 3]
g = 0.1
ham = Hamiltonian.coupled_transmon(
    length,
    qubit_dim=3,
    resonator_dim=3,
    qubit_freq=1.0,
    resonator_freq=1.0,
    anharmonicity=-0.3,
    coupling=g,
)

t_swap = np.pi / (np.sqrt(2) * g)
steps = 16
state = State(length, basis_string="100", physical_dimensions=dims)

observables = [Observable("100"), Observable("001"), Observable("000")]
params = AnalogSimParams(
    observables=observables,
    elapsed_time=t_swap,
    dt=t_swap / steps,
    max_bond_dim=9,
    svd_threshold=1e-10,
    krylov_dim=12,
    order=2,
    sample_timesteps=True,
)

# 1. noiseless swap: |100> population transfers toward |001>
res = Simulator().run(state, ham, params, None)
p100, p001, _ = np.asarray(res.expectation_values)
print(f"noiseless: P(100) {p100[0]:.3f} -> {p100[-1]:.3f}, "
      f"P(001) {p001[0]:.3f} -> {p001[-1]:.3f}")
assert p100[0] > 0.99 and p001[0] < 0.01

# 2. relaxation on the qubit sites degrades the swap fidelity
# qutrit relaxation: explicit (3, 3) lowering operator b = sum sqrt(n)|n-1><n|
b3 = np.diag(np.sqrt([1.0, 2.0]), k=1)
noise = NoiseModel(
    [{"name": "relax", "sites": [i], "strength": 0.01, "matrix": b3} for i in (0, 2)]
)
params_noisy = AnalogSimParams(
    observables=observables,
    elapsed_time=t_swap,
    dt=t_swap / steps,
    max_bond_dim=9,
    svd_threshold=1e-10,
    krylov_dim=12,
    order=2,
    num_traj=8,
    random_seed=0,
)
res_noisy = Simulator().run(state, ham, params_noisy, noise)
p001_noisy = np.asarray(res_noisy.expectation_values)[1]
print(f"noisy:     P(001) at T_swap = {p001_noisy[-1]:.3f} (vs {p001[-1]:.3f})")
assert np.all(np.isfinite(p001_noisy))
