"""Trapped-ion grid simulation (reference docs/examples/trapped_ion.md).

A single ion in a harmonic trap, discretized on a uniform position grid: one
MPS site whose local basis is the grid points.  A displaced Gaussian evolves
for half a trap period and arrives at the opposite turning point; the
``position`` observable tracks <x>(t).
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State

omega = 1.0
initial_displacement = 1.0
half_period = np.pi / omega

positions = np.linspace(-8.0, 8.0, 33)
grid_dim = len(positions)

gaussian = np.exp(-0.5 * (positions - initial_displacement) ** 2).astype(np.complex128)
gaussian /= np.linalg.norm(gaussian)

ham = Hamiltonian.trapped_ion(positions, masses=[1.0], omega=omega)

# vector representation: 1 site x 33 grid levels is tiny, exact MCWF route
state = State(length=1, vector=gaussian, physical_dimensions=[grid_dim])
params = AnalogSimParams(
    observables=[Observable("position", 0, positions=positions)],
    elapsed_time=half_period,
    dt=half_period / 16,
    svd_threshold=1e-12,
    krylov_dim=25,
    sample_timesteps=True,
)
res = Simulator().run(state, ham, params, None)
x_t = np.asarray(res.expectation_values)[0]
print(f"<x>(0) = {x_t[0]:.3f}, <x>(T/2) = {x_t[-1]:.3f}")
# the packet swings from +x0 to -x0 over half a period
assert abs(x_t[0] - initial_displacement) < 0.05
assert abs(x_t[-1] + initial_displacement) < 0.1

# the same physics through the MPS representation (two ions would entangle
# their grids; here it demonstrates the qudit MPS path)
state_mps = State(
    length=1,
    tensors=[gaussian.reshape(grid_dim, 1, 1)],
    physical_dimensions=[grid_dim],
)
params_mps = AnalogSimParams(
    observables=[Observable("position", 0, positions=positions)],
    elapsed_time=half_period,
    dt=half_period / 16,
    max_bond_dim=2,
    svd_threshold=1e-12,
    krylov_dim=25,
    sample_timesteps=False,
)
res_mps = Simulator().run(state_mps, ham, params_mps, None)
print(f"MPS route <x>(T/2) = {res_mps.expectation_values[0, -1]:.3f}")
assert abs(res_mps.expectation_values[0, -1] - x_t[-1]) < 0.05
