"""Tour of the simulation parameters (reference docs/examples/simulation_parameters.md).

Presets, truncation policy, Krylov settings, order-1 vs order-2 TJM, timestep
sampling, and the TPU fast-path knobs (backend-resolved by default).
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import (
    SIMULATION_PRESETS,
    AnalogSimParams,
    DigitalSimParams,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)

print("presets:", {k: v["max_bond_dim"] for k, v in SIMULATION_PRESETS.items()})

L = 6
ham = Hamiltonian.ising(L, 1.0, 0.5)
obs = [Observable("z", i) for i in range(L)]
noise = NoiseModel([{"name": "z", "sites": [i], "strength": 0.05} for i in range(L)])

# presets bundle (svd_threshold, max_bond_dim, num_traj, krylov_dim);
# explicit keywords always override the preset values
fast = AnalogSimParams(observables=obs, elapsed_time=0.5, dt=0.1, preset="fast")
assert fast.max_bond_dim == 16 and fast.num_traj == 128
custom = AnalogSimParams(
    observables=obs, elapsed_time=0.5, dt=0.1, preset="fast", max_bond_dim=8,
    num_traj=4, random_seed=0,
)
assert custom.max_bond_dim == 8

# order=2 halves the Trotter error of the dissipative splitting; order=1 is
# cheaper per step.  sample_timesteps=False keeps only the final column.
p1 = AnalogSimParams(observables=obs, elapsed_time=0.4, dt=0.1, order=1,
                     num_traj=4, max_bond_dim=8, random_seed=1)
p2 = AnalogSimParams(observables=obs, elapsed_time=0.4, dt=0.1, order=2,
                     num_traj=4, max_bond_dim=8, random_seed=1,
                     sample_timesteps=False)
r1 = Simulator().run(State(L, state="x+"), ham, p1, noise)
r2 = Simulator().run(State(L, state="x+"), ham, p2, noise)
assert r1.expectation_values.shape == (L, 5)   # every grid point
assert r2.expectation_values.shape == (L, 1)   # final time only
print("order-1 grid columns:", r1.expectation_values.shape[1],
      "| order-2 final-only:", r2.expectation_values.shape[1])

# truncation policy: trunc_mode in {"discarded_weight", "cumulative", "rank"}
tight = AnalogSimParams(observables=obs, elapsed_time=0.2, dt=0.1,
                        trunc_mode="discarded_weight", svd_threshold=1e-12,
                        max_bond_dim=16, num_traj=2, random_seed=2)
print("trunc:", tight.trunc_mode, tight.svd_threshold)

# TPU fast-path knobs default to None = resolved per backend (validated-fast
# on TPU complex64, exact on CPU x64); explicit values always win
auto = AnalogSimParams(observables=obs, elapsed_time=0.2, dt=0.1)
print("fast path (this backend):", auto.fast_path_kwargs())
pinned = AnalogSimParams(observables=obs, elapsed_time=0.2, dt=0.1,
                         svd_method="subspace", canon_method="newton")
assert pinned.fast_path_kwargs()["svd_method"] == "subspace"

# digital parameters: shots vs num_traj, gate modes, mid-circuit sampling
dp = DigitalSimParams(observables=obs, shots=64, num_traj=4,
                      gate_mode="mpo", max_bond_dim=16, random_seed=3)
print("digital:", dp.gate_mode, "shots:", dp.shots)
