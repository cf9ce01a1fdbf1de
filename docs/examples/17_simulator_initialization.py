"""Simulator construction and execution control (reference
docs/examples/simulator_initialization.md).

The Simulator owns execution-side configuration: parallel sharding over the
device mesh, dispatch batch size (peak-memory bound), progress printing, and
matmul precision (the TPU accuracy lever).
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State

L = 5
ham = Hamiltonian.ising(L, 1.0, 0.5)
obs = [Observable("z", i) for i in range(L)]
noise = NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(L)])
params = AnalogSimParams(
    observables=obs, elapsed_time=0.3, dt=0.1, num_traj=8,
    max_bond_dim=8, random_seed=0,
)
state = State(L, state="x+")

# default: trajectories sharded over every visible device
sim = Simulator()
res_parallel = sim.run(state, ham, params, noise)

# serial execution (single device), chunked into batches of 4 trajectories —
# determinism: trajectory RNG keys derive from the trajectory index alone, so
# the SAME stochastic trajectories are produced for any device count / batch
# size (jump decisions identical; floating-point scheduling may differ at the
# last-ulp level between batch shapes)
sim_serial = Simulator(parallel=False, batch_size=4, show_progress=False)
res_serial = sim_serial.run(state, ham, params, noise)
np.testing.assert_allclose(
    res_parallel.trajectories, res_serial.trajectories, atol=1e-10
)
print("parallel == serial (same trajectories):", True)

# matmul precision: on TPU the default single-pass bf16 matmuls corrupt the
# physics (~0.07 observable error over 5 sweeps); the Simulator therefore
# wraps runs in default_matmul_precision('highest') unless told otherwise
sim_fast = Simulator(matmul_precision="high")  # bf16x3: ~1e-3, ~equal speed
res_fast = sim_fast.run(state, ham, params, noise)
assert np.all(np.isfinite(res_fast.expectation_values))
print("precision sweep ok; elapsed:", f"{res_fast.elapsed_wall_time:.2f}s")

# execution config is inspectable
print("execution:", sim_serial.execution)
