"""BASELINE config 1: TFIM L=10, analog TJM + dephasing, chi=16, 100 trajectories.

Prints one JSON line with trajectories/sec and wall time.
Env: BENCH_CPU=1 to force the CPU backend.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("BENCH_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")  # env var alone is overridden

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State


def main() -> None:
    length = 10
    state = State(length, state="x+")
    ham = Hamiltonian.ising(length, J=1.0, g=0.5)
    noise = NoiseModel(
        [{"name": "z", "sites": [i], "strength": 0.1} for i in range(length)]
    )
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=1.0,
        dt=0.1,
        num_traj=100,
        max_bond_dim=16,
        sample_timesteps=True,
        random_seed=1,
    )
    t0 = time.perf_counter()
    result = Simulator().run(state, ham, params, noise)
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "config": "1: TFIM L=10 chi=16 dephasing, 100 traj",
                "traj_per_sec": round(100 / wall, 3),
                "wall_sec": round(wall, 2),
                "obs_shape": list(result.expectation_values.shape),
            }
        )
    )


if __name__ == "__main__":
    main()
