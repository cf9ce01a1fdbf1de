"""BASELINE config 3: noisy OpenQASM 2 brickwork circuit via TEBD with
mid-circuit observable sampling + shots.

Env: BENCH_CPU=1 to force CPU; N_QUBITS, N_TRAJ, SHOTS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("BENCH_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")  # env var alone is overridden

from yaqs_tpu import DigitalSimParams, NoiseModel, Observable, Simulator, State


def brickwork_qasm(n: int, layers: int) -> str:
    lines = [
        "OPENQASM 2.0;",
        'include "qelib1.inc";',
        f"qreg q[{n}];",
        f"creg c[{n}];",
    ]
    for layer in range(layers):
        for q in range(n):
            lines.append(f"rx({0.3 + 0.01 * q}) q[{q}];")
        start = layer % 2
        for q in range(start, n - 1, 2):
            lines.append(f"cx q[{q}],q[{q + 1}];")
    lines.append("measure q -> c;")
    return "\n".join(lines)


def main() -> None:
    n = int(os.environ.get("N_QUBITS", 20))
    layers = 8
    num_traj = int(os.environ.get("N_TRAJ", 512))  # measured optimum, see docs/tpu_numerics.md
    shots = int(os.environ.get("SHOTS", 256))
    qasm = brickwork_qasm(n, layers)
    from yaqs_tpu.digital.circuit import GateOp, load_circuit

    circ = load_circuit(qasm)
    # mid-circuit observable sampling point halfway through (QASM 2 has no
    # barrier labels; the circuit IR carries them)
    mid = len(circ.ops) // 2
    circ.ops.insert(mid, GateOp("barrier", (), label="SAMPLE_OBSERVABLES"))
    noise = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.02} for i in range(n)]
    )
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(n)],
        num_traj=num_traj,
        shots=shots,
        max_bond_dim=32,
        sample_layers=True,
        random_seed=3,
        gate_mode="swaps",
    )
    sim = Simulator()
    # warmup pass populates the in-process jit caches (first compiles through
    # the remote helper can dominate wall time); the timed pass measures
    # steady-state throughput, which is what the dispatch loop sustains
    sim.run(State(n), circ, params, noise)
    t0 = time.perf_counter()
    res = sim.run(State(n), circ, params, noise)
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "config": f"3: noisy QASM2 brickwork n={n} layers={layers} TEBD",
                "traj_per_sec": round(num_traj / wall, 3),
                "wall_sec": round(wall, 2),
                "shots": sum(res.counts.values()) if res.counts else 0,
                "obs_cols": int(res.expectation_values.shape[1]),
            }
        )
    )


if __name__ == "__main__":
    main()
