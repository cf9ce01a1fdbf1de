"""Digital circuits: native IR or OpenQASM 2, observables and mid-circuit
sampling (reference circuit_observables example)."""

import numpy as np

from yaqs_tpu import DigitalSimParams, NoiseModel, Observable, Simulator, State
from yaqs_tpu.digital.circuit import Circuit, load_circuit

# Build with the native IR ...
L = 6
circ = Circuit(L)
for q in range(L):
    circ.h(q)
for q in range(0, L - 1, 2):
    circ.cx(q, q + 1)
circ.sample_observables()  # mid-circuit sampling point
for q in range(1, L - 1, 2):
    circ.append("rzz", (q, q + 1), params=(0.4,))

# ... or load OpenQASM 2 (user gate definitions are expanded)
qasm = """
OPENQASM 2.0;
include "qelib1.inc";
qreg q[3];
gate bell a, b { h a; cx a, b; }
bell q[0], q[1];
rz(pi/4) q[2];
"""
small = load_circuit(qasm)
print("parsed ops:", [op.name for op in small.ops])

noise = NoiseModel([{"name": "z", "sites": [i], "strength": 0.01} for i in range(L)])
params = DigitalSimParams(
    observables=[Observable("z", i) for i in range(L)],
    num_traj=64,
    max_bond_dim=16,
    sample_layers=True,  # record observables at every sampling point
    random_seed=7,
)
result = Simulator().run(State(L), circ, params, noise)
print("observable columns (init, mid, final):")
print(np.round(result.expectation_values, 3))
