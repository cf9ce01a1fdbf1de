"""Custom gates in digital simulation (reference docs/examples/custom_gates.md).

Three ways to get a gate into the engine:
1. a named gate from the built-in library,
2. an explicit unitary matrix attached to a Circuit op,
3. a raw matrix inside an OpenQASM-free Circuit with a long-range span
   (routed by SWAPs / window MPO depending on gate_mode).
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import DigitalSimParams, Observable, Simulator, State
from yaqs_tpu.digital.circuit import Circuit

n = 4

# 1. named library gates
qc = Circuit(n)
qc.h(0)
qc.cx(0, 1)

# 2. a custom one-qubit unitary: sqrt(X)
sx = 0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]])
qc.append("my_sqrt_x", [2], matrix=sx)
qc.append("my_sqrt_x", [2], matrix=sx)  # applied twice = X

# 3. a custom two-qubit unitary on a long-range pair: XX(theta)
theta = np.pi / 3
xx = np.cos(theta / 2) * np.eye(4) - 1j * np.sin(theta / 2) * np.kron(
    [[0, 1], [1, 0]], [[0, 1], [1, 0]]
)
qc.append("my_xx", [0, 3], matrix=xx)

obs = [Observable("z", i) for i in range(n)]
params = DigitalSimParams(observables=obs, max_bond_dim=8, random_seed=0)
res = Simulator().run(State(n), qc, params, None)
z_vals = np.asarray(res.expectation_values)[:, -1]
print("custom-gate circuit <Z>:", np.round(z_vals, 4))

# oracle: dense statevector of the same circuit
def embed(m, qubits):
    k = len(qubits)
    t = np.asarray(m, dtype=complex).reshape([2] * (2 * k))
    eye = np.eye(2**n, dtype=complex).reshape([2] * n + [2**n])
    axes = [n - 1 - q for q in qubits]
    out = np.tensordot(t, eye, axes=(list(range(k, 2 * k)), axes))
    remaining = [ax for ax in range(n) if ax not in axes]
    current = axes + remaining + [n]
    perm = [current.index(i) for i in range(n + 1)]
    return out.transpose(perm).reshape(2**n, 2**n)

h = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
cx = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
psi = np.zeros(2**n, dtype=complex)
psi[0] = 1.0
for m, qs in [(h, [0]), (cx, [0, 1]), (sx, [2]), (sx, [2]), (xx, [0, 3])]:
    psi = embed(m, qs) @ psi
z = np.array([[1, 0], [0, -1]])
want = [np.real(np.vdot(psi, embed(z, [i]) @ psi)) for i in range(n)]
np.testing.assert_allclose(z_vals, want, atol=1e-6)
print("matches the dense statevector oracle")
