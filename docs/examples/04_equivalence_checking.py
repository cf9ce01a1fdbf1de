"""Equivalence checking: dense backend for small circuits, vectorized-MPO
TEBD backend for large ones (reference equivalence_checking example)."""

import numpy as np

from yaqs_tpu import EquivalenceChecker
from yaqs_tpu.digital.circuit import Circuit


def qft(n, decompose_cp=False):
    c = Circuit(n)
    for i in range(n):
        c.h(i)
        for j in range(i + 1, n):
            theta = np.pi / (2 ** (j - i))
            if decompose_cp:
                c.rz(i, params=(theta / 2,))
                c.cx(i, j)
                c.rz(j, params=(-theta / 2,))
                c.cx(i, j)
                c.rz(j, params=(theta / 2,))
            else:
                c.cp(i, j, params=(theta,))
    return c


checker = EquivalenceChecker()

# small: auto-selects the dense matrix backend (<= 7 qubits)
res = checker.check(qft(5), qft(5, decompose_cp=True))
print(f"[matrix] equivalent={res.equivalent} fidelity={res.fidelity:.10f}")

# large: MPO backend with operator-entanglement diagnostics
res = checker.check(qft(10), qft(10, decompose_cp=True), max_bond_dim=32)
print(f"[{res.method}] equivalent={res.equivalent} fidelity={res.fidelity:.8f}")
print("operator entanglement at cuts:", np.round(res.entanglement_entropies, 4))
