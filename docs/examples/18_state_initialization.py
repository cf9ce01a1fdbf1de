"""State construction across representations (reference
docs/examples/state_initialization.md).

Product-state presets, computational basis strings, explicit vectors /
density matrices / MPS tensors, qudit dimensions, and cross-encoding.
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import MPS, State

L = 4

# 1. named product-state presets
for name in ("zeros", "ones", "x+", "y-", "Neel", "wall"):
    s = State(L, state=name)
    v = s.to_vector()
    np.testing.assert_allclose(np.vdot(v, v).real, 1.0, atol=1e-12)
print("presets ok:", "zeros ones x+ y- Neel wall")

# 2. computational basis string (site 0 = first character)
s = State(L, basis_string="1010")
idx = int(np.argmax(np.abs(s.to_vector())))
assert idx == 0b0101  # site 0 least significant
print("basis '1010' -> statevector index", idx)

# 3. explicit statevector (vector representation -> MCWF backend)
bell_pair = np.zeros(2**2)
bell_pair[0b00] = bell_pair[0b11] = 1 / np.sqrt(2)
s_vec = State(2, vector=bell_pair)
assert s_vec.representation == "vector"

# 4. explicit density matrix (density_matrix representation -> Lindblad)
rho = np.outer(bell_pair, bell_pair.conj())
s_rho = State(2, density_matrix=rho)
assert s_rho.representation == "density_matrix"

# 5. explicit MPS tensors (list of (d, chi_l, chi_r) site tensors)
a0 = np.zeros((2, 1, 2)); a0[0, 0, 0] = a0[1, 0, 1] = 1 / np.sqrt(2)
a1 = np.zeros((2, 2, 1)); a1[0, 0, 0] = a1[1, 1, 0] = 1.0
s_mps = State(2, tensors=[a0, a1])
np.testing.assert_allclose(s_mps.to_vector(), bell_pair, atol=1e-12)
print("explicit Bell MPS == Bell vector")

# 6. qudits: per-site physical dimensions (padded to the max internally)
s_qutrit = State(3, basis_string="201", physical_dimensions=[3, 3, 3])
v = s_qutrit.to_vector()
assert v.shape == (27,) and abs(v[2 + 0 * 3 + 1 * 9]) == 1.0

# 7. the MPS class view: gauge, norms, entropies
m = MPS(L, state="x+", chi=4)
print("norm:", m.norm(), "entropy(bond 1):", m.get_entropy(1))
m2 = MPS(2, tensors=[a0, a1])
print("Bell entropy:", round(m2.get_entropy(0), 6), "= ln 2 =", round(np.log(2), 6))
np.testing.assert_allclose(m2.get_entropy(0), np.log(2), atol=1e-9)
