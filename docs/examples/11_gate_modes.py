"""Digital gate modes: how long-range and multi-qubit gates are applied.

Four routes (reference mqt-yaqs digital_tjm.py apply_two_qubit_gate):

- ``swaps``      adjacent SWAP chains + TEBD (exact, O(distance) extra gates)
- ``mpo``        the gate as an MPO over its support, zip-up applied (exact,
                 O(window) cost; the default)
- ``tdvp``       nearest neighbors via TEBD; long-range gates via one
                 windowed 2TDVP sweep of the gate's generator (approximate at
                 gate times; converges with ``tdvp_sweeps``)
- ``full-tdvp``  windowed TDVP for every generator-carrying gate

Three-or-more-qubit gates (ccx/ccz/cswap) have no TEBD path: they route via
the generator window (tdvp modes) or their MPO form.
"""

import numpy as np

from yaqs_tpu import DigitalSimParams, Observable, Simulator, State
from yaqs_tpu.digital.circuit import Circuit

L = 6
c = Circuit(L)
c.h(0)
c.cx(0, L - 1)  # long-range entangler
c.append("ccx", (0, L - 1, 2))  # Toffoli across the chain
c.append("rzz", (1, 4), params=(0.7,))

for mode in ("swaps", "mpo", "tdvp", "full-tdvp"):
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(L)],
        max_bond_dim=16,
        svd_threshold=1e-12,
        random_seed=7,
        gate_mode=mode,
        tdvp_sweeps=4 if "tdvp" in mode else 1,
    )
    res = Simulator().run(State(L), c, params, None)
    print(f"{mode:10s} <Z> = {np.round(res.expectation_values[:, -1], 3)}")

# The tdvp route's gate-time splitting error shrinks with tdvp_sweeps:
for sweeps in (1, 4, 16):
    params = DigitalSimParams(
        observables=[Observable("z", 2)],
        max_bond_dim=16,
        random_seed=7,
        gate_mode="tdvp",
        tdvp_sweeps=sweeps,
    )
    res = Simulator().run(State(L), c, params, None)
    print(f"tdvp_sweeps={sweeps:2d}  <Z_2> = {res.expectation_values[0, -1]:+.4f}")
