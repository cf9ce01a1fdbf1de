"""Shot-based readout from a digital circuit (reference circuit_shots)."""

from yaqs_tpu import DigitalSimParams, Simulator, State
from yaqs_tpu.digital.circuit import Circuit

L = 5
circ = Circuit(L)
circ.h(0)
for q in range(L - 1):
    circ.cx(q, q + 1)  # GHZ state

params = DigitalSimParams(shots=1000, max_bond_dim=8, random_seed=3)
result = Simulator().run(State(L), circ, params, None)

# counts keyed by basis-state integer, site 0 least significant
print("counts:", result.counts)
assert set(result.counts) <= {0, 2**L - 1}
