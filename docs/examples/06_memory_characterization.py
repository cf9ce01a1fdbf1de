"""Non-Markovian memory: process tensors, QMI, and the operational split-cut
response (reference characterization / memory examples)."""

import numpy as np

from yaqs_tpu import Hamiltonian, MemoryCharacterizer

# system qubit = site 0, environment = the rest of the chain
ham = Hamiltonian.ising(3, J=1.0, g=0.5)
mc = MemoryCharacterizer(preset="quick")

# 1) multi-time Choi process tensor + information measures
pt = mc.build_process_tensor(ham, num_interventions=2, tau=0.8)
print("QMI across the cut:", mc.compute_qmi(pt))

# 2) operational memory: split-cut probing -> response entropy / modes
res = mc.characterize(ham, num_interventions=3, tau=0.5, seed=1)
print(res.summary())

# a decoupled system shows no memory
free = Hamiltonian.pauli(3, two_body=[], one_body=[(-0.8, "X")])
res_free = mc.characterize(free, num_interventions=3, tau=0.5, seed=1)
print("decoupled entropy:", res_free.entropy)

# 3) Transformer surrogate trained on simulated sequences
data = mc.sample(ham, num_interventions=2, tau=0.5, num_sequences=128, seed=0)
surrogate = mc.train(data, epochs=40, seed=0)
res_sur = mc.characterize(surrogate, seed=2)
print("surrogate-based entropy:", np.round(res_sur.entropy, 4))
