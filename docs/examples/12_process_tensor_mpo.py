"""Scalable process tensors: the tensor-train (MPO) construction.

The dense multi-time Choi tensor needs 16^k simulations for k interventions;
the MPO route needs 16 * chi per leg (reference mqt-yaqs
build_process_tensor_direct), so deep processes are cheap.  Unlike the
reference's pure-state branch scheme, branches here are density matrices, so
noisy (Lindblad) legs work too.
"""

import numpy as np

from yaqs_tpu import Hamiltonian, NoiseModel
from yaqs_tpu.characterization.memory.interventions import sample_intervention
from yaqs_tpu.memory_characterizer import MemoryCharacterizer

ham = Hamiltonian.ising(4, J=1.0, g=0.8)
mc = MemoryCharacterizer(preset="quick")

# k = 6 interventions: dense tomography would need 16^6 = 16.7M simulations
pt = mc.build_process_tensor(ham, num_interventions=6, tau=0.25, method="mpo",
                             max_bond_dim=32)
print("legs:", pt.k, " bond dims:", pt.bond_dims)

# probe it with random measure-prepare sequences
rng = np.random.default_rng(0)
seq = [sample_intervention(rng) for _ in range(pt.k)]
rho = pt.evaluate_probe(seq)
print("probe output rho (unnormalized):\n", np.round(rho, 4))
print("sequence weight:", float(np.trace(rho).real))

# noisy legs: supported because branches are density matrices
noise = NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.1}
                    for i in range(4)])
pt_noisy = mc.build_process_tensor(ham, num_interventions=3, tau=0.25,
                                   method="mpo", noise_model=noise)
print("noisy QMI at cut 2:", round(pt_noisy.qmi(2), 6))

# long environments: the MPS sequence backend replaces the dense simulator
ham_long = Hamiltonian.ising(14, J=1.0, g=1.0)
res = mc.characterize(ham_long, num_interventions=2, tau=0.2,
                      backend="mps", backend_options={"chi": 8, "dt": 0.1},
                      seed=0)
print("14-site operational memory entropy:", round(res.entropy, 4))
