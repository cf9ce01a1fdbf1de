"""Hamiltonian model factories and benchmark circuits (reference
hamiltonians / transmon_emulation examples)."""

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State
from yaqs_tpu.models.circuits import create_2d_ising_circuit, create_ising_circuit

# generic Pauli-sum construction with near-optimal MPO bond dimensions
xy = Hamiltonian.pauli(6, two_body=[(0.5, "X", "Y")], one_body=[(-1.0, "Z")])
print("XY-chain MPO bond dim:", xy.ensure_mpo().shape[-1])

# Fermi-Hubbard: composite fermionic sites (d=4) or Jordan-Wigner chain
fh = Hamiltonian.fermi_hubbard_1d(4, t=1.0, u=2.0)
fh_jw = Hamiltonian.fermi_hubbard_1d(8, t=1.0, u=2.0, jordan_wigner=True)
print("FH d=4 MPO:", fh.ensure_mpo().shape, " JW MPO:", fh_jw.ensure_mpo().shape)

# transmon-resonator chain with heterogeneous local dimensions (zero padded)
tr = Hamiltonian.coupled_transmon(
    4, qubit_dim=3, resonator_dim=2, qubit_freq=5.0,
    resonator_freq=6.0, anharmonicity=-0.3, coupling=0.1,
)
params = AnalogSimParams(
    observables=[Observable("z", 0)], elapsed_time=0.2, dt=0.1, max_bond_dim=8,
)
res = Simulator().run(
    State(4, physical_dimensions=3), tr, params, None
)
print("transmon <Z_0>(t):", res.expectation_values[0])

# Trotterized benchmark circuits (1D / 2D snaking order)
c1 = create_ising_circuit(8, j=1.0, g=0.5, dt=0.05, timesteps=4)
c2 = create_2d_ising_circuit(3, 3, j=1.0, g=0.5, dt=0.05, timesteps=2)
print("1D circuit ops:", len(c1.ops), " 2D circuit ops:", len(c2.ops))
