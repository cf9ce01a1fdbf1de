"""Circuit-library builders: structure checks + Trotter-vs-TDVP physics."""

from __future__ import annotations

import numpy as np

from yaqs_tpu import AnalogSimParams, DigitalSimParams, Hamiltonian, Observable, Simulator, State
from yaqs_tpu.models.circuits import (
    create_1d_fermi_hubbard_circuit,
    create_2d_ising_circuit,
    create_heisenberg_circuit,
    create_ising_circuit,
    nearest_neighbour_random_circuit,
)


def test_ising_circuit_structure():
    c = create_ising_circuit(5, 1.0, 0.5, 0.1, 3)
    assert c.num_qubits == 5
    names = {op.name for op in c.ops}
    assert names == {"rx", "rzz"}


def test_2d_ising_snake_bonds():
    c = create_2d_ising_circuit(2, 3, 1.0, 0.5, 0.1, 1)
    assert c.num_qubits == 6
    # snake ordering makes horizontal bonds adjacent in MPS order
    rzz = [op for op in c.ops if op.name == "rzz"]
    assert len(rzz) == 4 + 3  # horizontal + vertical bonds


def test_random_circuit_reproducible():
    c1 = nearest_neighbour_random_circuit(6, 4, seed=3)
    c2 = nearest_neighbour_random_circuit(6, 4, seed=3)
    assert [(o.name, o.qubits, o.params) for o in c1.ops] == [
        (o.name, o.qubits, o.params) for o in c2.ops
    ]


def test_fermi_hubbard_circuit_width():
    c = create_1d_fermi_hubbard_circuit(3, 1.0, 0.5, 0.2, 1, 0.1, 2)
    assert c.num_qubits == 6


def test_ising_trotter_circuit_matches_analog_tdvp():
    """Digital Trotter evolution of the TFIM must track the analog TDVP
    evolution of the same Hamiltonian (small dt, short time)."""
    L, J, g, dt, steps = 5, 1.0, 0.5, 0.05, 4
    circ = create_ising_circuit(L, J, g, dt, steps)
    obs = [Observable("z", i) for i in range(L)]

    dig = Simulator().run(
        State(L, state="x+"),
        circ,
        DigitalSimParams(observables=obs, max_bond_dim=16, svd_threshold=1e-12, random_seed=0),
        None,
    )
    ana = Simulator().run(
        State(L, state="x+"),
        Hamiltonian.ising(L, J, g),
        AnalogSimParams(
            observables=obs,
            elapsed_time=dt * steps,
            dt=dt,
            max_bond_dim=16,
            svd_threshold=1e-12,
            order=2,
            sample_timesteps=False,
            random_seed=0,
        ),
        None,
    )
    np.testing.assert_allclose(
        dig.expectation_values[:, -1], ana.expectation_values[:, -1], atol=5e-3
    )


def test_heisenberg_circuit_runs():
    c = create_heisenberg_circuit(4, 0.3, 0.3, 0.5, 0.1, 0.05, 2)
    res = Simulator().run(
        State(4, state="Neel"),
        c,
        DigitalSimParams(
            observables=[Observable("z", 0)], max_bond_dim=8, random_seed=0
        ),
        None,
    )
    assert np.isfinite(res.expectation_values).all()


def test_qft_circuit_matches_dense_dft():
    """QFT unitary (with bit-reversal swaps) equals the DFT matrix in the
    site-0-LSB convention."""
    import numpy as np

    from yaqs_tpu.models.circuits import create_qft_circuit
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "digital"))
    from test_engine import run_dense

    n = 4
    dim = 2**n
    c = create_qft_circuit(n)
    cols = []
    for b in range(dim):
        e = np.zeros(dim, dtype=complex)
        e[b] = 1.0
        cols.append(run_dense(c, e))
    u = np.stack(cols, axis=1)
    omega = np.exp(2j * np.pi / dim)
    dft = np.array([[omega ** (r * col) for col in range(dim)] for r in range(dim)])
    dft /= np.sqrt(dim)
    # the textbook circuit reads qubit 0 as the MOST significant bit; the
    # dense oracle reads site 0 as LSB -> DFT conjugated by bit reversal
    perm = np.zeros((dim, dim))
    for i in range(dim):
        perm[int(format(i, f"0{n}b")[::-1], 2), i] = 1.0
    np.testing.assert_allclose(u, perm @ dft @ perm, atol=1e-10)


def test_transpiled_qft_equivalent():
    import numpy as np

    from yaqs_tpu.equivalence import EquivalenceChecker
    from yaqs_tpu.models.circuits import create_qft_circuit, create_transpiled_qft_circuit

    n = 6
    res = EquivalenceChecker().check(
        create_qft_circuit(n), create_transpiled_qft_circuit(n)
    )
    assert res.equivalent
    assert res.fidelity > 1 - 1e-8

    # negative control: different phase ladder
    c_bad = create_qft_circuit(n)
    c_bad.append("p", (0,), params=(0.3,))
    res_bad = EquivalenceChecker().check(create_qft_circuit(n), c_bad)
    assert not res_bad.equivalent
