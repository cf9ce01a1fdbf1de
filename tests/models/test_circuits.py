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


def test_long_range_interaction_matches_pauli_string_expm():
    """add_long_range_interaction / add_hopping_term implement
    exp(-i alpha/2 P_i Z...Z P_j) exactly (JW parity-ladder decomposition,
    reference circuit_library.py:441-517)."""
    import pathlib
    import sys

    import scipy.linalg

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "digital"))
    from test_engine import run_dense

    from yaqs_tpu.analog.embedding import embed_operator
    from yaqs_tpu.digital.circuit import Circuit
    from yaqs_tpu.models.circuits import add_hopping_term, add_long_range_interaction
    from yaqs_tpu.models.operators import pauli_x, pauli_y, pauli_z

    def string_op(p, i, j, n):
        ops = {i: p, j: p}
        for k in range(i + 1, j):
            ops[k] = pauli_z
        return embed_operator(ops, n)

    rng = np.random.default_rng(0)
    n, i, j, alpha = 4, 0, 3, 0.37
    psi0 = rng.standard_normal(2**n) + 1j * rng.standard_normal(2**n)
    psi0 /= np.linalg.norm(psi0)
    for p, name in ((pauli_x, "X"), (pauli_y, "Y")):
        c = Circuit(n)
        add_long_range_interaction(c, i, j, name, alpha)
        got = run_dense(c, psi0)
        want = scipy.linalg.expm(-0.5j * alpha * string_op(p, i, j, n)) @ psi0
        np.testing.assert_allclose(got, want, atol=1e-12)
    c = Circuit(n)
    add_hopping_term(c, i, j, alpha)
    h = string_op(pauli_x, i, j, n) + string_op(pauli_y, i, j, n)
    want = scipy.linalg.expm(-0.5j * alpha * h) @ psi0
    np.testing.assert_allclose(run_dense(c, psi0), want, atol=1e-12)

    import pytest

    with pytest.raises(IndexError):
        add_long_range_interaction(Circuit(3), 2, 1, "X", 0.1)
    with pytest.raises(ValueError, match="outer_op"):
        add_long_range_interaction(Circuit(3), 0, 1, "Z", 0.1)


def test_2d_fermi_hubbard_trotter_converges_to_dense():
    """One substep of create_2d_fermi_hubbard_circuit approximates
    exp(-i dt H) for H = mu*sum(n) + u*sum(n_up n_down) +
    (t/2)*sum(XZ..ZX + YZ..ZY) in the interleaved q=2*site+spin layout,
    with second-order Trotter error (reference circuit_library.py:520-634)."""
    import pathlib
    import sys

    import scipy.linalg

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "digital"))
    from test_engine import run_dense

    from yaqs_tpu.analog.embedding import embed_operator
    from yaqs_tpu.models.circuits import create_2d_fermi_hubbard_circuit
    from yaqs_tpu.models.operators import pauli_x, pauli_y, pauli_z

    cols, rows = 2, 2
    nsites = cols * rows
    nq = 2 * nsites
    mu, u, t = 0.7, 1.3, 0.9
    nocc = np.diag([0.0, 1.0])

    def string_op(p, i, j):
        ops = {i: p, j: p}
        for k in range(i + 1, j):
            ops[k] = pauli_z
        return embed_operator(ops, nq)

    h = np.zeros((2**nq, 2**nq), dtype=complex)
    for s in range(nsites):
        h += mu * (embed_operator({2 * s: nocc}, nq) + embed_operator({2 * s + 1: nocc}, nq))
        h += u * embed_operator({2 * s: nocc, 2 * s + 1: nocc}, nq)
    bonds = []
    for y in range(rows):
        for x in range(cols - 1):
            bonds.append((y * cols + x, y * cols + x + 1))
    for y in range(rows - 1):
        for x in range(cols):
            bonds.append((y * cols + x, (y + 1) * cols + x))
    for p1, p2 in bonds:
        for spin in (0, 1):
            a, b = 2 * p1 + spin, 2 * p2 + spin
            h += (t / 2) * (string_op(pauli_x, a, b) + string_op(pauli_y, a, b))

    rng = np.random.default_rng(3)
    psi0 = rng.standard_normal(2**nq) + 1j * rng.standard_normal(2**nq)
    psi0 /= np.linalg.norm(psi0)

    errs = []
    for dt in (0.1, 0.05):
        circ = create_2d_fermi_hubbard_circuit(cols, rows, u, t, mu, 1, dt, 1)
        got = run_dense(circ, psi0)
        want = scipy.linalg.expm(-1j * dt * h) @ psi0
        errs.append(np.linalg.norm(got - want))
    # second-order splitting: halving dt cuts the one-step error ~8x
    assert errs[0] < 5e-3, errs
    assert errs[1] < errs[0] / 6, errs


# -- periodic / parity-structure variants (reference test_circuit_library.py) ------


def test_ising_circuit_even_odd_structure():
    for length in (4, 5):
        c = create_ising_circuit(length, 1.0, 0.5, 0.1, 1)
        rzz = [op for op in c.ops if op.name == "rzz"]
        # open brickwork covers every nearest-neighbor bond exactly once
        bonds = sorted(tuple(sorted(op.qubits)) for op in rzz)
        assert bonds == [(i, i + 1) for i in range(length - 1)]
        rx = [op for op in c.ops if op.name == "rx"]
        assert len(rx) == length


def test_ising_circuit_periodic_adds_wrap_bond():
    for length in (4, 5):
        c = create_ising_circuit(length, 1.0, 0.5, 0.1, 1, periodic=True)
        bonds = sorted(tuple(sorted(op.qubits)) for op in c.ops if op.name == "rzz")
        assert (0, length - 1) in bonds
        assert len(bonds) == length


def test_heisenberg_circuit_periodic_structure():
    for length in (4, 5):
        c = create_heisenberg_circuit(length, 0.3, 0.3, 0.5, 0.1, 0.05, 1, periodic=True)
        for name in ("rxx", "ryy", "rzz"):
            bonds = sorted(tuple(sorted(op.qubits)) for op in c.ops if op.name == name)
            assert (0, length - 1) in bonds
            assert len(bonds) == length


def test_periodic_ising_circuit_matches_dense_expm():
    """One small-dt Trotter step of the periodic TFIM circuit tracks the dense
    expm of the periodic Hamiltonian (first-order accuracy)."""
    import scipy.linalg

    from yaqs_tpu.core.mpo import MPO

    L, J, g, dt = 4, 1.0, 0.6, 0.02
    circ = create_ising_circuit(L, J, g, dt, 1, periodic=True)
    res = Simulator().run(
        State(L, state="x+"),
        circ,
        DigitalSimParams(
            observables=[Observable("z", i) for i in range(L)],
            max_bond_dim=16,
            svd_threshold=1e-14,
            random_seed=0,
            get_state=True,
        ),
        None,
    )
    # dense oracle: H = -J sum ZZ (periodic) - g sum X
    h = MPO.pauli(
        L, two_body=[(-J, "Z", "Z")], one_body=[(-g, "X")], bc="periodic"
    ).to_matrix()
    psi0 = State(L, state="x+").to_vector()
    psi_exact = scipy.linalg.expm(-1j * h * dt) @ psi0
    psi_circ = res.output_state.to_vector()
    overlap = abs(np.vdot(psi_exact, psi_circ))
    assert overlap > 1 - 5e-4, overlap
