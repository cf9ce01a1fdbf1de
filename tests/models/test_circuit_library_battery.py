"""Circuit-library dense-oracle battery.

Mirrors the reference circuit-library suite
(/root/reference/tests/core/libraries/test_circuit_library.py): even/odd 1D
and 2x3/3x2 2D Ising + Heisenberg Trotter circuits, periodic wraps, and the
1D Fermi-Hubbard register layout — every builder pinned against a dense
``expm`` of the Hamiltonian its gate stream encodes (little-endian JW/Pauli
embeddings), with second-order Trotter convergence checks.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.linalg

from yaqs_tpu.models.circuits import (
    create_1d_fermi_hubbard_circuit,
    create_2d_heisenberg_circuit,
    create_2d_ising_circuit,
    create_heisenberg_circuit,
    create_ising_circuit,
    nearest_neighbour_random_circuit,
    snake_index,
)
from yaqs_tpu.models.gates import gate_matrix

X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)
NUM = np.diag([0.0, 1.0]).astype(complex)


def run_dense(circ, psi):
    n = circ.num_qubits
    for op in circ.ops:
        if op.name in {"barrier", "measure"}:
            continue
        g = op.matrix if op.matrix is not None else gate_matrix(op.name, op.params)
        k = len(op.qubits)
        t = psi.reshape([2] * n)
        axes = [n - 1 - q for q in op.qubits]
        t = np.moveaxis(t, axes, range(k))
        t = (g @ t.reshape(2**k, -1)).reshape([2] * n)
        psi = np.moveaxis(t, range(k), axes).reshape(-1)
    return psi


def embed(ops: dict, n: int) -> np.ndarray:
    """Little-endian product embedding of {site: 2x2}."""
    out = np.ones((1, 1), dtype=complex)
    for q in range(n):
        out = np.kron(ops.get(q, np.eye(2)), out)
    return out


def _rand_state(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    return psi / np.linalg.norm(psi)


def ising_h(bonds, n, j, g):
    h = np.zeros((2**n, 2**n), dtype=complex)
    for a, b in bonds:
        h -= j * embed({a: Z, b: Z}, n)
    for q in range(n):
        h -= g * embed({q: X}, n)
    return h


def xyz_h(bonds, n, jx, jy, jz, hz):
    h = np.zeros((2**n, 2**n), dtype=complex)
    for a, b in bonds:
        h -= jx * embed({a: X, b: X}, n)
        h -= jy * embed({a: Y, b: Y}, n)
        h -= jz * embed({a: Z, b: Z}, n)
    for q in range(n):
        h -= hz * embed({q: Z}, n)
    return h


def _infidelity(circ, h, t, seed=0):
    psi0 = _rand_state(circ.num_qubits, seed)
    got = run_dense(circ, psi0.copy())
    want = scipy.linalg.expm(-1j * t * h) @ psi0
    return 1 - abs(np.vdot(got, want))


# ---------------------------------------------------------------------------
# 1D Ising / Heisenberg, even + odd lengths, open + periodic
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("length", [4, 5])
def test_ising_circuit_trotter_converges(length):
    j, g, t = 1.0, 0.7, 0.3
    bonds = [(q, q + 1) for q in range(length - 1)]
    h = ising_h(bonds, length, j, g)
    errs = [
        _infidelity(create_ising_circuit(length, j, g, t / steps, steps), h, t)
        for steps in (2, 4)
    ]
    assert errs[0] < 5e-3
    assert errs[1] < errs[0] / 2.5, errs  # >= first-order Trotter decay


@pytest.mark.parametrize("length", [4, 5])
def test_ising_circuit_periodic_wrap(length):
    j, g, t = 0.9, 0.4, 0.2
    bonds = [(q, q + 1) for q in range(length - 1)] + [(0, length - 1)]
    h = ising_h(bonds, length, j, g)
    circ = create_ising_circuit(length, j, g, t / 4, 4, periodic=True)
    assert _infidelity(circ, h, t) < 2e-3
    # wrap bond present exactly once per timestep
    wraps = [op for op in circ.ops if op.name == "rzz" and set(op.qubits) == {0, length - 1}]
    assert len(wraps) == 4


@pytest.mark.parametrize("length", [4, 5])
def test_heisenberg_circuit_trotter_converges(length):
    jx, jy, jz, hz, t = 0.8, 0.5, 1.0, 0.3, 0.25
    bonds = [(q, q + 1) for q in range(length - 1)]
    h = xyz_h(bonds, length, jx, jy, jz, hz)
    errs = [
        _infidelity(
            create_heisenberg_circuit(length, jx, jy, jz, hz, t / steps, steps), h, t
        )
        for steps in (2, 4)
    ]
    assert errs[0] < 5e-3
    assert errs[1] < errs[0] / 2.5, errs


def test_heisenberg_circuit_periodic():
    length, jx, jy, jz, hz, t = 5, 0.6, 0.6, 0.9, 0.2, 0.2
    bonds = [(q, q + 1) for q in range(length - 1)] + [(0, length - 1)]
    h = xyz_h(bonds, length, jx, jy, jz, hz)
    circ = create_heisenberg_circuit(length, jx, jy, jz, hz, t / 4, 4, periodic=True)
    assert _infidelity(circ, h, t) < 2e-3


# ---------------------------------------------------------------------------
# 2D grids, both orientations, snake ordering
# ---------------------------------------------------------------------------


def _grid_bonds(rows, cols):
    bonds = []
    for r in range(rows):
        for c in range(cols - 1):
            bonds.append((snake_index(r, c, cols), snake_index(r, c + 1, cols)))
    for r in range(rows - 1):
        for c in range(cols):
            bonds.append((snake_index(r, c, cols), snake_index(r + 1, c, cols)))
    return bonds


@pytest.mark.parametrize(("rows", "cols"), [(2, 3), (3, 2)])
def test_2d_ising_circuit_matches_grid_hamiltonian(rows, cols):
    j, g, t = 1.0, 0.5, 0.2
    n = rows * cols
    h = ising_h(_grid_bonds(rows, cols), n, j, g)
    circ = create_2d_ising_circuit(rows, cols, j, g, t / 4, 4)
    assert _infidelity(circ, h, t) < 2e-3
    # bond count: horizontal + vertical, per timestep
    rzz = [op for op in circ.ops if op.name == "rzz"]
    assert len(rzz) == 4 * (rows * (cols - 1) + (rows - 1) * cols)


@pytest.mark.parametrize(("rows", "cols"), [(2, 3), (3, 2)])
def test_2d_heisenberg_circuit_matches_grid_hamiltonian(rows, cols):
    jx, jy, jz, hz, t = 0.7, 0.4, 0.9, 0.25, 0.15
    n = rows * cols
    h = xyz_h(_grid_bonds(rows, cols), n, jx, jy, jz, hz)
    circ = create_2d_heisenberg_circuit(rows, cols, jx, jy, jz, hz, t / 4, 4)
    assert _infidelity(circ, h, t) < 2e-3


def test_snake_index_boustrophedon():
    # row 0 left-to-right, row 1 right-to-left, ...
    assert [snake_index(0, c, 3) for c in range(3)] == [0, 1, 2]
    assert [snake_index(1, c, 3) for c in range(3)] == [5, 4, 3]
    assert [snake_index(2, c, 3) for c in range(3)] == [6, 7, 8]


# ---------------------------------------------------------------------------
# 1D Fermi-Hubbard register layout (JW, [up_0.., down_0..])
# ---------------------------------------------------------------------------


def _fh_h(length, u, t_hop, mu):
    n = 2 * length
    h = np.zeros((2**n, 2**n), dtype=complex)
    for j in range(length):
        h += u * embed({j: NUM, length + j: NUM}, n)
        h -= mu * (embed({j: NUM}, n) + embed({length + j: NUM}, n))
    for reg0 in (0, length):
        for j in range(length - 1):
            a, b = reg0 + j, reg0 + j + 1
            h -= t_hop / 2 * (embed({a: X, b: X}, n) + embed({a: Y, b: Y}, n))
    return h


def test_1d_fermi_hubbard_trotter_second_order():
    length, u, t_hop, mu, t = 2, 1.3, 0.7, 0.4, 0.2
    h = _fh_h(length, u, t_hop, mu)
    errs = []
    for nsteps in (1, 2, 4):
        circ = create_1d_fermi_hubbard_circuit(length, u, t_hop, mu, nsteps, t, 1)
        errs.append(_infidelity(circ, h, t))
    # measured 1.1e-7 / 6.9e-9 / 4e-10: second-order splitting, ~16x/doubling
    assert errs[0] < 1e-6
    assert errs[1] < errs[0] / 8
    assert errs[2] < errs[1] / 8


def test_1d_fermi_hubbard_multi_timestep_accumulates():
    length, u, t_hop, mu, dt = 2, 1.0, 0.5, 0.3, 0.1
    h = _fh_h(length, u, t_hop, mu)
    circ = create_1d_fermi_hubbard_circuit(length, u, t_hop, mu, 2, dt, 3)
    assert _infidelity(circ, h, 3 * dt) < 1e-6


def test_1d_fermi_hubbard_register_layout():
    # qubits [up_0..up_{L-1}, down_0..down_{L-1}]: onsite cp couples j, L+j
    length = 3
    circ = create_1d_fermi_hubbard_circuit(length, 1.0, 0.5, 0.2, 1, 0.1, 1)
    cps = {tuple(sorted(op.qubits)) for op in circ.ops if op.name == "cp"}
    assert cps == {(j, length + j) for j in range(length)}
    # hopping stays inside each spin register
    for op in circ.ops:
        if op.name in {"rxx", "ryy"}:
            a, b = op.qubits
            assert (a < length) == (b < length)


# ---------------------------------------------------------------------------
# Random NN circuit structure (reference lines 412-447)
# ---------------------------------------------------------------------------


def test_nearest_neighbour_random_circuit_structure():
    n, layers = 6, 5
    c = nearest_neighbour_random_circuit(n, layers, seed=11)
    assert c.num_qubits == n
    two_q = [op for op in c.ops if len(op.qubits) == 2]
    for op in two_q:
        assert abs(op.qubits[0] - op.qubits[1]) == 1
    # different seeds differ
    c2 = nearest_neighbour_random_circuit(n, layers, seed=12)
    ops1 = [(o.name, o.qubits, o.params) for o in c.ops]
    ops2 = [(o.name, o.qubits, o.params) for o in c2.ops]
    assert ops1 != ops2
