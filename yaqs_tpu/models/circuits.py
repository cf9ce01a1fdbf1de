"""Benchmark circuit builders (Trotterized models + random circuits).

Reference parity: mqt-yaqs core/libraries/circuit_library.py — 1D/2D Ising,
1D/2D Heisenberg, 1D/2D Fermi-Hubbard Trotter circuits and nearest-neighbor
random circuits, built on this package's own Circuit IR (site-ordering and
angle conventions match the reference builders).
"""

from __future__ import annotations

import numpy as np

from ..digital.circuit import Circuit

__all__ = [
    "create_ising_circuit",
    "create_2d_ising_circuit",
    "create_heisenberg_circuit",
    "create_2d_heisenberg_circuit",
    "create_1d_fermi_hubbard_circuit",
    "create_2d_fermi_hubbard_circuit",
    "add_long_range_interaction",
    "add_hopping_term",
    "nearest_neighbour_random_circuit",
    "create_qft_circuit",
    "create_transpiled_qft_circuit",
    "snake_index",
]


def _brickwork_pairs(length: int) -> list[tuple[int, int]]:
    pairs = [(2 * s, 2 * s + 1) for s in range(length // 2)]
    pairs += [(2 * s - 1, 2 * s) for s in range(1, length // 2)]
    if length % 2 != 0 and length != 1:
        pairs.append((length - 2, length - 1))
    return pairs


def create_ising_circuit(
    length: int, j: float, g: float, dt: float, timesteps: int, *, periodic: bool = False
) -> Circuit:
    """Trotterized TFIM evolution: Rx(-2 dt g) + Rzz(-2 dt J) brickwork."""
    alpha = -2 * dt * g
    beta = -2 * dt * j
    circ = Circuit(length)
    for _ in range(timesteps):
        for q in range(length):
            circ.rx(q, params=(alpha,))
        for a, b in _brickwork_pairs(length):
            circ.append("rzz", (a, b), params=(beta,))
        if periodic and length > 1:
            circ.append("rzz", (0, length - 1), params=(beta,))
    return circ


def snake_index(row: int, col: int, num_cols: int) -> int:
    """Snaking (boustrophedon) 2D -> 1D MPS ordering."""
    return row * num_cols + (col if row % 2 == 0 else num_cols - 1 - col)


def create_2d_ising_circuit(
    num_rows: int, num_cols: int, j: float, g: float, dt: float, timesteps: int
) -> Circuit:
    """2D TFIM Trotter circuit on a grid with snaking MPS ordering."""
    alpha = -2 * dt * g
    beta = -2 * dt * j
    circ = Circuit(num_rows * num_cols)
    for _ in range(timesteps):
        for r in range(num_rows):
            for c in range(num_cols):
                circ.rx(snake_index(r, c, num_cols), params=(alpha,))
        # horizontal bonds
        for r in range(num_rows):
            for c in range(num_cols - 1):
                a = snake_index(r, c, num_cols)
                b = snake_index(r, c + 1, num_cols)
                circ.append("rzz", (a, b), params=(beta,))
        # vertical bonds
        for r in range(num_rows - 1):
            for c in range(num_cols):
                a = snake_index(r, c, num_cols)
                b = snake_index(r + 1, c, num_cols)
                circ.append("rzz", (a, b), params=(beta,))
    return circ


def create_heisenberg_circuit(
    length: int,
    jx: float,
    jy: float,
    jz: float,
    h: float,
    dt: float,
    timesteps: int,
    *,
    periodic: bool = False,
) -> Circuit:
    """Trotterized XYZ evolution: Rz field + Rzz/Rxx/Ryy brickwork."""
    t_xx, t_yy, t_zz, t_z = (-2 * dt * v for v in (jx, jy, jz, h))
    circ = Circuit(length)
    for _ in range(timesteps):
        for q in range(length):
            circ.rz(q, params=(t_z,))
        for name, theta in (("rzz", t_zz), ("rxx", t_xx), ("ryy", t_yy)):
            for a, b in _brickwork_pairs(length):
                circ.append(name, (a, b), params=(theta,))
            if periodic and length > 1:
                circ.append(name, (0, length - 1), params=(theta,))
    return circ


def create_2d_heisenberg_circuit(
    num_rows: int,
    num_cols: int,
    jx: float,
    jy: float,
    jz: float,
    h: float,
    dt: float,
    timesteps: int,
) -> Circuit:
    t_xx, t_yy, t_zz, t_z = (-2 * dt * v for v in (jx, jy, jz, h))
    circ = Circuit(num_rows * num_cols)

    def all_bonds():
        for r in range(num_rows):
            for c in range(num_cols - 1):
                yield snake_index(r, c, num_cols), snake_index(r, c + 1, num_cols)
        for r in range(num_rows - 1):
            for c in range(num_cols):
                yield snake_index(r, c, num_cols), snake_index(r + 1, c, num_cols)

    for _ in range(timesteps):
        for q in range(num_rows * num_cols):
            circ.rz(q, params=(t_z,))
        for name, theta in (("rzz", t_zz), ("rxx", t_xx), ("ryy", t_yy)):
            for a, b in all_bonds():
                circ.append(name, (a, b), params=(theta,))
    return circ


def create_1d_fermi_hubbard_circuit(
    length: int, u: float, t: float, mu: float, num_trotter_steps: int, dt: float, timesteps: int
) -> Circuit:
    """1D Fermi-Hubbard Trotter circuit, qubits [up_0..up_{L-1}, down_0..down_{L-1}]
    (reference register layout, circuit_library.py:352-417); second-order
    Trotter splitting mu/U/hopping/U/mu per step."""
    n = num_trotter_steps
    circ = Circuit(2 * length)
    up = list(range(length))
    down = list(range(length, 2 * length))

    def chemical():
        theta = mu * dt / (2 * n)
        for j in range(length):
            circ.p(up[j], params=(theta,))
            circ.p(down[j], params=(theta,))

    def onsite():
        theta = -u * dt / (2 * n)
        for j in range(length):
            circ.cp(up[j], down[j], params=(theta,))

    def hopping():
        theta = -dt * t / n
        for parity in (0, 1):
            for j in range(length - 1):
                if j % 2 == parity:
                    for reg in (up, down):
                        circ.append("rxx", (reg[j + 1], reg[j]), params=(theta,))
                        circ.append("ryy", (reg[j + 1], reg[j]), params=(theta,))

    for _ in range(n * timesteps):
        chemical()
        onsite()
        hopping()
        onsite()
        chemical()
    return circ


def add_long_range_interaction(
    circ: Circuit, i: int, j: int, outer_op: str, alpha: float
) -> None:
    """Append ``exp(-i alpha/2 * P_i Z_{i+1}...Z_{j-1} P_j)`` with ``P`` = X or Y.

    The Jordan-Wigner string rotation: an Rz(alpha) on qubit ``j`` conjugated
    by a CX parity ladder (Z_j -> Z_i...Z_j) and single-qubit basis changes
    (Z -> X via Ry, Z -> Y via Rx), matching the reference decomposition
    (circuit_library.py:441-496) gate for gate in time order."""
    if i >= j:
        msg = "add_long_range_interaction requires i < j"
        raise IndexError(msg)
    if outer_op not in {"x", "X", "y", "Y"}:
        msg = "outer_op must be 'X' or 'Y'"
        raise ValueError(msg)
    theta = np.pi / 2
    basis = "ry" if outer_op in {"x", "X"} else "rx"
    circ.append(basis, (i,), params=(theta,))
    circ.append(basis, (j,), params=(theta,))
    for k in range(j - 1, i - 1, -1):
        circ.cx(k, j)
    circ.rz(j, params=(alpha,))
    for k in range(i, j):
        circ.cx(k, j)
    circ.append(basis, (i,), params=(-theta,))
    circ.append(basis, (j,), params=(-theta,))


def add_hopping_term(circ: Circuit, i: int, j: int, alpha: float) -> None:
    """Append the JW hopping evolution
    ``exp(-i alpha/2 (X Z..Z X + Y Z..Z Y))`` between qubits ``i < j``
    (the two strings commute, so sequential application is exact;
    reference circuit_library.py:499-517)."""
    add_long_range_interaction(circ, i, j, "X", alpha)
    add_long_range_interaction(circ, i, j, "Y", alpha)


def create_2d_fermi_hubbard_circuit(
    num_cols: int,
    num_rows: int,
    u: float,
    t: float,
    mu: float,
    num_trotter_steps: int,
    dt: float,
    timesteps: int,
) -> Circuit:
    """2D Fermi-Hubbard Trotter circuit on an ``num_cols x num_rows`` grid.

    Qubit layout interleaves spin: ``q = 2*site + spin`` (0 = up, 1 = down),
    sites in row-major grid order — the reference's qiskit ordering
    (circuit_library.py:414-438).  Second-order splitting
    mu/U/hopping/U/mu per Trotter substep; hopping terms are long-range in
    the interleaved layout and decompose through :func:`add_hopping_term`
    (reference create_2d_fermi_hubbard_circuit, circuit_library.py:520-634).
    """
    n = num_trotter_steps
    num_sites = num_cols * num_rows
    circ = Circuit(2 * num_sites)

    def q_up(site: int) -> int:
        return 2 * site

    def q_down(site: int) -> int:
        return 2 * site + 1

    def chemical() -> None:
        theta = -mu * dt / (2 * n)
        for s in range(num_sites):
            circ.p(q_up(s), params=(theta,))
            circ.p(q_down(s), params=(theta,))

    def onsite() -> None:
        theta = -u * dt / (2 * n)
        for s in range(num_sites):
            circ.cp(q_up(s), q_down(s), params=(theta,))

    def hop_pair(p1: int, p2: int, alpha: float) -> None:
        add_hopping_term(circ, q_up(p1), q_up(p2), alpha)
        add_hopping_term(circ, q_down(p1), q_down(p2), alpha)

    def kinetic() -> None:
        alpha = t * dt / n
        # horizontal odd / even columns, then vertical odd / even rows —
        # the reference's four disjoint brickwork groups
        for parity in (0, 1):
            for y in range(num_rows):
                for x in range(num_cols - 1):
                    if x % 2 == parity:
                        p1 = y * num_cols + x
                        hop_pair(p1, p1 + 1, alpha)
        for parity in (0, 1):
            for y in range(num_rows - 1):
                if y % 2 == parity:
                    for x in range(num_cols):
                        p1 = y * num_cols + x
                        hop_pair(p1, p1 + num_cols, alpha)

    for _ in range(timesteps):
        for _ in range(n):
            chemical()
            onsite()
            kinetic()
            onsite()
            chemical()
    return circ


def nearest_neighbour_random_circuit(n_qubits: int, layers: int, seed: int = 42) -> Circuit:
    """Random 1q rotations + alternating nearest-neighbor CZ/CX entanglers
    (sampling per arXiv:2002.07730, matching the reference builder)."""
    rng = np.random.default_rng(seed)
    circ = Circuit(n_qubits)
    for layer in range(layers):
        for q in range(n_qubits):
            # random axis rotation: Rz(a) Ry(b) Rz(c)
            a, b, c = rng.uniform(0, 2 * np.pi, size=3)
            circ.rz(q, params=(a,))
            circ.ry(q, params=(b,))
            circ.rz(q, params=(c,))
        start = 1 if layer % 2 == 0 else 0
        for q in range(start, n_qubits - 1, 2):
            if rng.random() < 0.5:
                circ.cz(q, q + 1)
            else:
                circ.cx(q, q + 1)
    return circ


def create_qft_circuit(length: int, include_swaps: bool = True) -> Circuit:
    """Quantum Fourier transform: H + controlled-phase cascade (+ bit-reversal
    SWAPs).  The canonical equivalence-checking workload (BASELINE config 4:
    QFT vs transpiled QFT)."""
    c = Circuit(length)
    for i in range(length):
        c.h(i)
        for j in range(i + 1, length):
            c.append("cp", (j, i), params=(np.pi / 2 ** (j - i),))
    if include_swaps:
        for i in range(length // 2):
            c.append("swap", (i, length - 1 - i))
    return c


def create_transpiled_qft_circuit(length: int, include_swaps: bool = True) -> Circuit:
    """QFT with every controlled-phase decomposed to {p, cx} and every SWAP to
    three CX — the 'transpiled to a basis gate set' counterpart used to
    exercise the equivalence checker on structurally different circuits."""
    c = Circuit(length)

    def cp_decomposed(ctrl: int, tgt: int, theta: float) -> None:
        # cp(theta) = P(theta/2)_c . CX . P(-theta/2)_t . CX . P(theta/2)_t
        c.append("p", (ctrl,), params=(theta / 2,))
        c.append("cx", (ctrl, tgt))
        c.append("p", (tgt,), params=(-theta / 2,))
        c.append("cx", (ctrl, tgt))
        c.append("p", (tgt,), params=(theta / 2,))

    def swap_decomposed(a: int, b: int) -> None:
        c.append("cx", (a, b))
        c.append("cx", (b, a))
        c.append("cx", (a, b))

    for i in range(length):
        c.h(i)
        for j in range(i + 1, length):
            cp_decomposed(j, i, np.pi / 2 ** (j - i))
    if include_swaps:
        for i in range(length // 2):
            swap_decomposed(i, length - 1 - i)
    return c
