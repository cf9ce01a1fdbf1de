"""Cross-backend and scale regressions (reference tests/test_simulator.py:301
trapped-ion vector-vs-mps agreement; digital golden-fidelity strategy of
tests/core/methods/tdvp/conftest.py:177; 2D circuit-builder physics).
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import scipy.linalg

from yaqs_tpu import (
    AnalogSimParams,
    DigitalSimParams,
    Hamiltonian,
    Observable,
    Simulator,
    State,
)


# ---------------------------------------------------------------------------
# Trapped ion: vector vs MPS representation agreement
# ---------------------------------------------------------------------------


def test_trapped_ion_vector_vs_mps_agreement():
    """Two coupled ions on a shared grid: the MPS route (qudit chain, TDVP)
    and the vector route (exact) must agree on <x_i>(t) — the reference's
    test_simulator.py:301 cross-representation check."""
    grid = np.linspace(-4.0, 4.0, 9)
    gd = len(grid)
    ham = Hamiltonian.trapped_ion(
        grid, [1.0, 1.0], omega=1.0, coulomb_strength=0.3, softening_length=0.5
    )
    # displaced Gaussian product state
    g1 = np.exp(-0.5 * (grid - 1.0) ** 2).astype(complex)
    g1 /= np.linalg.norm(g1)
    g2 = np.exp(-0.5 * (grid + 1.0) ** 2).astype(complex)
    g2 /= np.linalg.norm(g2)
    obs = [Observable("position", i, positions=grid) for i in (0, 1)]
    dt, steps = 0.1, 4
    params = AnalogSimParams(
        observables=obs, elapsed_time=dt * steps, dt=dt,
        max_bond_dim=gd, svd_threshold=1e-12, krylov_dim=25,
    )
    psi = np.kron(g2, g1)  # site 0 least significant
    res_vec = Simulator().run(
        State(2, vector=psi, physical_dimensions=[gd, gd]), ham, params, None
    )
    res_mps = Simulator().run(
        State(
            2,
            tensors=[g1.reshape(gd, 1, 1), g2.reshape(gd, 1, 1)],
            physical_dimensions=[gd, gd],
        ),
        ham,
        params,
        None,
    )
    np.testing.assert_allclose(
        res_mps.expectation_values, res_vec.expectation_values, atol=5e-4
    )


# ---------------------------------------------------------------------------
# Digital gate modes vs dense golden at 12 qubits
# ---------------------------------------------------------------------------


def _dense_circuit_state(circ, n):
    """Independent statevector oracle (site 0 least significant)."""
    psi = np.zeros(2**n, dtype=complex)
    psi[0] = 1.0

    def embed(m, qubits):
        k = len(qubits)
        t = np.asarray(m, dtype=complex).reshape([2] * (2 * k))
        eye = np.eye(2**n, dtype=complex).reshape([2] * n + [2**n])
        axes = [n - 1 - q for q in qubits]
        out = np.tensordot(t, eye, axes=(list(range(k, 2 * k)), axes))
        remaining = [ax for ax in range(n) if ax not in axes]
        current = axes + remaining + [n]
        perm = [current.index(i) for i in range(n + 1)]
        return out.transpose(perm).reshape(2**n, 2**n)

    for op in circ.ops:
        if op.name in {"barrier", "measure"}:
            continue
        psi = embed(op.resolved_matrix(), list(op.qubits)) @ psi
    return psi


@pytest.mark.parametrize("mode", ["swaps", "mpo", "tdvp", "full-tdvp"])
def test_gate_modes_agree_with_dense_golden_12q(mode):
    """12-qubit circuit with nearest-neighbor + long-range + 3-qubit gates:
    every gate mode must reproduce the dense statevector's observables
    (swaps/mpo exactly; tdvp modes to the documented gate-time tolerance)."""
    from yaqs_tpu.digital.circuit import Circuit

    n = 12
    qc = Circuit(n)
    for q in range(n):
        qc.append("ry", [q], params=(0.17 + 0.03 * q,))
    for q in range(0, n - 1, 2):
        qc.cx(q, q + 1)
    qc.append("rzz", [2, 7], params=(0.4,))  # long range
    qc.append("ccx", [0, 5, 9])  # 3-qubit long range
    for q in range(1, n - 1, 2):
        qc.cx(q, q + 1)

    psi = _dense_circuit_state(qc, n)
    z = np.diag([1.0, -1.0]).astype(complex)
    want = []
    for i in range(n):
        a = psi.reshape([2] * n)
        ax = n - 1 - i
        zpsi = np.moveaxis(np.tensordot(z, a, axes=([1], [ax])), 0, ax)
        want.append(np.real(np.vdot(a.reshape(-1), zpsi.reshape(-1))))

    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(n)],
        max_bond_dim=32,
        svd_threshold=1e-12,
        gate_mode=mode,
        tdvp_sweeps=4,
        random_seed=0,
    )
    res = Simulator().run(State(n), qc, params, None)
    got = np.asarray(res.expectation_values)[:, -1]
    tol = 1e-6 if mode in {"swaps", "mpo"} else 0.08
    np.testing.assert_allclose(got, want, atol=tol)


# ---------------------------------------------------------------------------
# 2D circuit builders: physics regression vs dense Trotter oracle
# ---------------------------------------------------------------------------


def test_2d_ising_circuit_bond_structure():
    """The 2x3 Ising circuit couples exactly the 2D grid bonds under snake
    indexing and produces a normalized state."""
    from yaqs_tpu.models.circuits import create_2d_ising_circuit, snake_index

    rows, cols = 2, 3
    n = rows * cols
    qc = create_2d_ising_circuit(rows, cols, 1.0, 0.7, 0.05, timesteps=1)
    psi_circ = _dense_circuit_state(qc, n)

    bonds = []
    for r in range(rows):
        for c in range(cols - 1):
            bonds.append((snake_index(r, c, cols), snake_index(r, c + 1, cols)))
    for r in range(rows - 1):
        for c in range(cols):
            bonds.append((snake_index(r, c, cols), snake_index(r + 1, c, cols)))

    got_pairs = sorted(
        tuple(sorted(op.qubits)) for op in qc.ops if len(op.qubits) == 2
    )
    assert got_pairs == sorted(tuple(sorted(b)) for b in bonds)
    np.testing.assert_allclose(np.vdot(psi_circ, psi_circ).real, 1.0, atol=1e-10)


def test_2d_heisenberg_circuit_bond_structure():
    from yaqs_tpu.models.circuits import create_2d_heisenberg_circuit, snake_index

    rows, cols = 3, 2
    qc = create_2d_heisenberg_circuit(rows, cols, 1.0, 1.0, 1.0, 0.0, 0.05, timesteps=1)
    want = set()
    for r in range(rows):
        for c in range(cols - 1):
            want.add(tuple(sorted((snake_index(r, c, cols), snake_index(r, c + 1, cols)))))
    for r in range(rows - 1):
        for c in range(cols):
            want.add(tuple(sorted((snake_index(r, c, cols), snake_index(r + 1, c, cols)))))
    got = {tuple(sorted(op.qubits)) for op in qc.ops if len(op.qubits) == 2}
    assert got == want


def test_2d_ising_circuit_small_angle_matches_exact_evolution():
    """At small dt the 2D Ising circuit approximates exp(-i H dt): compare
    observables against the dense expm of the encoded Hamiltonian."""
    from yaqs_tpu.models.circuits import create_2d_ising_circuit, snake_index

    rows, cols = 2, 2
    n = rows * cols
    J, g, dt = 1.0, 0.6, 0.02
    qc = create_2d_ising_circuit(rows, cols, J, g, dt, timesteps=1)
    psi_circ = _dense_circuit_state(qc, n)

    z = np.diag([1.0, -1.0]).astype(complex)
    x = np.array([[0, 1], [1, 0]], dtype=complex)

    def embed1(m, q):
        out = np.ones((1, 1), dtype=complex)
        for s in range(n):
            out = np.kron(m if s == q else np.eye(2), out)
        return out

    h = np.zeros((2**n, 2**n), dtype=complex)
    for r in range(rows):
        for c in range(cols - 1):
            a, b = snake_index(r, c, cols), snake_index(r, c + 1, cols)
            h += -J * embed1(z, a) @ embed1(z, b)
    for r in range(rows - 1):
        for c in range(cols):
            a, b = snake_index(r, c, cols), snake_index(r + 1, c, cols)
            h += -J * embed1(z, a) @ embed1(z, b)
    for q in range(n):
        h += -g * embed1(x, q)
    psi0 = np.zeros(2**n, dtype=complex)
    psi0[0] = 1.0
    psi_exact = scipy.linalg.expm(-1j * dt * h) @ psi0
    # Trotter error O(dt^2); observables agree to that order
    for q in range(n):
        zq = embed1(z, q)
        np.testing.assert_allclose(
            np.real(np.vdot(psi_circ, zq @ psi_circ)),
            np.real(np.vdot(psi_exact, zq @ psi_exact)),
            atol=5 * dt**2,
        )
