"""Extended Hamiltonian factories vs dense oracles."""

from __future__ import annotations

import numpy as np

from yaqs_tpu.core.mpo_builders import mpo_to_matrix
from yaqs_tpu.models.hamiltonians import (
    bose_hubbard_mpo,
    coupled_transmon_mpo,
    fermi_hubbard_1d_mpo,
)
from yaqs_tpu.models.operators import create, destroy, number_op


def kron_chain(ops, dims):
    """Dense embedding, site 0 least significant, per-site dims."""
    m = np.eye(1, dtype=complex)
    for i, d in enumerate(dims):
        o = ops.get(i, np.eye(d))
        m = np.kron(o, m)
    return m


def test_bose_hubbard_dense():
    L, d, omega, j, u = 3, 3, 1.1, 0.4, 0.7
    w = bose_hubbard_mpo(L, d, omega, j, u)
    dims = [d] * L
    n = number_op(d)
    h = np.zeros((d**L, d**L), dtype=complex)
    for i in range(L):
        h_loc = omega * n + 0.5 * u * (n @ (n - np.eye(d)))
        h += kron_chain({i: h_loc}, dims)
    a, ad = destroy(d), create(d)
    for i in range(L - 1):
        h += -j * kron_chain({i: ad, i + 1: a}, dims)
        h += -j * kron_chain({i: a, i + 1: ad}, dims)
    np.testing.assert_allclose(mpo_to_matrix(w), h, atol=1e-12)


def test_coupled_transmon_dense():
    L, qd, rd = 4, 3, 2
    w = coupled_transmon_mpo(L, qd, rd, 5.0, 6.0, -0.3, 0.1)
    d = max(qd, rd)
    # dense with PADDED dims everywhere (padded levels are decoupled)
    def padded(op, dim):
        out = np.zeros((d, d), dtype=complex)
        out[:dim, :dim] = op
        return out

    dims = [d] * L
    h = np.zeros((d**L, d**L), dtype=complex)
    for i in range(L):
        if i % 2 == 0:
            nq = number_op(qd)
            h_loc = 5.0 * nq + (-0.3 / 2) * (nq @ (nq - np.eye(qd)))
            h += kron_chain({i: padded(h_loc, qd)}, dims)
        else:
            h += kron_chain({i: padded(6.0 * number_op(rd), rd)}, dims)
    for i in range(L - 1):
        xq = padded(create(qd) + destroy(qd), qd)
        xr = padded(create(rd) + destroy(rd), rd)
        left, right = (xq, xr) if i % 2 == 0 else (xr, xq)
        h += 0.1 * kron_chain({i: left, i + 1: right}, dims)
    np.testing.assert_allclose(mpo_to_matrix(w), h, atol=1e-12)


def test_fermi_hubbard_jw_vs_fermionic_spectrum():
    # L=2 fermionic sites (d=4, dim 16) vs 4 JW spin orbitals (dim 16):
    # same many-body spectrum.
    t, u = 0.7, 1.3
    w_f = fermi_hubbard_1d_mpo(2, t, u)
    w_jw = fermi_hubbard_1d_mpo(4, t, u, jordan_wigner=True)
    ev_f = np.sort(np.linalg.eigvalsh(mpo_to_matrix(w_f)))
    ev_jw = np.sort(np.linalg.eigvalsh(mpo_to_matrix(w_jw)))
    np.testing.assert_allclose(ev_f, ev_jw, atol=1e-10)


def test_fermi_hubbard_bond_dims():
    w = fermi_hubbard_1d_mpo(4, 1.0, 2.0)
    assert w.shape[3] <= 6  # reference uses Dw=6 for this model


def test_trapped_ion_two_ions_dense():
    from yaqs_tpu.models.hamiltonians import trapped_ion_mpo

    grid = np.linspace(-1.0, 1.0, 5)
    w = trapped_ion_mpo(grid, [1.0, 2.0], omega=1.5, coulomb_strength=0.3,
                        softening_length=0.2, coulomb_cutoff=0.0)
    d = 5
    dx = grid[1] - grid[0]

    def local(m):
        kin = -(1.0 / (2 * m * dx**2)) * (
            np.diag(np.ones(d - 1), 1) + np.diag(np.ones(d - 1), -1) - 2 * np.eye(d)
        )
        return kin + 0.5 * m * 1.5**2 * np.diag(grid**2)

    dense = np.kron(np.eye(d), local(1.0)) + np.kron(local(2.0), np.eye(d))
    coulomb = np.zeros((d * d, d * d))
    for i in range(d):
        for j in range(d):
            idx = j * d + i  # site 0 least significant
            coulomb[idx, idx] = 0.3 / np.sqrt((grid[i] - grid[j]) ** 2 + 0.2**2)
    dense = dense + coulomb
    np.testing.assert_allclose(mpo_to_matrix(w), dense, atol=1e-10)


def test_trapped_ion_single_ion():
    from yaqs_tpu.models.hamiltonians import trapped_ion_mpo

    grid = np.linspace(-1.0, 1.0, 7)
    w = trapped_ion_mpo(grid, [1.0], omega=2.0)
    assert w.shape == (1, 7, 7, 1, 1)
    h = mpo_to_matrix(w)
    np.testing.assert_allclose(h, h.conj().T, atol=1e-12)
