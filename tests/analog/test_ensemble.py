"""Unitary ensemble + multi-time correlators vs dense oracles."""

from __future__ import annotations

import numpy as np
import scipy.linalg

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.models.operators import pauli_x, pauli_z


def test_ensemble_member_mean():
    L, dt, steps = 4, 0.05, 4
    ham = Hamiltonian.ising(L, 1.0, 0.6)
    h = ham.ensure_matrix()
    states = [State(L, state="zeros"), State(L, state="x+")]
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=16,
        svd_threshold=1e-12,
        krylov_dim=20,
        random_seed=0,
    )
    res = Simulator().run(states, ham, params, None)
    assert res.num_trajectories == 2

    # dense member mean
    vals = np.zeros((L, steps + 1))
    for st in states:
        psi = st.to_vector()
        for j in range(steps + 1):
            psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi
            for i in range(L):
                vals[i, j] += np.vdot(psi_t, embed_one_site(pauli_z, i, L) @ psi_t).real
    vals /= len(states)
    np.testing.assert_allclose(res.expectation_values, vals, atol=1e-6)


def test_multi_time_correlator_vs_dense():
    """<psi(t)| A U(t) B |psi(0)> for A=Z_1, B=X_0."""
    L, dt, steps = 3, 0.05, 4
    ham = Hamiltonian.ising(L, 1.0, 0.4)
    h = ham.ensure_matrix()
    st = State(L, state="x+")
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=8,
        svd_threshold=1e-13,
        krylov_dim=20,
        multi_time_observables=[(Observable("z", 1), Observable("x", 0))],
        random_seed=0,
    )
    res = Simulator().run([st], ham, params, None)
    assert res.multi_time_correlators is not None
    corr = res.multi_time_correlators[0]

    psi0 = st.to_vector()
    a = embed_one_site(pauli_z, 1, L)
    b = embed_one_site(pauli_x, 0, L)
    for j in range(steps + 1):
        u = scipy.linalg.expm(-1j * h * dt * j)
        expected = np.vdot(u @ psi0, a @ u @ (b @ psi0))
        np.testing.assert_allclose(corr[j], expected, atol=1e-6)


def test_multi_time_two_site_correlator_vs_dense():
    """Two-site A (non-adjacent, operator-Schmidt product terms) and two-site
    B (adjacent, exact apply_local) against the dense unitary oracle
    (reference ensemble.py:85-137 with two-site apply_local conventions)."""
    L, dt, steps = 4, 0.05, 3
    ham = Hamiltonian.ising(L, 1.0, 0.4)
    h = ham.ensure_matrix()
    st = State(L, state="x+")

    # entangling A = X_0 Z_2 + shifted identity (non-product => Schmidt rank>1)
    a_mat = np.kron(pauli_x, pauli_z) + 0.5 * np.kron(pauli_z, pauli_x)
    b_mat = np.kron(pauli_x, pauli_x) + 0.25 * np.eye(4)
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=8,
        svd_threshold=1e-13,
        krylov_dim=20,
        multi_time_observables=[
            (Observable(a_mat, [0, 2]), Observable(b_mat, [1, 2])),
            (Observable("z", 1), Observable(b_mat, [2, 3])),
        ],
        random_seed=0,
    )
    res = Simulator().run([st], ham, params, None)
    assert res.multi_time_correlators is not None

    psi0 = st.to_vector()
    a_dense = (
        embed_one_site(pauli_x, 0, L) @ embed_one_site(pauli_z, 2, L)
        + 0.5 * embed_one_site(pauli_z, 0, L) @ embed_one_site(pauli_x, 2, L)
    )
    b1_dense = embed_one_site(pauli_x, 1, L) @ embed_one_site(pauli_x, 2, L) + 0.25 * np.eye(2**L)
    a2_dense = embed_one_site(pauli_z, 1, L)
    b2_dense = embed_one_site(pauli_x, 2, L) @ embed_one_site(pauli_x, 3, L) + 0.25 * np.eye(2**L)
    for p, (ad, bd) in enumerate([(a_dense, b1_dense), (a2_dense, b2_dense)]):
        corr = res.multi_time_correlators[p]
        for j in range(steps + 1):
            u = scipy.linalg.expm(-1j * h * dt * j)
            expected = np.vdot(u @ psi0, ad @ u @ (bd @ psi0))
            np.testing.assert_allclose(corr[j], expected, atol=1e-6)


def test_ensemble_bug_evolution_mode_matches_dense():
    """evolution_mode='bug' must thread through the ensemble path (reference
    test_unitary_ensemble_uses_bug_evolution_mode_via_simulator)."""
    L, dt, steps = 4, 0.05, 4
    ham = Hamiltonian.ising(L, 1.0, 0.6)
    h = ham.ensure_matrix()
    st = State(L, state="x+")
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=16,
        svd_threshold=1e-12,
        krylov_dim=20,
        evolution_mode="bug",
        multi_time_observables=[(Observable("z", 1), Observable("x", 0))],
        random_seed=0,
    )
    res = Simulator().run([st], ham, params, None)

    psi0 = st.to_vector()
    import scipy.linalg as sla

    a = embed_one_site(pauli_z, 1, L)
    b = embed_one_site(pauli_x, 0, L)
    for j in range(steps + 1):
        u = sla.expm(-1j * h * dt * j)
        psi_t = u @ psi0
        for i in range(L):
            np.testing.assert_allclose(
                res.expectation_values[i, j],
                np.vdot(psi_t, embed_one_site(pauli_z, i, L) @ psi_t).real,
                atol=1e-5,
            )
        np.testing.assert_allclose(
            res.multi_time_correlators[0][j],
            np.vdot(psi_t, a @ u @ (b @ psi0)),
            atol=1e-5,
        )
