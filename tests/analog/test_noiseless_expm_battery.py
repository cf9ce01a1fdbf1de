"""Noiseless analog parity battery: every (Hamiltonian family x evolution
mode x order) cell must reproduce dense ``expm(-i H t)`` evolution.

Mirrors the reference's dominant analog validation pattern (cross-backend
and dense-oracle agreement throughout /root/reference/tests/analog/ and
tests/test_simulator.py): the oracle is scipy dense expm of the MPO summed
to a matrix — fully independent of the TDVP/BUG sweep code under test.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import scipy.linalg

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.models.operators import pauli_z


def dense_z_trajectory(h_mat, psi0, dt, steps, length, d=2):
    """Per-site <Z> columns including t=0 via dense propagation."""
    u = scipy.linalg.expm(-1j * dt * h_mat)
    cols = []
    psi = psi0.copy()
    zs = [embed_one_site(pauli_z[:d, :d] if d == 2 else None, i, length, d) for i in range(length)]
    cols.append([np.vdot(psi, z @ psi).real for z in zs])
    for _ in range(steps):
        psi = u @ psi
        cols.append([np.vdot(psi, z @ psi).real for z in zs])
    return np.array(cols).T  # (L, steps+1)


CASES = [
    ("ising", lambda L: Hamiltonian.ising(L, J=1.0, g=0.7), "zeros"),
    ("heisenberg", lambda L: Hamiltonian.heisenberg(L, Jx=1.0, Jy=0.8, Jz=0.5, h=0.3), "Neel"),
]


@pytest.mark.parametrize("name,factory,init", CASES)
@pytest.mark.parametrize("mode,tdvp_mode", [
    ("tdvp", "2site"),
    ("tdvp", "dynamic"),
    ("bug", "2site"),
])
@pytest.mark.parametrize("order", [1, 2])
def test_noiseless_matrix(name, factory, init, mode, tdvp_mode, order):
    length, dt, steps = 5, 0.05, 4
    ham = factory(length)
    h_mat = np.asarray(ham.ensure_matrix() if hasattr(ham, "ensure_matrix") else ham.matrix)

    state = State(length, state=init)
    psi0 = np.zeros(2**length, dtype=complex)
    if init == "zeros":
        psi0[0] = 1.0
    else:  # neel |0101...>
        idx = sum((i % 2) << i for i in range(length))
        psi0[idx] = 1.0

    golden = dense_z_trajectory(h_mat, psi0, dt, steps, length)

    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=dt * steps,
        dt=dt,
        num_traj=1,
        max_bond_dim=16,
        svd_threshold=1e-12,
        krylov_dim=10,
        order=order,
        evolution_mode=mode,
        tdvp_mode=tdvp_mode,
        sample_timesteps=True,
        random_seed=1,
    )
    res = Simulator().run(state, ham, params, None)
    np.testing.assert_allclose(res.expectation_values, golden, atol=1e-5,
                               err_msg=f"{name}/{mode}/{tdvp_mode}/order{order}")


@pytest.mark.parametrize("order", [1, 2])
def test_noiseless_1site_from_entangled_start(order):
    """1-site TDVP reproduces dense expm at 1e-5 when the current bond basis
    is rich enough: evolve Neel with 2-site TDVP first (grows Schmidt rank to
    saturation at L=5), then continue with tdvp_mode='1site' and compare the
    continuation against dense propagation of the fetched intermediate state
    (an oracle independent of leg-1 error)."""
    length, dt, steps = 5, 0.05, 4
    ham = Hamiltonian.heisenberg(length, Jx=1.0, Jy=0.8, Jz=0.5, h=0.3)
    h_mat = np.asarray(ham.ensure_matrix() if hasattr(ham, "ensure_matrix") else ham.matrix)

    leg1 = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.4,
        dt=0.05,
        num_traj=1,
        max_bond_dim=16,
        svd_threshold=1e-12,
        krylov_dim=10,
        tdvp_mode="2site",
        get_state=True,
        random_seed=1,
    )
    mid = Simulator().run(State(length, state="Neel"), ham, leg1, None).output_state
    psi_mid = np.asarray(mid.to_vector())
    golden = dense_z_trajectory(h_mat, psi_mid, dt, steps, length)

    leg2 = AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=dt * steps,
        dt=dt,
        num_traj=1,
        max_bond_dim=16,
        svd_threshold=1e-12,
        krylov_dim=10,
        order=order,
        tdvp_mode="1site",
        sample_timesteps=True,
        random_seed=1,
    )
    res = Simulator().run(mid, ham, leg2, None)
    np.testing.assert_allclose(res.expectation_values, golden, atol=1e-5)


def test_noiseless_1site_product_start_manifold_limitation():
    """Pin the documented 1-site TDVP limitation the reference shares: from a
    zero-padded rank-1 product start, the tangent space never leaves the
    product manifold (reference mps.py:409-449 zero-pads identically), so the
    Heisenberg/Neel evolution deviates from dense expm at O(0.1) while staying
    exactly normalized.  This is expected behavior, not a defect — use 2site/
    dynamic/bug modes (or an entangled start) when rank must grow."""
    length, dt, steps = 5, 0.05, 4
    ham = Hamiltonian.heisenberg(length, Jx=1.0, Jy=0.8, Jz=0.5, h=0.3)
    h_mat = np.asarray(ham.ensure_matrix() if hasattr(ham, "ensure_matrix") else ham.matrix)
    idx = sum((i % 2) << i for i in range(length))
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[idx] = 1.0
    golden = dense_z_trajectory(h_mat, psi0, dt, steps, length)

    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=dt * steps,
        dt=dt,
        num_traj=1,
        max_bond_dim=16,
        svd_threshold=1e-12,
        krylov_dim=10,
        tdvp_mode="1site",
        sample_timesteps=True,
        random_seed=1,
    )
    res = Simulator().run(State(length, state="Neel"), ham, params, None)
    dev = np.max(np.abs(np.asarray(res.expectation_values) - golden))
    assert 1e-3 < dev < 0.5, dev  # deviates (manifold projection), boundedly
    # t=0 column still exact
    np.testing.assert_allclose(np.asarray(res.expectation_values)[:, 0], golden[:, 0], atol=1e-12)


@pytest.mark.parametrize("representation", ["vector", "density_matrix"])
def test_noiseless_matrix_small_backends(representation):
    """MCWF and Lindblad backends reproduce the same dense golden."""
    length, dt, steps = 4, 0.05, 4
    ham = Hamiltonian.ising(length, J=1.0, g=0.7)
    h_mat = np.asarray(ham.ensure_matrix() if hasattr(ham, "ensure_matrix") else ham.matrix)
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    golden = dense_z_trajectory(h_mat, psi0, dt, steps, length)

    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=dt * steps,
        dt=dt,
        num_traj=1,
        sample_timesteps=True,
        random_seed=1,
    )
    res = Simulator().run(State(length, representation=representation), ham, params, None)
    np.testing.assert_allclose(res.expectation_values, golden, atol=1e-8)


def test_x_field_rotation_analytic():
    """Single-qubit pure-X-field Hamiltonian: <Z>(t) = cos(2 g t) exactly —
    an analytic closed-form oracle independent of any numerics."""
    g, dt, steps = 0.9, 0.02, 10
    ham = Hamiltonian.pauli(2, one_body=[(g, "x")], two_body=[])
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=dt * steps,
        dt=dt,
        num_traj=1,
        max_bond_dim=4,
        sample_timesteps=True,
        random_seed=0,
    )
    res = Simulator().run(State(2), ham, params, None)
    t = np.arange(steps + 1) * dt
    np.testing.assert_allclose(res.expectation_values[0], np.cos(2 * g * t), atol=1e-6)


@pytest.mark.parametrize("order", [1, 2])
def test_tjm_vs_mcwf_vs_lindblad_noiseless_cross_backend(order):
    """All three representations agree with each other on the same run
    (reference representation_comparison pattern)."""
    length, dt, steps = 3, 0.1, 3
    ham = Hamiltonian.heisenberg(length, Jx=0.6, Jy=0.4, Jz=0.9, h=0.2)
    obs = [Observable("z", i) for i in range(length)] + [Observable("x", 0)]
    outs = []
    for rep in ["mps", "vector", "density_matrix"]:
        params = AnalogSimParams(
            observables=obs,
            elapsed_time=dt * steps,
            dt=dt,
            num_traj=1,
            max_bond_dim=8,
            svd_threshold=1e-12,
            order=order,
            sample_timesteps=True,
            random_seed=4,
        )
        res = Simulator().run(State(length, state="x+", representation=rep), ham, params, None)
        outs.append(np.asarray(res.expectation_values))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
    np.testing.assert_allclose(outs[1], outs[2], atol=1e-8)
