"""Dedicated MCWF and Lindblad backend tests (reference
tests/analog/test_mcwf.py + test_lindblad.py coverage areas): dense vs Krylov
MCWF agreement, effective-Hamiltonian correctness against scipy expm, and the
Lindblad propagator against the analytic single-qubit decay."""

from __future__ import annotations

import numpy as np
import scipy.linalg
import jax

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.analog.lindblad import (
    lindblad_expectations,
    noise_model_jump_ops,
    noise_model_jump_ops_sparse,
)
from yaqs_tpu.analog.mcwf import (
    make_mcwf_context,
    make_mcwf_krylov_context,
    mcwf_trajectory,
    mcwf_trajectory_krylov,
)
from yaqs_tpu.models.operators import pauli_z


def _setup(length=3, gamma=0.15):
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": gamma} for i in range(length)]
    )
    obs = [embed_one_site(pauli_z, i, length) for i in range(length)]
    return ham, nm, obs


def _psi0(dim):
    psi = np.zeros(dim, dtype=complex)
    psi[0] = 1.0
    return psi


def test_mcwf_dense_vs_krylov_same_trajectory():
    """The precomputed-propagator and per-step Arnoldi paths must produce the
    same trajectory for the same key (up to Krylov tolerance)."""
    length, dt, steps, gamma = 3, 0.1, 6, 0.15
    ham, nm, obs = _setup(length, gamma)
    h = ham.ensure_matrix()
    jumps = noise_model_jump_ops(nm, length, 2)  # carry sqrt(gamma)
    ctx_d = make_mcwf_context(h, jumps, [1.0] * len(jumps), obs, dt)
    h_sp = ham.ensure_sparse()
    jumps_sp = noise_model_jump_ops_sparse(nm, length, 2)
    ctx_k = make_mcwf_krylov_context(h_sp, jumps_sp, obs, dt, krylov_dim=30)
    key = jax.random.PRNGKey(5)
    psi0 = _psi0(h.shape[0])
    out_d = np.asarray(mcwf_trajectory(key, psi0, ctx_d, steps))
    out_k = np.asarray(mcwf_trajectory_krylov(key, psi0, ctx_k, steps))
    np.testing.assert_allclose(out_d, out_k, atol=1e-6)


def test_mcwf_noiseless_matches_expm():
    length, dt, steps = 3, 0.1, 5
    ham, _, obs = _setup(length)
    h = ham.ensure_matrix()
    ctx = make_mcwf_context(h, [], [], obs, dt)
    psi0 = _psi0(h.shape[0])
    out = np.asarray(mcwf_trajectory(jax.random.PRNGKey(0), psi0, ctx, steps))
    u = scipy.linalg.expm(-1j * dt * h)
    psi = psi0.copy()
    for t in range(steps + 1):
        for i, z in enumerate(obs):
            np.testing.assert_allclose(
                out[i, t], np.real(np.vdot(psi, z @ psi)), atol=1e-8
            )
        psi = u @ psi
    assert out.shape == (length, steps + 1)


def test_lindblad_single_qubit_analytic_decay():
    """<Z>(t) for amplitude damping from |1>: 1 - 2 exp(-gamma t)."""
    gamma, dt, steps = 0.3, 0.05, 20
    nm = NoiseModel([{"name": "lowering", "sites": [0], "strength": gamma}])
    jumps = noise_model_jump_ops(nm, 1, 2)
    psi1 = np.array([0.0, 1.0], dtype=complex)
    vals = lindblad_expectations(np.zeros((2, 2)), jumps, psi1, [pauli_z], dt, steps)
    times = dt * np.arange(steps + 1)
    np.testing.assert_allclose(vals[0], 1 - 2 * np.exp(-gamma * times), atol=1e-8)


def test_sparse_jump_ops_match_dense():
    length = 4
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(length)]
        + [{"name": "z", "sites": [1], "strength": 0.2}]
    )
    dense = noise_model_jump_ops(nm, length, 2)
    sparse = noise_model_jump_ops_sparse(nm, length, 2)
    assert len(dense) == len(sparse)
    for d_op, s_op in zip(dense, sparse):
        np.testing.assert_allclose(np.asarray(s_op.todense()), d_op, atol=1e-13)


def test_mpo_matvec_statevector_matches_dense():
    """The MPO-over-statevector contraction (large-system MCWF H matvec) must
    equal the dense Hamiltonian matrix product."""
    import jax.numpy as jnp

    from yaqs_tpu.analog.mcwf import mpo_matvec_statevector

    for build in (
        lambda: Hamiltonian.ising(5, 1.0, 0.7),
        lambda: Hamiltonian.heisenberg(5, 1.0, 1.0, 0.5, 0.2),
    ):
        ham = build()
        w = ham.ensure_mpo()
        h = ham.ensure_matrix()
        rng = np.random.default_rng(3)
        psi = rng.standard_normal(2**5) + 1j * rng.standard_normal(2**5)
        got = np.asarray(
            jax.jit(
                lambda: mpo_matvec_statevector(w, jnp.asarray(psi).reshape((2,) * 5), 5)
            )()
        ).reshape(-1)
        np.testing.assert_allclose(got, h @ psi, atol=1e-10)


def test_mcwf_local_vs_dense_same_trajectory():
    """The local-term H_eff Arnoldi path must reproduce the dense-propagator
    trajectory for the same key (both use the same RNG layout)."""
    import jax.numpy as jnp

    from yaqs_tpu.analog.mcwf import make_mcwf_local_context, mcwf_trajectory_local

    length, dt, steps, gamma = 3, 0.1, 6, 0.15
    ham, nm, obs = _setup(length, gamma)
    h = ham.ensure_matrix()
    jumps = noise_model_jump_ops(nm, length, 2)
    ctx_d = make_mcwf_context(h, jumps, [1.0] * len(jumps), obs, dt)
    channels = [
        [(i, np.sqrt(gamma) * np.array([[0, 1], [0, 0]], dtype=complex))]
        for i in range(length)
    ]
    obs_rows = [("terms", [[(i, pauli_z)]]) for i in range(length)]
    ctx_l = make_mcwf_local_context(ham.ensure_mpo(), channels, obs_rows, dt, krylov_dim=8)
    key = jax.random.PRNGKey(5)
    psi0 = _psi0(h.shape[0])
    out_d = np.asarray(mcwf_trajectory(key, psi0, ctx_d, steps))
    out_l = np.asarray(
        jax.jit(lambda k: mcwf_trajectory_local(k, jnp.asarray(psi0), ctx_l, steps))(key)
    )
    np.testing.assert_allclose(out_d, out_l, atol=1e-6)


def test_lindblad_rk4_matches_dense_propagator():
    """The fixed-grid RK4 sparse ODE path (large-system fallback, reference
    lindblad.py:343-375) must agree with the dense expm(L dt) propagator."""
    from yaqs_tpu.analog.lindblad import (
        build_liouvillian_sparse,
        lindblad_rk4_expectations,
    )
    import scipy.sparse as sp

    length, dt, steps, gamma = 4, 0.1, 8, 0.2
    ham, nm, obs = _setup(length, gamma)
    jumps = noise_model_jump_ops(nm, length, 2)
    psi0 = _psi0(2**length)
    dense = lindblad_expectations(
        ham.ensure_matrix(), jumps, psi0, obs, dt, steps
    )
    liou = build_liouvillian_sparse(
        ham.ensure_sparse(), noise_model_jump_ops_sparse(nm, length, 2)
    )
    rho0 = np.outer(psi0, psi0.conj())
    rk4 = lindblad_rk4_expectations(
        liou, rho0.reshape(-1), [sp.csr_matrix(o) for o in obs], dt, steps
    )
    np.testing.assert_allclose(rk4, dense, atol=1e-6)
    # O(h^4) convergence: doubling the substep count shrinks the error ~16x
    rk4_fine = lindblad_rk4_expectations(
        liou, rho0.reshape(-1), [sp.csr_matrix(o) for o in obs], dt, steps,
        substeps=8,
    )
    np.testing.assert_allclose(rk4_fine, dense, atol=5e-8)


def test_lindblad_simulator_large_system_cutover():
    """N=7 (vec(rho)=16384 > 4096) must route through the RK4 path; the
    noiseless run is checked against the pure-state expm oracle."""
    import warnings as _warnings

    length, dt, steps = 7, 0.1, 3
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    obs = [Observable("z", i) for i in range(length)]
    params = AnalogSimParams(
        observables=obs, elapsed_time=dt * steps, dt=dt, sample_timesteps=True
    )
    nm = NoiseModel([{"name": "z", "sites": [0], "strength": 0.0}])
    res = Simulator().run(
        State(length, state="x+", representation="density_matrix"), ham, params, nm
    )
    # pure-state oracle: gamma=0 so rho stays pure
    h = ham.ensure_matrix()
    u = scipy.linalg.expm(-1j * dt * h)
    psi = np.full(2**length, 1 / np.sqrt(2**length), dtype=complex)
    zs = [embed_one_site(pauli_z, i, length) for i in range(length)]
    for t in range(steps + 1):
        for i, z in enumerate(zs):
            np.testing.assert_allclose(
                res.expectation_values[i, t],
                np.real(np.vdot(psi, z @ psi)),
                atol=1e-6,
            )
        psi = u @ psi


def test_lindblad_recommended_size_warning(monkeypatch):
    import yaqs_tpu.analog.lindblad as lb

    monkeypatch.setattr(lb, "RECOMMENDED_MAX_QUBITS", 3)
    length = 4
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.1, dt=0.1,
        sample_timesteps=False,
    )
    import pytest

    with pytest.warns(RuntimeWarning, match="recommended maximum"):
        Simulator().run(
            State(length, representation="density_matrix"), ham, params,
            NoiseModel([{"name": "z", "sites": [0], "strength": 0.05}]),
        )


def test_vector_representation_uses_krylov_for_large_systems(monkeypatch):
    """Force the dense-propagator cutoff down so the simulator takes the
    Krylov route, and check it still agrees with the exact Lindblad result."""
    import yaqs_tpu.simulator as sim_mod

    length = 3
    ham, nm, _ = _setup(length, gamma=0.2)
    obs = [Observable("z", i) for i in range(length)]
    params = AnalogSimParams(
        observables=obs, elapsed_time=0.4, dt=0.1, num_traj=300,
        sample_timesteps=True, random_seed=9,
    )
    monkeypatch.setattr(sim_mod, "_MCWF_MAX_PRECOMPUTE_DIM", 2)
    res = Simulator().run(State(length, representation="vector"), ham, params, nm)

    exact_params = AnalogSimParams(
        observables=obs, elapsed_time=0.4, dt=0.1,
        sample_timesteps=True, random_seed=9,
    )
    exact = Simulator().run(
        State(length, representation="density_matrix"), ham, exact_params, nm
    )
    stderr = res.trajectories.std(axis=0) / np.sqrt(res.num_trajectories)
    diff = np.abs(res.expectation_values - exact.expectation_values)
    assert np.all(diff < 5 * stderr + 0.03), diff.max()
