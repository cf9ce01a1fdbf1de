"""TJM trajectory physics: noiseless parity with dense evolution, and noisy
ensemble agreement with the exact Lindblad solution (the reference's dominant
cross-backend validation pattern, tests/analog/test_analog_tjm.py)."""

from __future__ import annotations

import pytest

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp

from yaqs_tpu.analog.lindblad import lindblad_expectations, noise_model_jump_ops
from yaqs_tpu.analog.tjm import (
    TrajectoryPlan,
    sample_key,
    tjm_trajectory,
    trajectory_key,
)
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.mpo_builders import ising_mpo, mpo_to_matrix
from yaqs_tpu.core.noise_model import NoiseModel, compile_noise
from yaqs_tpu.methods.dissipation import apply_dissipation
from yaqs_tpu.methods.stochastic import channel_weights, stochastic_process
from yaqs_tpu.methods.tdvp import TDVPConfig
from yaqs_tpu.models.operators import lowering, pauli_z


def make_obs_z(length):
    from yaqs_tpu.core.observables import compile_observables
    from yaqs_tpu.core.sim_params import Observable

    return compile_observables([Observable("z", i) for i in range(length)], length, 2)


def test_dissipation_norm_decay_pauli():
    # Pauli dephasing: dissipator is the scalar exp(-gamma dt / 2) per site.
    L, chi, gamma, dt = 4, 4, 0.3, 0.1
    nm = NoiseModel([{"name": "dephasing", "sites": [i], "strength": gamma} for i in range(L)])
    cn = compile_noise(nm, L, 2)
    t = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    t2 = apply_dissipation(t, cn, dt)
    expected_norm2 = np.exp(-gamma * dt) ** L  # each site scales by e^{-gamma dt/2}
    np.testing.assert_allclose(float(mps_ops.norm_squared(t2)), expected_norm2, rtol=1e-10)


def test_dissipation_matches_dense_nonpauli():
    L, chi, gamma, dt = 3, 4, 0.4, 0.07
    nm = NoiseModel([{"name": "lowering", "sites": [i], "strength": gamma} for i in range(L)])
    cn = compile_noise(nm, L, 2)
    t = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(t))
    t2 = apply_dissipation(t, cn, dt)
    psi = np.asarray(mps_ops.to_statevector(t2))
    gen = np.zeros((8, 8), dtype=complex)
    for i in range(L):
        ldl = lowering.conj().T @ lowering
        gen += gamma * embed_one_site(ldl, i, L)
    expected = scipy.linalg.expm(-0.5 * dt * gen) @ psi0
    np.testing.assert_allclose(psi, expected, atol=1e-10)


def test_channel_weights_match_expectations(seed):
    L, chi, gamma = 3, 4, 0.5
    nm = NoiseModel([{"name": "lowering", "sites": [i], "strength": gamma} for i in range(L)])
    cn = compile_noise(nm, L, 2)
    rng = np.random.default_rng(seed)
    raw = np.zeros((L, 2, chi, chi), dtype=np.complex128)
    raw[:, :, 0, 0] = rng.normal(size=(L, 2)) + 1j * rng.normal(size=(L, 2))
    t, _ = mps_ops.normalize_canonical(jnp.asarray(raw))
    psi = np.asarray(mps_ops.to_statevector(t))
    dt = 0.1
    w = np.asarray(channel_weights(t, cn, dt))
    for i in range(L):
        ldl = embed_one_site(lowering.conj().T @ lowering, i, L)
        expected = dt * gamma * np.vdot(psi, ldl @ psi).real
        np.testing.assert_allclose(w[i], expected, atol=1e-10)


def test_stochastic_process_no_noise_normalizes(seed):
    L, chi = 3, 4
    t = jnp.asarray(mps_ops.named_product_state("x+", L, chi)) * 0.9
    out, jumped = stochastic_process(t, None, 0.1, jax.random.PRNGKey(seed))
    assert not bool(jumped)
    np.testing.assert_allclose(float(mps_ops.norm_squared(out)), 1.0, rtol=1e-10)


def test_noiseless_tjm_order2_matches_dense():
    L, chi, dt, steps = 4, 8, 0.05, 6
    w = ising_mpo(L, 1.0, 0.8)
    h = mpo_to_matrix(w)
    t0 = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(t0))
    observables = make_obs_z(L)
    plan = TrajectoryPlan(
        dt=dt,
        num_steps=steps,
        order=2,
        evolution=TDVPConfig(krylov_dim=20, threshold=1e-14, max_bond_dim=chi),
    )
    key = jax.random.PRNGKey(0)
    res, _diag, final = tjm_trajectory(
        trajectory_key(key, 0),
        sample_key(key, 0),
        t0,
        jnp.asarray(w),
        None,
        observables,
        plan,
    )
    res = np.asarray(res)
    for j in range(steps + 1):
        psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi0
        for i in range(L):
            expected = np.vdot(psi_t, embed_one_site(pauli_z, i, L) @ psi_t).real
            np.testing.assert_allclose(res[i, j], expected, atol=1e-6)


def test_tjm_ensemble_matches_lindblad():
    """Ensemble mean over trajectories must agree with the exact master
    equation within statistical error (lowering + dephasing noise)."""
    L, chi, dt, steps = 3, 8, 0.1, 5
    gamma_relax, gamma_deph = 0.15, 0.1
    w = ising_mpo(L, 1.0, 0.5)
    h = mpo_to_matrix(w)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": gamma_relax} for i in range(L)]
        + [{"name": "z", "sites": [i], "strength": gamma_deph} for i in range(L)]
    )
    cn = compile_noise(nm, L, 2)
    t0 = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(t0))
    observables = make_obs_z(L)
    plan = TrajectoryPlan(
        dt=dt,
        num_steps=steps,
        order=2,
        evolution=TDVPConfig(krylov_dim=15, threshold=1e-12, max_bond_dim=chi),
    )
    n_traj = 300
    base = jax.random.PRNGKey(42)
    wj = jnp.asarray(w)

    run = jax.vmap(
        lambda tk, sk: tjm_trajectory(tk, sk, t0, wj, cn, observables, plan)[0]
    )
    idx = jnp.arange(n_traj)
    tks = jax.vmap(lambda i: trajectory_key(base, i))(idx)
    sks = jax.vmap(lambda i: sample_key(base, i))(idx)
    results = np.asarray(run(tks, sks))  # (n_traj, n_obs, T)
    mean = results.mean(axis=0)
    stderr = results.std(axis=0) / np.sqrt(n_traj)

    jumps = noise_model_jump_ops(nm, L)
    z_obs = [embed_one_site(pauli_z, i, L) for i in range(L)]
    exact = lindblad_expectations(h, jumps, psi0, z_obs, dt, steps)

    # 5-sigma + small deterministic floor for Trotter/TJM order-2 error
    tol = 5 * stderr + 0.02
    assert np.all(np.abs(mean - exact) < tol), (
        np.abs(mean - exact).max(),
        stderr.max(),
    )


def test_mcwf_krylov_path_matches_dense_path():
    """The sparse per-step Krylov MCWF must agree with the dense-propagator
    path (noiseless: exact; noisy: same system via Lindblad tolerance)."""
    from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State
    from yaqs_tpu.analog.mcwf import make_mcwf_krylov_context, mcwf_trajectory_krylov
    from yaqs_tpu.analog.lindblad import noise_model_jump_ops_sparse

    L = 3
    ham = Hamiltonian.ising(L, 1.0, 0.6)
    obs = [Observable("z", i) for i in range(L)]
    params = AnalogSimParams(
        observables=obs, elapsed_time=0.4, dt=0.1, max_bond_dim=8,
        krylov_dim=20, random_seed=0,
    )
    res_dense = Simulator().run(State(L, state="x+", representation="vector"), ham, params, None)

    st = State(L, state="x+", representation="vector")
    psi0 = st.to_vector()
    from yaqs_tpu.simulator import Simulator as Sim
    obs_sparse = Sim._sparse_observables(params, L, 2)
    ctx = make_mcwf_krylov_context(ham.ensure_sparse(), [], obs_sparse, 0.1, krylov_dim=20)
    vals = np.asarray(mcwf_trajectory_krylov(jax.random.PRNGKey(0), jnp.asarray(psi0), ctx, 4))
    np.testing.assert_allclose(vals, res_dense.expectation_values, atol=1e-8)


def test_two_site_nonpauli_noise_vs_lindblad():
    """Adjacent two-site lowering noise (4x4 jump operator): TJM ensemble vs
    exact Lindblad (reference two-site raising/lowering processes)."""
    from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State
    from yaqs_tpu.analog.embedding import embed_operator

    L, dt, steps, gamma = 3, 0.1, 4, 0.3
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    h = ham.ensure_matrix()
    # two-site lowering |00><11| on the pair: kron(lower, lower), first site
    # most significant in the merged (d*d) basis
    two_low = np.kron(lowering, lowering)
    nm = NoiseModel([
        {"name": "two_lower", "sites": [0, 1], "strength": gamma, "matrix": two_low},
        {"name": "z", "sites": [2], "strength": 0.1},
    ])
    obs = [Observable("z", i) for i in range(L)]
    params = AnalogSimParams(
        observables=obs, elapsed_time=dt * steps, dt=dt, num_traj=300,
        max_bond_dim=8, svd_threshold=1e-12, krylov_dim=15, order=2,
        random_seed=3,
    )
    res = Simulator().run(State(L, state="ones"), ham, params, nm)

    # dense Lindblad oracle: embed the merged-pair operator; merged index
    # (s_b, s_{b+1}) with the LEFT site most significant
    dense_jump = np.zeros((8, 8), dtype=complex)
    t = two_low.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(4, 4)
    u, sv, vh = np.linalg.svd(t)
    for k in range(len(sv)):
        if sv[k] < 1e-14:
            break
        a = (u[:, k] * sv[k]).reshape(2, 2)
        b = vh[k].reshape(2, 2)
        dense_jump += embed_operator({0: a, 1: b}, L)
    jumps = [np.sqrt(gamma) * dense_jump, np.sqrt(0.1) * embed_one_site(pauli_z, 2, L)]
    psi0 = State(L, state="ones").to_vector()
    z_obs = [embed_one_site(pauli_z, i, L) for i in range(L)]
    exact = lindblad_expectations(h, jumps, psi0, z_obs, dt, steps)
    stderr = res.trajectories.std(axis=0) / np.sqrt(res.num_trajectories)
    diff = np.abs(res.expectation_values - exact)
    assert np.all(diff < 5 * stderr + 0.03), (diff.max(), stderr.max())


@pytest.mark.slow
def test_chunked_dispatch_matches_monolithic():
    # the make_order2_chunked start/chunk composition must reproduce the
    # monolithic tjm_trajectory scan exactly (chunking exists to keep TPU
    # dispatches under the worker limit; it must not change physics). The
    # factory bakes all complex operands in as trace-time constants per the
    # platform rules; keys are batched (always-vmap rule).
    from yaqs_tpu.analog.tjm import make_order2_chunked

    L, chi, steps = 5, 8, 6
    w = ising_mpo(L, 1.0, 0.5)
    t0 = mps_ops.named_product_state("x+", L, chi)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(L)]
    )
    cn = compile_noise(nm, L, 2)
    obs = make_obs_z(L)
    plan = TrajectoryPlan(
        dt=0.1, num_steps=steps, order=2, sample_timesteps=True,
        evolution=TDVPConfig(krylov_dim=8, threshold=1e-10, max_bond_dim=chi),
    )
    base = jax.random.PRNGKey(13)
    idx = jnp.arange(2)
    tks = jax.vmap(lambda i: trajectory_key(base, i))(idx)
    sks = jax.vmap(lambda i: sample_key(base, i))(idx)

    # vmap both sides: batching changes XLA op scheduling at the 1e-12 level,
    # so bitwise equality only holds within the same batching regime
    mono, _, final_mono = jax.vmap(
        lambda tk, sk: tjm_trajectory(tk, sk, t0, w, cn, obs, plan)
    )(tks, sks)

    start, chunk = make_order2_chunked(t0, w, cn, obs, plan)
    carry, cols01, _ = start(tks, sks)
    carry, obs_a, _ = chunk(tks, sks, carry, 2, 4)
    carry, obs_b, _ = chunk(tks, sks, carry, 4, steps + 1)
    cols = jnp.concatenate([cols01, obs_a, obs_b], axis=1)  # (B, T, n_obs)

    np.testing.assert_array_equal(
        np.asarray(mono), np.transpose(np.asarray(cols), (0, 2, 1))
    )
    np.testing.assert_array_equal(np.asarray(final_mono), np.asarray(carry[1]))


def test_order2_gauge_free_fast_path_consistency():
    """One-site-only observables engage the gauge-free measurement fast path
    (the measure branch skips canonicalization; analog/tjm.py). Adding a
    two-site observable disables it. Jump decisions and channel draws never
    depend on the evaluation path, so the shared one-site rows must agree to
    evaluation-numerics tolerance, and the fast path's returned final state
    must still honor the canonical-at-0 + normalized contract."""
    from yaqs_tpu.core.observables import compile_observables
    from yaqs_tpu.core.sim_params import Observable

    L, chi, steps = 5, 8, 6
    w = jnp.asarray(ising_mpo(L, 1.0, 0.5))
    t0 = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.25} for i in range(L)]
    )
    cn = compile_noise(nm, L, 2)
    obs_fast = make_obs_z(L)
    assert obs_fast.only_one_site
    obs_slow = compile_observables(
        [Observable("z", i) for i in range(L)] + [Observable("zz", [0, 1])], L, 2
    )
    assert not obs_slow.only_one_site
    plan = TrajectoryPlan(
        dt=0.1, num_steps=steps, order=2, sample_timesteps=True,
        evolution=TDVPConfig(krylov_dim=10, threshold=1e-10, max_bond_dim=chi),
    )
    base = jax.random.PRNGKey(21)
    for i in range(3):  # several trajectories: cover jump and no-jump paths
        tk, sk = trajectory_key(base, i), sample_key(base, i)
        fast, _, psi_fast = tjm_trajectory(tk, sk, t0, w, cn, obs_fast, plan)
        slow, _, psi_slow = tjm_trajectory(tk, sk, t0, w, cn, obs_slow, plan)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(slow)[:L], atol=1e-8
        )
        # the final states are the same physical state in the same gauge
        np.testing.assert_allclose(
            np.asarray(psi_fast), np.asarray(psi_slow), atol=1e-7
        )
        # canonical-at-0 + normalized contract on the fast path's state
        np.testing.assert_allclose(
            float(mps_ops.norm_squared(psi_fast)), 1.0, atol=1e-9
        )
        np.testing.assert_allclose(
            float(mps_ops.norm_squared_center0(psi_fast)), 1.0, atol=1e-9
        )
