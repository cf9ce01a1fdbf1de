"""Scheduled deterministic jumps (order-1 analog TJM)."""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State


def test_scheduled_x_flip():
    """An X jump scheduled mid-run flips <Z> deterministically (H = 0-ish)."""
    L = 3
    ham = Hamiltonian.ising(L, J=0.0, g=0.0)  # trivial Hamiltonian
    nm = NoiseModel(
        processes=[],
        scheduled_jumps=[{"time": 0.2, "sites": [1], "name": "x"}],
    )
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=0.4,
        dt=0.1,
        order=1,
        max_bond_dim=4,
        sample_timesteps=True,
        random_seed=0,
    )
    res = Simulator().run(State(L, state="zeros"), ham, params, nm)
    z1 = res.expectation_values[1]
    np.testing.assert_allclose(z1[:2], 1.0, atol=1e-10)  # t=0, 0.1
    np.testing.assert_allclose(z1[2:], -1.0, atol=1e-10)  # flipped at t=0.2
    np.testing.assert_allclose(res.expectation_values[0], 1.0, atol=1e-10)


def test_scheduled_with_stochastic_noise_runs():
    L = 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    nm = NoiseModel(
        processes=[{"name": "z", "sites": [i], "strength": 0.05} for i in range(L)],
        scheduled_jumps=[{"time": 0.1, "sites": [0], "name": "x"}],
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.2,
        dt=0.1,
        order=1,
        num_traj=8,
        max_bond_dim=4,
        random_seed=1,
    )
    res = Simulator().run(State(L), ham, params, nm)
    assert np.isfinite(res.expectation_values).all()


def test_scheduled_requires_order1():
    L = 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    nm = NoiseModel(processes=[], scheduled_jumps=[{"time": 0.1, "sites": [0], "name": "x"}])
    params = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.2, dt=0.1, order=2, max_bond_dim=4
    )
    with pytest.raises(ValueError, match="order=1"):
        Simulator().run(State(L), ham, params, nm)


def test_scheduled_off_grid_time_rejected():
    from yaqs_tpu.methods.scheduled_jumps import compile_scheduled_jumps

    with pytest.raises(ValueError, match="time grid"):
        compile_scheduled_jumps(
            [{"time": 0.15, "sites": [0], "name": "x"}], np.arange(5) * 0.1, 2
        )


def test_scheduled_two_site_nonfactorizable_vs_dense():
    """A non-factorizable adjacent two-site scheduled jump (CX: operator-
    Schmidt rank 2) applies via merge -> matrix -> truncated split, matching
    the dense oracle (reference scheduled_jumps.py:96-108 merged-SVD path)."""
    import scipy.linalg

    from yaqs_tpu.analog.embedding import embed_operator
    from yaqs_tpu.models.operators import pauli_x, pauli_z

    L = 3
    cx = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex
    )
    ham = Hamiltonian.ising(L, J=0.3, g=0.6)
    h = ham.ensure_matrix()
    nm = NoiseModel(
        processes=[],
        scheduled_jumps=[
            {"time": 0.2, "sites": [1], "name": "x"},  # flips control qubit 1
            {"time": 0.3, "sites": [1, 2], "name": "cx", "matrix": cx},
        ],
    )
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=0.4,
        dt=0.1,
        order=1,
        max_bond_dim=4,
        sample_timesteps=True,
        random_seed=0,
    )
    res = Simulator().run(State(L, state="zeros"), ham, params, nm)

    # dense oracle: evolve, apply scheduled ops at their grid steps
    psi = State(L, state="zeros").to_vector()
    u_step = scipy.linalg.expm(-1j * 0.1 * h)
    x1 = embed_operator({1: pauli_x}, L)
    # CX(control=1, target=2) = P0_1 + P1_1 X_2 (embed_operator owns the
    # to_vector bit-order convention)
    p0 = np.diag([1.0, 0.0]).astype(complex)
    p1 = np.diag([0.0, 1.0]).astype(complex)
    cx12 = embed_operator({1: p0}, L) + embed_operator({1: p1, 2: pauli_x}, L)
    expected = []
    zs = [embed_operator({i: pauli_z}, L) for i in range(L)]
    expected.append([np.vdot(psi, z @ psi).real for z in zs])
    for step in range(1, 5):
        psi = u_step @ psi
        if step == 2:
            psi = x1 @ psi
        if step == 3:
            psi = cx12 @ psi
        psi = psi / np.linalg.norm(psi)
        expected.append([np.vdot(psi, z @ psi).real for z in zs])
    np.testing.assert_allclose(
        res.expectation_values.T, np.asarray(expected), atol=1e-6
    )


def test_scheduled_two_site_factorizable_uses_product_path():
    """An XX crosstalk jump (operator-Schmidt rank 1) compiles into the
    one-site stack — no slot tables emitted."""
    from yaqs_tpu.methods.scheduled_jumps import compile_scheduled_jumps

    xx = np.kron(
        np.array([[0, 1], [1, 0]], dtype=complex),
        np.array([[0, 1], [1, 0]], dtype=complex),
    )
    flags, mats, two = compile_scheduled_jumps(
        [{"time": 0.1, "sites": [0, 1], "name": "xx", "matrix": xx}], np.arange(3) * 0.1, 3
    )
    assert two is None
    assert flags[0] and not flags[1]
    np.testing.assert_allclose(mats[0, 2], np.eye(2))


def test_scheduled_two_site_nonadjacent_rejected():
    from yaqs_tpu.methods.scheduled_jumps import compile_scheduled_jumps

    cx = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex
    )
    with pytest.raises(ValueError, match="nearest-neighbor"):
        compile_scheduled_jumps(
            [{"time": 0.1, "sites": [0, 2], "name": "cx", "matrix": cx}], np.arange(3) * 0.1, 3
        )


def test_scheduled_jump_at_t0_applies_before_initial_sample():
    """A jump scheduled at times[0] is applied before the first sample, so the
    t=0 observable row already reflects it (reference analog_tjm.py:281-283)."""
    L = 3
    ham = Hamiltonian.ising(L, J=0.0, g=0.0)
    nm = NoiseModel(
        processes=[],
        scheduled_jumps=[{"time": 0.0, "sites": [1], "name": "x"}],
    )
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=0.2,
        dt=0.1,
        order=1,
        max_bond_dim=4,
        sample_timesteps=True,
        random_seed=0,
    )
    res = Simulator().run(State(L, state="zeros"), ham, params, nm)
    np.testing.assert_allclose(res.expectation_values[1], -1.0, atol=1e-10)
    np.testing.assert_allclose(res.expectation_values[0], 1.0, atol=1e-10)
    np.testing.assert_allclose(res.expectation_values[2], 1.0, atol=1e-10)


def test_scheduled_jump_at_t0_two_site_entangling():
    """Two jumps at t=0 applied in list order (host-side path): H on site 0
    then CX turns |00> into a Bell pair; <Z_i> = 0 but <XX> = 1 at t=0."""
    L = 2
    ham = Hamiltonian.ising(L, J=0.0, g=0.0)
    cx = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex
    )
    hmat = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
    nm = NoiseModel(
        processes=[],
        scheduled_jumps=[
            {"time": 0.0, "sites": [0], "name": "h", "matrix": hmat},
            {"time": 0.0, "sites": [0, 1], "name": "cx", "matrix": cx},
        ],
    )
    params = AnalogSimParams(
        observables=[
            Observable("z", 0),
            Observable("z", 1),
            Observable("xx", [0, 1]),
        ],
        elapsed_time=0.1,
        dt=0.1,
        order=1,
        max_bond_dim=4,
        sample_timesteps=True,
        random_seed=0,
    )
    res = Simulator().run(State(L, state="zeros"), ham, params, nm)
    # (|00> + |11>)/sqrt(2): <Z_i> = 0, <X X> = 1
    np.testing.assert_allclose(res.expectation_values[0, 0], 0.0, atol=1e-10)
    np.testing.assert_allclose(res.expectation_values[1, 0], 0.0, atol=1e-10)
    np.testing.assert_allclose(res.expectation_values[2, 0], 1.0, atol=1e-10)


def test_scheduled_jump_t0_annihilation_raises():
    """A t=0 jump whose operator annihilates the state raises the reference's
    zero-norm error (scheduled_jumps.py:112-119)."""
    L = 2
    ham = Hamiltonian.ising(L, J=0.0, g=0.0)
    # projector onto |1> annihilates |0>
    proj1 = np.array([[0, 0], [0, 1]], dtype=complex)
    nm = NoiseModel(
        processes=[],
        scheduled_jumps=[{"time": 0.0, "sites": [0], "name": "p1", "matrix": proj1}],
    )
    params = AnalogSimParams(
        observables=[Observable("z", 0)],
        elapsed_time=0.1,
        dt=0.1,
        order=1,
        max_bond_dim=4,
        random_seed=0,
    )
    with pytest.raises(ValueError, match="annihilates"):
        Simulator().run(State(L, state="zeros"), ham, params, nm)


def test_simulator_rejects_no_output_request():
    """Either observables or get_state must be requested (reference
    simulator validation)."""
    L = 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    params = AnalogSimParams(
        observables=[], elapsed_time=0.1, dt=0.1, order=1, max_bond_dim=4
    )
    with pytest.raises(ValueError, match="observables or get_state"):
        Simulator().run(State(L), ham, params)
