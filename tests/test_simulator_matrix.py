"""Simulator facade integration matrix: order 1 vs order 2 vs exact Lindblad,
sampling contracts, and BUG mode through the facade.

Fills the reference's big-matrix strategy (tests/test_simulator.py, 2069 LoC:
every engine exercised through the public facade against an independent
oracle) for the combinations not covered by tests/test_simulator.py /
test_simulator_scale.py.
"""

from __future__ import annotations

import pytest

import numpy as np
import scipy.linalg

from yaqs_tpu import (
    AnalogSimParams,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.models.operators import pauli_z


def _params(length, dt, steps, **kw):
    base = dict(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=8,
        svd_threshold=1e-12,
        krylov_dim=15,
        sample_timesteps=True,
        random_seed=11,
    )
    base.update(kw)
    return AnalogSimParams(**base)


def test_order1_and_order2_match_exact_lindblad():
    """Both TJM orders through the facade must converge to the exact Lindblad
    solution (density-matrix representation) within Monte-Carlo error; the
    reference validates exactly this triplet (tests/test_simulator.py TJM
    blocks)."""
    length, gamma, dt, steps, ntraj = 3, 0.25, 0.1, 4, 300
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    noise = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": gamma} for i in range(length)]
    )
    exact = Simulator().run(
        State(length, state="x+", representation="density_matrix"),
        ham,
        _params(length, dt, steps),
        noise,
    )
    for order in (1, 2):
        res = Simulator().run(
            State(length, state="x+"),
            ham,
            _params(length, dt, steps, order=order, num_traj=ntraj),
            noise,
        )
        stderr = res.trajectories.std(axis=0) / np.sqrt(res.num_trajectories)
        diff = np.abs(res.expectation_values - exact.expectation_values)
        # order-1 carries an additional O(dt) splitting bias on top of the
        # Monte-Carlo error (reference analog_tjm_1 semantics)
        bias = 0.02 if order == 2 else 0.05 + 2 * gamma * dt
        assert np.all(diff < 5 * stderr + bias), (order, diff.max())


def test_noiseless_orders_agree_with_dense():
    """Noiseless: both orders are deterministic Trotterizations of the same
    unitary evolution and must track exp(-i H t) |psi0>."""
    length, dt, steps = 4, 0.05, 4
    ham = Hamiltonian.ising(length, 1.0, 0.7)
    h = ham.ensure_matrix()
    psi0 = State(length, state="x+").to_vector()
    want = np.zeros((length, steps + 1))
    for j in range(steps + 1):
        psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi0
        for i in range(length):
            want[i, j] = np.vdot(psi_t, embed_one_site(pauli_z, i, length) @ psi_t).real
    for order in (1, 2):
        res = Simulator().run(
            State(length, state="x+"),
            ham,
            _params(length, dt, steps, order=order, krylov_dim=20),
            None,
        )
        assert res.num_trajectories == 1  # deterministic -> single trajectory
        np.testing.assert_allclose(res.expectation_values, want, atol=1e-6)


@pytest.mark.slow
def test_sample_timesteps_false_matches_final_sampled_column():
    """sample_timesteps=False must return exactly the final column of the
    sampled run with the same seed: the trajectory stream and the final
    measurement use identical RNG folds (analog/tjm.py:318-334), so turning
    per-step sampling off never perturbs the physics."""
    length, dt, steps = 3, 0.1, 4
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    noise = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.3} for i in range(length)]
    )
    for order in (1, 2):
        full = Simulator().run(
            State(length, state="x+"),
            ham,
            _params(length, dt, steps, order=order, num_traj=12),
            noise,
        )
        final = Simulator().run(
            State(length, state="x+"),
            ham,
            _params(
                length, dt, steps, order=order, num_traj=12, sample_timesteps=False
            ),
            noise,
        )
        assert final.expectation_values.shape == (length, 1)
        np.testing.assert_allclose(
            final.expectation_values[:, 0],
            full.expectation_values[:, -1],
            atol=1e-6,
            err_msg=f"order={order}",
        )


def test_bug_mode_through_facade_matches_dense():
    """evolution_mode="bug" (rank-revealing basis-update-and-galerkin) through
    the facade must track the dense oracle like TDVP does."""
    length, dt, steps = 4, 0.05, 4
    ham = Hamiltonian.heisenberg(length, 0.4, 0.6, 1.0, h=0.3)
    h = ham.ensure_matrix()
    psi0 = State(length, state="Neel").to_vector()
    res = Simulator().run(
        State(length, state="Neel"),
        ham,
        _params(
            length,
            dt,
            steps,
            evolution_mode="bug",
            max_bond_dim=16,
            krylov_dim=20,
        ),
        None,
    )
    want = np.zeros((length, steps + 1))
    for j in range(steps + 1):
        psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi0
        for i in range(length):
            want[i, j] = np.vdot(psi_t, embed_one_site(pauli_z, i, length) @ psi_t).real
    np.testing.assert_allclose(res.expectation_values, want, atol=5e-4)


@pytest.mark.slow
def test_order1_order2_noisy_seeded_reproducibility():
    """Identical seeds give identical ensembles for each order (regression for
    the fold_in stream hierarchy through the facade)."""
    length, dt, steps = 3, 0.1, 3
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    noise = NoiseModel(
        [{"name": "z", "sites": [i], "strength": 0.2} for i in range(length)]
    )
    for order in (1, 2):
        a = Simulator().run(
            State(length, state="x+"),
            ham,
            _params(length, dt, steps, order=order, num_traj=8),
            noise,
        )
        b = Simulator().run(
            State(length, state="x+"),
            ham,
            _params(length, dt, steps, order=order, num_traj=8),
            noise,
        )
        np.testing.assert_array_equal(a.trajectories, b.trajectories)
