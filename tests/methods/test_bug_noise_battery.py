"""BUG integrator in the full noisy pipeline.

Round 2 shipped a red BUG battery (basis pollution from canonicalized product
starts, fixed in de360f6); this battery defends the fix's blast radius: BUG
must hold up not just on the noiseless cells but through the complete
stochastic TJM schedule — dissipation interleaving, jump application,
ensemble averaging — and from entangled starts.

Oracles: dense ``expm`` for deterministic paths, dense Lindblad propagation
for noisy ensembles (reference BUG coverage: tests/core/methods/test_bug.py +
the analog cross-backend pattern in tests/analog/test_analog_tjm.py).
"""

from __future__ import annotations

import numpy as np
import pytest
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
from yaqs_tpu.analog.lindblad import build_liouvillian
from yaqs_tpu.models.operators import lowering, pauli_z


def _dense_lindblad_z(length, ham, processes, times):
    dim = 2**length
    h = ham.ensure_matrix()
    jumps = []
    for proc in processes:
        mat = {"lowering": lowering, "z": pauli_z}[proc["name"]]
        jumps.append(
            np.sqrt(proc["strength"]) * embed_one_site(mat, proc["sites"][0], length)
        )
    liou = build_liouvillian(h, jumps)
    psi = np.zeros(dim, dtype=complex)
    psi[0] = 1.0
    psi = np.ones(dim, dtype=complex) / np.sqrt(dim)  # |+...+>
    rho = np.outer(psi, psi.conj())
    out = np.zeros((length, len(times)))
    for j, t in enumerate(times):
        rho_t = (scipy.linalg.expm(liou * t) @ rho.reshape(-1)).reshape(dim, dim)
        for i in range(length):
            out[i, j] = np.real(np.trace(embed_one_site(pauli_z, i, length) @ rho_t))
    return out


@pytest.mark.parametrize("order", [1, 2])
def test_bug_noisy_ensemble_matches_lindblad(order):
    """BUG-mode noisy TJM ensemble mean vs the dense Lindblad oracle."""
    length = 4
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    procs = [{"name": "lowering", "sites": [i], "strength": 0.15} for i in range(length)]
    nm = NoiseModel([dict(p) for p in procs])
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=1.0,
        dt=0.1,
        num_traj=300,
        max_bond_dim=8,
        order=order,
        evolution_mode="bug",
        random_seed=5,
    )
    res = Simulator().run(State(length, state="x+"), ham, params, nm)
    exact = _dense_lindblad_z(length, ham, procs, params.times)
    stderr = res.trajectories.std(axis=0) / np.sqrt(res.num_trajectories)
    diff = np.abs(res.expectation_values - exact)
    assert np.all(diff < 5 * stderr + 0.03), (diff.max(), stderr.max())


def test_bug_noiseless_entangled_start_matches_dense():
    """From a haar-entangled start (full-rank active subspace from step 0),
    BUG must track dense expm tightly — no augmentation needed."""
    length = 4
    chi = 8
    ham = Hamiltonian.heisenberg(length, 1.0, 1.0, 0.7, 0.3)
    state = State(length, state="haar-random")
    state.ensure_encoded("mps")  # pin ONE haar draw shared by the run and the oracle
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=0.5,
        dt=0.05,
        num_traj=1,
        max_bond_dim=chi,
        evolution_mode="bug",
        random_seed=0,
    )
    res = Simulator().run(state, ham, params, None)

    psi0 = state.to_vector()
    h = ham.ensure_matrix()
    want = np.zeros((length, len(params.times)))
    for j, t in enumerate(params.times):
        psi_t = scipy.linalg.expm(-1j * h * t) @ psi0
        for i in range(length):
            want[i, j] = np.real(
                np.vdot(psi_t, embed_one_site(pauli_z, i, length) @ psi_t)
            )
    np.testing.assert_allclose(res.expectation_values, want, atol=5e-4)


def test_bug_and_tdvp_share_stochastic_schedule():
    """Same seed, same noise: the BUG run's t=0 column and jump bookkeeping
    match tdvp's exactly (the schedule is mode-independent; only the unitary
    substep differs).  Guards against the BUG branch accidentally consuming
    extra RNG or reordering the dissipation interleave."""
    length = 4
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.2} for i in range(length)]
    )

    def run(mode):
        params = AnalogSimParams(
            observables=[Observable("z", i) for i in range(length)],
            elapsed_time=0.3,
            dt=0.1,
            num_traj=16,
            max_bond_dim=8,
            evolution_mode=mode,
            random_seed=42,
        )
        return Simulator().run(State(length, state="x+"), ham, params, nm)

    res_bug, res_tdvp = run("bug"), run("tdvp")
    # column 0 samples the initial state before any evolution: bit-identical
    np.testing.assert_array_equal(
        res_bug.trajectories[:, :, 0], res_tdvp.trajectories[:, :, 0]
    )
    # both integrate the same physics; ensemble means stay within joint MC
    # error of each other at weak entanglement growth
    stderr = (
        res_bug.trajectories.std(axis=0) + res_tdvp.trajectories.std(axis=0)
    ) / np.sqrt(res_bug.num_trajectories)
    diff = np.abs(res_bug.expectation_values - res_tdvp.expectation_values)
    assert np.all(diff < 5 * stderr + 0.05), (diff.max(), stderr.max())


def test_bug_respects_bond_cap_under_noise():
    """Effective ranks never exceed the configured cap even when jumps
    repeatedly kick the state off the low-rank manifold."""
    length = 6
    chi = 4
    ham = Hamiltonian.heisenberg(length, 1.0, 1.0, 1.0, 0.4)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.3} for i in range(length)]
    )
    params = AnalogSimParams(
        observables=[Observable("schmidt_spectrum", i) for i in range(length - 1)],
        elapsed_time=0.8,
        dt=0.1,
        num_traj=4,
        max_bond_dim=chi,
        evolution_mode="bug",
        random_seed=3,
    )
    res = Simulator().run(State(length, state="x+"), ham, params, nm)
    for i in range(length - 1):
        spec = np.asarray(res.schmidt_spectra[i])  # (n_traj, chi, T)
        assert spec.shape[1] == chi
        np.testing.assert_array_less(-1e-12, spec)
        # normalized spectra: squared Schmidt values sum to 1 at every time
        np.testing.assert_allclose((spec**2).sum(axis=1), 1.0, atol=1e-6)
