"""Simulator golden-trajectory battery (reference test_simulator.py mirrors).

The reference pins hardcoded golden arrays for two-site correlators at chain
boundaries (test_simulator.py:857-1228); here the oracle is a dense
``expm(-iHt)`` evolution computed in-test, compared at EVERY sampled
timestep (sample_timesteps=True), which is strictly stronger than
final-value checks and robust to convention drift.  Also mirrors the
long-range-crosstalk analog run and the digital-circuit correlator variant.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.linalg as sla

from yaqs_tpu import (
    AnalogSimParams,
    DigitalSimParams,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)
from yaqs_tpu.models.operators import PAULI


def _kron_site0_least(ops):
    """Embed per-site ops with site 0 LEAST significant (package statevector
    convention, mps_ops.to_statevector)."""
    full = np.ones((1, 1))
    for op in reversed(ops):
        full = np.kron(full, op)
    return full


def _pair_op(name2, i, j, L):
    a, b = PAULI[name2[0].upper()], PAULI[name2[1].upper()]
    ops = [np.eye(2)] * L
    ops[i] = a
    ops[j] = b
    return _kron_site0_least(ops)


def _dense_trajectory(H, psi0, obs_mats, dt, steps):
    out = np.zeros((len(obs_mats), steps + 1))
    u = sla.expm(-1j * dt * H)
    psi = psi0.copy()
    for t in range(steps + 1):
        for k, m in enumerate(obs_mats):
            out[k, t] = np.real(np.vdot(psi, m @ psi))
        psi = u @ psi
    return out


@pytest.mark.parametrize("pair", [(0, 1), (1, 2), (2, 3)])
def test_two_site_correlator_full_trajectory_vs_dense(pair):
    """XX/YY/ZZ pair correlators from |0000> under TFIM at every timestep
    (reference left/center/right boundary goldens)."""
    L, dt, steps = 4, 0.1, 20
    ham = Hamiltonian.ising(L, 1.0, 0.1)
    i, j = pair
    obs = [Observable(n, [i, j]) for n in ("xx", "yy", "zz")]
    p = AnalogSimParams(observables=obs, elapsed_time=dt * steps, dt=dt,
                        max_bond_dim=4, sample_timesteps=True, num_traj=1)
    res = Simulator().run(State(L), ham, p)
    got = np.asarray(res.expectation_values)
    psi0 = np.zeros(2**L)
    psi0[0] = 1.0
    H = ham.ensure_matrix()
    want = _dense_trajectory(
        H, psi0.astype(complex), [_pair_op(n, i, j, L) for n in ("xx", "yy", "zz")],
        dt, steps,
    )
    # chi is full-rank so the residual is pure integrator error
    # (accumulates ~1e-7/step; the reference pins the same shapes at 1e-3)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_two_site_correlator_from_plus_state_vs_dense():
    """Same contract from an entangling-prone |+...+> start (nonzero XX at
    t=0 distinguishes orderings the |0...0> start cannot see)."""
    L, dt, steps = 4, 0.1, 10
    ham = Hamiltonian.heisenberg(L, 1.0, 1.0, 0.5, 0.2)
    obs = [Observable("xx", [0, 3]), Observable("zz", [1, 2])]
    p = AnalogSimParams(observables=obs, elapsed_time=dt * steps, dt=dt,
                        max_bond_dim=8, sample_timesteps=True, num_traj=1)
    res = Simulator().run(State(L, state="x+"), ham, p)
    got = np.asarray(res.expectation_values)
    plus = np.ones(2) / np.sqrt(2)
    psi0 = np.ones(1)
    for _ in range(L):
        psi0 = np.kron(psi0, plus)
    want = _dense_trajectory(
        ham.ensure_matrix(), psi0.astype(complex),
        [_pair_op("xx", 0, 3, L), _pair_op("zz", 1, 2, L)], dt, steps,
    )
    # Heisenberg integrator error at dt=0.1 reaches ~5e-4 by step 10
    # (the reference pins this class at 1e-3)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_two_site_correlator_circuit_vs_dense():
    """Digital variant (reference test_two_site_correlator_center_circuit):
    a Trotterized Ising circuit's mid+final correlator columns match the
    dense circuit statevector."""
    from yaqs_tpu.models.circuits import create_ising_circuit

    n = 4
    circ = create_ising_circuit(n, 1.0, 0.3, 0.1, 3)
    obs = [Observable(nm, [1, 2]) for nm in ("xx", "yy", "zz")]
    p = DigitalSimParams(observables=obs, num_traj=1, max_bond_dim=8,
                         random_seed=0)
    res = Simulator().run(State(n), circ, p, None)
    got = np.asarray(res.expectation_values)[:, -1]

    # dense oracle via the gate list
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "digital"))
    from test_engine import run_dense

    psi0 = np.zeros(2**n, dtype=complex)
    psi0[0] = 1.0
    psi = run_dense(circ, psi0)
    want = [np.real(np.vdot(psi, _pair_op(nm, 1, 2, n) @ psi))
            for nm in ("xx", "yy", "zz")]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_longrange_crosstalk_xy_analog_runs_and_is_physical():
    """Documented longrange_crosstalk_xy on the analog MPS TJM (reference
    test_analog_longrange_crosstalk_xy_mps_runs) — plus physicality."""
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    noise = NoiseModel([
        {"name": "longrange_crosstalk_xy", "sites": [0, 2], "strength": 0.05},
    ])
    p = AnalogSimParams(observables=[Observable("z", 0)], dt=0.1,
                        elapsed_time=0.2, num_traj=2, max_bond_dim=4,
                        random_seed=0)
    res = Simulator().run(State(3), ham, p, noise)
    ev = np.asarray(res.expectation_values)
    assert ev.shape[-1] >= 1
    assert np.all(np.isfinite(ev)) and np.all(np.abs(ev) <= 1 + 1e-9)


def test_crosstalk_ensemble_mean_matches_lindblad():
    """Long-range Pauli crosstalk through the FULL TJM ensemble converges to
    the dense Lindblad solution (statistical oracle, paired tolerance)."""
    from yaqs_tpu.analog.lindblad import lindblad_expectations, noise_model_jump_ops

    L, gamma, dt, steps = 3, 0.3, 0.1, 5
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    nm = NoiseModel([
        {"name": "longrange_crosstalk_xy", "sites": [0, 2], "strength": gamma},
    ])
    ntraj = 512
    p = AnalogSimParams(observables=[Observable("z", i) for i in range(L)],
                        dt=dt, elapsed_time=dt * steps, num_traj=ntraj,
                        max_bond_dim=8, random_seed=7, sample_timesteps=True)
    res = Simulator().run(State(L, state="x+"), ham, p, nm)
    got = np.asarray(res.expectation_values)

    plus = np.ones(2) / np.sqrt(2)
    psi0 = np.ones(1)
    for _ in range(L):
        psi0 = np.kron(psi0, plus)
    jumps = noise_model_jump_ops(nm, L)
    zs = [_kron_site0_least([PAULI["Z"] if s == i else np.eye(2) for s in range(L)])
          for i in range(L)]
    want = lindblad_expectations(ham.ensure_matrix(), jumps, psi0.astype(complex),
                                 zs, dt, steps)
    # statistical tolerance ~ 3/sqrt(ntraj)
    assert np.abs(got - np.asarray(want)).max() < 0.15
