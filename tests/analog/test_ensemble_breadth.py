"""Unitary-ensemble breadth: t=0-only runs, output clearing, dense-H input,
and the XXZ+transverse two-time ED battery.

Mirrors the remaining reference ensemble cases
(/root/reference/tests/analog/test_ensemble.py:103-168 t0-only recording and
feature-off clearing; :169-187 dense-Hamiltonian acceptance; :411-474 the
transverse-XXZ multi-pair two-time correlator vs dense ED at 1e-5).
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.linalg

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.models.operators import pauli_x, pauli_y, pauli_z


def test_t0_only_records_observables_and_correlators():
    """elapsed_time=0 with sampling off still produces one recorded column
    for both observables and multi-time pairs."""
    length = 2
    ham = Hamiltonian.ising(length, 0.2, 0.1)
    z0, z1 = Observable("z", 0), Observable("z", 1)
    params = AnalogSimParams(
        observables=[z0],
        elapsed_time=0.0,
        dt=0.1,
        sample_timesteps=False,
        multi_time_observables=[(z0, z0), (z0, z1)],
    )
    res = Simulator().run([State(length, state="zeros")], ham, params, None)
    assert res.expectation_values[0].shape == (1,)
    np.testing.assert_allclose(res.expectation_values[0][0], 1.0, atol=1e-10)
    assert res.multi_time_results is not None
    assert res.multi_time_results.shape == (2, 1)
    np.testing.assert_allclose(res.multi_time_results[0, 0], 1.0 + 0j, atol=1e-10)
    np.testing.assert_allclose(res.multi_time_results[1, 0], 1.0 + 0j, atol=1e-10)


def test_multi_time_outputs_absent_when_feature_disabled():
    length = 2
    ham = Hamiltonian.ising(length, 0.2, 0.1)
    states = [State(length, state="zeros"), State(length, state="ones")]
    z0 = Observable("z", 0)
    on = AnalogSimParams(
        observables=[],
        elapsed_time=0.2,
        dt=0.1,
        sample_timesteps=True,
        multi_time_observables=[(z0, z0)],
    )
    res_on = Simulator().run(states, ham, on, None)
    assert res_on.multi_time_results is not None
    assert res_on.multi_time_times is not None

    off = AnalogSimParams(
        observables=[z0],
        elapsed_time=0.2,
        dt=0.1,
        sample_timesteps=True,
    )
    res_off = Simulator().run(states, ham, off, None)
    assert res_off.multi_time_results is None
    assert res_off.multi_time_times is None


def test_ensemble_accepts_dense_hamiltonian():
    """List-of-MPS ensembles auto-convert dense Hamiltonians to MPO and agree
    with the MPO-built run exactly (same seeds, unitary)."""
    length = 3
    j, g = 0.6, 0.2
    ham_mpo = Hamiltonian.ising(length, j, g)
    ham_dense = Hamiltonian.from_matrix(ham_mpo.ensure_matrix(), length=length)
    states = lambda: [State(length, state="zeros"), State(length, state="ones")]
    params = lambda: AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=0.3,
        dt=0.1,
        sample_timesteps=True,
        max_bond_dim=8,
    )
    res_a = Simulator().run(states(), ham_mpo, params(), None)
    res_b = Simulator().run(states(), ham_dense, params(), None)
    np.testing.assert_allclose(
        res_a.expectation_values, res_b.expectation_values, atol=1e-8
    )


def _ed_two_time(length, h_mat, psi0s, times, site, probes):
    """<psi| A(t) B(0) |psi> averaged over the ensemble, by dense evolution."""
    out = np.zeros((len(probes), len(times)), dtype=complex)
    for psi0 in psi0s:
        bpsis = [embed_one_site(b, site, length) @ psi0 for _, b in probes]
        for j, t in enumerate(times):
            u = scipy.linalg.expm(-1j * h_mat * t)
            psi_t = u @ psi0
            for p, (a, _) in enumerate(probes):
                a_full = embed_one_site(a, site, length)
                out[p, j] += np.vdot(psi_t, a_full @ (u @ bpsis[p]))
    return out / len(psi0s)


@pytest.mark.slow
def test_xxz_transverse_two_time_vs_dense_ed():
    """Transverse-field XXZ, four probe pairs incl. a mixed (Z, X) pair,
    8 basis-state members — match dense ED to 1e-5 (reference :411)."""
    length = 5
    j_xy, delta, h_x = 1.0, 0.7, 0.5
    t_final, dt, k = 1.0, 0.05, 8
    mid = length // 2

    ham = Hamiltonian.pauli(
        length=length,
        two_body=[
            (0.25 * j_xy, "X", "X"),
            (0.25 * j_xy, "Y", "Y"),
            (0.25 * delta, "Z", "Z"),
        ],
        one_body=[(0.5 * h_x, "X")],
    )
    states = [
        State(length, basis_string=format(i, f"0{length}b")) for i in range(k)
    ]
    ox, oy, oz = Observable("x", mid), Observable("y", mid), Observable("z", mid)
    pairs = [(ox, ox), (oy, oy), (oz, oz), (oz, ox)]
    params = AnalogSimParams(
        observables=[],
        elapsed_time=t_final,
        dt=dt,
        max_bond_dim=32,
        svd_threshold=1e-12,
        sample_timesteps=True,
        multi_time_observables=pairs,
    )
    res = Simulator().run(states, ham, params, None)
    got = np.asarray(res.multi_time_results)
    times = np.asarray(res.multi_time_times)

    h_mat = ham.ensure_matrix()
    psi0s = [s.to_vector() for s in states]
    probe_mats = [
        (pauli_x, pauli_x),
        (pauli_y, pauli_y),
        (pauli_z, pauli_z),
        (pauli_z, pauli_x),
    ]
    want = _ed_two_time(length, h_mat, psi0s, times, mid, probe_mats)
    err = np.max(np.abs(got - want), axis=1)
    assert np.all(err < 1e-5), err


def test_probe_rows_at_t0_match_plain_expectations():
    """The (A, B) correlator at t=0 is <A B>; for A=B=Z on a basis state
    that equals <Z^2> = 1, and for the mixed (Z, X) pair it equals <Z X>."""
    length = 3
    ham = Hamiltonian.ising(length, 0.5, 0.3)
    oz, ox = Observable("z", 1), Observable("x", 1)
    params = AnalogSimParams(
        observables=[],
        elapsed_time=0.2,
        dt=0.1,
        sample_timesteps=True,
        multi_time_observables=[(oz, oz), (oz, ox)],
    )
    state = State(length, state="x+")
    res = Simulator().run([state], ham, params, None)
    psi = state.to_vector()
    zx = embed_one_site(pauli_z, 1, length) @ embed_one_site(pauli_x, 1, length)
    np.testing.assert_allclose(res.multi_time_results[0, 0], 1.0 + 0j, atol=1e-8)
    np.testing.assert_allclose(
        res.multi_time_results[1, 0], np.vdot(psi, zx @ psi), atol=1e-8
    )
