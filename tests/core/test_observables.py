"""Compiled observables: two-site correlators, entropy, PVM rows."""

from __future__ import annotations

import numpy as np
import scipy.linalg

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State
from yaqs_tpu.analog.embedding import embed_operator
from yaqs_tpu.models.operators import pauli_x, pauli_z


def dense_two_site(op4, i, j, length):
    """Embed a two-site matrix with the first site most significant."""
    t = op4.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(4, 4)
    u, s, vh = np.linalg.svd(t)
    dense = np.zeros((2**length, 2**length), dtype=complex)
    for k in range(len(s)):
        if s[k] < 1e-14:
            break
        a = (u[:, k] * s[k]).reshape(2, 2)
        b = vh[k].reshape(2, 2)
        dense += embed_operator({i: a, j: b}, length)
    return dense


def test_two_site_correlators_vs_dense():
    L, dt, steps = 4, 0.05, 3
    ham = Hamiltonian.ising(L, 1.0, 0.7)
    h = ham.ensure_matrix()
    obs = [
        Observable("zz", [0, 1]),
        Observable("xx", [1, 3]),  # distant pair
        Observable("z", 2),
        Observable(np.kron(pauli_z, pauli_x), [2, 3]),  # raw two-site matrix
    ]
    params = AnalogSimParams(
        observables=obs,
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=8,
        svd_threshold=1e-13,
        krylov_dim=20,
        order=2,
        random_seed=0,
    )
    res = Simulator().run(State(L, state="x+"), ham, params, None)
    psi0 = State(L, state="x+").to_vector()
    for j in range(steps + 1):
        psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi0
        expected = [
            np.vdot(psi_t, dense_two_site(np.kron(pauli_z, pauli_z), 0, 1, L) @ psi_t).real,
            np.vdot(psi_t, dense_two_site(np.kron(pauli_x, pauli_x), 1, 3, L) @ psi_t).real,
            np.vdot(psi_t, embed_operator({2: pauli_z}, L) @ psi_t).real,
            np.vdot(psi_t, dense_two_site(np.kron(pauli_z, pauli_x), 2, 3, L) @ psi_t).real,
        ]
        np.testing.assert_allclose(res.expectation_values[:, j], expected, atol=1e-6)


def test_entropy_observable():
    L = 4
    ham = Hamiltonian.ising(L, 1.0, 1.0)
    obs = [Observable("entropy", [1, 2]), Observable("z", 0)]
    params = AnalogSimParams(
        observables=obs,
        elapsed_time=0.6,
        dt=0.1,
        max_bond_dim=8,
        svd_threshold=1e-13,
        order=2,
        random_seed=0,
    )
    res = Simulator().run(State(L, state="zeros"), ham, params, None)
    ent = res.expectation_values[0]
    assert ent[0] < 1e-10  # product state
    assert ent[-1] > 0.01  # entangled after evolution


def test_pvm_observable():
    L = 3
    ham = Hamiltonian.ising(L, 0.0, 0.0)
    obs = [Observable("010"), Observable("000")]
    params = AnalogSimParams(
        observables=obs, elapsed_time=0.0, dt=0.1, max_bond_dim=4, random_seed=0
    )
    res = Simulator().run(State(L, state="Neel"), ham, params, None)
    np.testing.assert_allclose(res.expectation_values[:, 0], [1.0, 0.0], atol=1e-10)


def test_two_site_observable_mcwf_and_lindblad():
    L = 3
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    obs = [Observable("zz", [0, 2]), Observable("z", 1)]
    params = AnalogSimParams(
        observables=obs, elapsed_time=0.2, dt=0.1, max_bond_dim=8,
        svd_threshold=1e-13, krylov_dim=15, order=2, random_seed=0,
    )
    res_m = Simulator().run(State(L, state="x+"), ham, params, None)
    res_v = Simulator().run(State(L, state="x+", representation="vector"), ham, params, None)
    res_r = Simulator().run(
        State(L, state="x+", representation="density_matrix"), ham, params, None
    )
    np.testing.assert_allclose(res_m.expectation_values, res_v.expectation_values, atol=1e-6)
    np.testing.assert_allclose(res_m.expectation_values, res_r.expectation_values, atol=1e-6)


def dense_multi_site(m, sites, length):
    """Independent dense embedding oracle for a k-site operator (matrix with
    row/col multi-indices in the given site order; site axis significance via
    tensordot into an identity, site 0 least significant)."""
    k = len(sites)
    dim = 2**length
    t = np.asarray(m, dtype=complex).reshape([2] * (2 * k))
    eye = np.eye(dim, dtype=complex).reshape([2] * length + [dim])
    axes = [length - 1 - s for s in sites]
    out = np.tensordot(t, eye, axes=(list(range(k, 2 * k)), axes))
    remaining = [ax for ax in range(length) if ax not in axes]
    current = axes + remaining + [length]
    perm = [current.index(i) for i in range(length + 1)]
    return out.transpose(perm).reshape(dim, dim)


def test_three_site_observable_vs_dense():
    """k>=3-site (non-adjacent, unsorted sites) observables — beyond the
    reference's 2-site cap — must match the dense oracle on the TJM path."""
    rng = np.random.default_rng(5)
    L, dt, steps = 5, 0.05, 2
    ham = Hamiltonian.ising(L, 1.0, 0.7)
    h = ham.ensure_matrix()
    # random Hermitian 3-site operator on non-adjacent, unsorted sites
    a = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    m3 = a + a.conj().T
    sites3 = [3, 0, 4]
    zzz = np.kron(np.kron(pauli_z, pauli_z), pauli_z)
    obs = [
        Observable(m3, sites3),
        Observable(zzz, [1, 2, 3]),
        Observable("z", 2),
    ]
    params = AnalogSimParams(
        observables=obs, elapsed_time=dt * steps, dt=dt, max_bond_dim=8,
        svd_threshold=1e-13, krylov_dim=20, order=2, random_seed=0,
    )
    res = Simulator().run(State(L, state="x+"), ham, params, None)
    psi0 = State(L, state="x+").to_vector()
    dense_ops = [
        dense_multi_site(m3, sites3, L),
        dense_multi_site(zzz, [1, 2, 3], L),
        dense_multi_site(pauli_z, [2], L),
    ]
    for j in range(steps + 1):
        psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi0
        for r, o in enumerate(dense_ops):
            np.testing.assert_allclose(
                res.expectation_values[r, j],
                np.real(np.vdot(psi_t, o @ psi_t)),
                atol=1e-6,
            )


def test_three_site_observable_mcwf_and_lindblad():
    """The vector (MCWF) and density-matrix (Lindblad) paths accept k=3-site
    observables too (dense + sparse embedding via product_terms)."""
    rng = np.random.default_rng(7)
    L, dt = 3, 0.1
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    zzz = np.kron(np.kron(pauli_z, pauli_z), pauli_z)
    obs = [Observable(zzz, [0, 1, 2])]
    params = AnalogSimParams(
        observables=obs, elapsed_time=dt, dt=dt, sample_timesteps=True
    )
    res_v = Simulator().run(State(L, representation="vector"), ham, params, None)
    res_r = Simulator().run(State(L, representation="density_matrix"), ham, params, None)
    h = ham.ensure_matrix()
    psi0 = State(L).to_vector()
    o = dense_multi_site(zzz, [0, 1, 2], L)
    for j in range(2):
        psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi0
        want = np.real(np.vdot(psi_t, o @ psi_t))
        np.testing.assert_allclose(res_v.expectation_values[0, j], want, atol=1e-8)
        np.testing.assert_allclose(res_r.expectation_values[0, j], want, atol=1e-8)


def test_gauge_free_one_site_evaluation_matches_canonical():
    """evaluate_observables_gauge_free must reproduce the canonical-path
    values on a state in ARBITRARY gauge and scale: the order-2 measurement
    branch relies on this to skip its full-chain canonicalization
    (analog/tjm.py fast path)."""
    import jax.numpy as jnp
    import pytest

    from yaqs_tpu.core import mps_ops
    from yaqs_tpu.core.observables import (
        compile_observables,
        evaluate_observables,
        evaluate_observables_gauge_free,
    )
    from yaqs_tpu.models.operators import pauli_y

    L, chi = 5, 8
    rng = np.random.default_rng(7)
    t = mps_ops.haar_random_mps(L, chi, rng=rng)
    obs = [Observable("z", i) for i in range(L)]
    obs += [Observable("x", 2), Observable("y", 3), Observable(pauli_y, 0)]
    co = compile_observables(obs, L, 2)

    canon, _ = mps_ops.normalize_canonical(jnp.asarray(t))
    base = np.asarray(evaluate_observables(canon, co))

    # dense oracle from the canonical state
    psi = np.asarray(mps_ops.to_statevector(canon))
    mats = [embed_operator({i: pauli_z}, L) for i in range(L)]
    mats += [
        embed_operator({2: pauli_x}, L),
        embed_operator({3: pauli_y}, L),
        embed_operator({0: pauli_y}, L),
    ]
    dense = [np.real(np.vdot(psi, m @ psi)) for m in mats]
    np.testing.assert_allclose(base, dense, atol=1e-10)

    # scramble: invertible bond transforms G, G^{-1} (state unchanged) plus a
    # global scale (gauge-free path normalizes by <psi|psi>)
    t2 = np.asarray(t).copy()
    for bond in (1, 3):
        g = (
            np.eye(chi)
            + 0.3 * rng.standard_normal((chi, chi))
            + 0.2j * rng.standard_normal((chi, chi))
        )
        t2[bond] = np.einsum("slr,rm->slm", t2[bond], g)
        t2[bond + 1] = np.einsum("ml,slr->smr", np.linalg.inv(g), t2[bond + 1])
    t2[0] *= 1.7 - 0.4j

    got = np.asarray(evaluate_observables_gauge_free(jnp.asarray(t2), co))
    np.testing.assert_allclose(got, base, atol=1e-9)

    # contract: refuses anything beyond one-site rows
    co2 = compile_observables([Observable("zz", [0, 1])], L, 2)
    with pytest.raises(ValueError, match="one-site"):
        evaluate_observables_gauge_free(jnp.asarray(t2), co2)


def test_schmidt_spectrum_observable_analog_vs_dense():
    """schmidt_spectrum observables return (n_traj, chi, T) spectra matching
    the dense bipartition SVD at every sampled time (reference SchmidtSpectrum
    pseudo-observable; values, not entropies)."""
    L, dt, steps = 4, 0.05, 3
    ham = Hamiltonian.ising(L, 1.0, 0.7)
    h = ham.ensure_matrix()
    obs = [Observable("z", 0), Observable("schmidt_spectrum", [1, 2]), Observable("entropy", [1, 2])]
    params = AnalogSimParams(
        observables=obs,
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=8,
        svd_threshold=1e-13,
        krylov_dim=20,
        random_seed=0,
    )
    res = Simulator().run(State(L, state="x+"), ham, params, None)
    assert res.schmidt_spectra is not None and 1 in res.schmidt_spectra
    sp = res.schmidt_spectra[1]
    assert sp.shape == (1, 8, steps + 1)
    assert res.observable(1) is sp

    psi0 = State(L, state="x+").to_vector()
    for j in range(steps + 1):
        psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi0
        # bipartition (sites 0,1 | sites 2,3); site 0 least significant
        m = psi_t.reshape(4, 4)  # rows = (s3 s2), cols = (s1 s0)
        s = np.linalg.svd(m, compute_uv=False)
        got = np.sort(sp[0, :, j])[::-1]
        np.testing.assert_allclose(got[: len(s)], s, atol=1e-6)
        # entropy row agrees with -sum p log p of the same spectrum
        p = s**2 / np.sum(s**2)
        ent = -np.sum(p[p > 1e-14] * np.log(p[p > 1e-14]))
        np.testing.assert_allclose(res.expectation_values[2][j], ent, atol=1e-6)
    # scalar rows unaffected
    for j in range(steps + 1):
        psi_t = scipy.linalg.expm(-1j * h * dt * j) @ psi0
        want = np.vdot(psi_t, embed_operator({0: pauli_z}, L) @ psi_t).real
        np.testing.assert_allclose(res.expectation_values[0][j], want, atol=1e-6)


def test_schmidt_spectrum_observable_digital():
    """Digital engine returns the Bell-state spectrum (1/sqrt2, 1/sqrt2)."""
    from yaqs_tpu import DigitalSimParams
    from yaqs_tpu.digital.circuit import Circuit

    c = Circuit(2)
    c.h(0)
    c.cx(0, 1)
    params = DigitalSimParams(
        observables=[Observable("z", 0), Observable("schmidt_spectrum", [0, 1])],
        max_bond_dim=4,
        random_seed=0,
    )
    res = Simulator().run(State(2), c, params, None)
    sp = res.schmidt_spectra[1]
    vals = np.sort(sp[0, :, -1])[::-1]
    np.testing.assert_allclose(vals[:2], [1 / np.sqrt(2)] * 2, atol=1e-8)
    np.testing.assert_allclose(vals[2:], 0.0, atol=1e-8)


def test_schmidt_spectrum_observable_ensemble():
    L, dt, steps = 3, 0.05, 2
    ham = Hamiltonian.ising(L, 1.0, 0.4)
    params = AnalogSimParams(
        observables=[Observable("schmidt_spectrum", [0, 1])],
        elapsed_time=dt * steps,
        dt=dt,
        max_bond_dim=8,
        svd_threshold=1e-13,
        random_seed=0,
    )
    res = Simulator().run([State(L, state="x+"), State(L)], ham, params, None)
    sp = res.schmidt_spectra[0]
    assert sp.shape == (2, 8, steps + 1)
    # t=0 product states: single Schmidt value 1
    np.testing.assert_allclose(np.sort(sp[:, :, 0], axis=1)[:, -1], 1.0, atol=1e-8)
    np.testing.assert_allclose(np.sort(sp[:, :, 0], axis=1)[:, :-1], 0.0, atol=1e-8)
