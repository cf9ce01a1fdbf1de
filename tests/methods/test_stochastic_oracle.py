"""Stochastic jump process vs dense oracles.

Coverage model: reference tests/core/methods/test_stochastic_process.py
(610 LoC) — PDF normalization, per-channel weights, jump application per
channel kind, norm-deficit probability statistics — each assertion checked
against an independently coded dense statevector computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yaqs_tpu.analog.embedding import embed_one_site, embed_operator
from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.noise_model import NoiseModel, compile_noise
from yaqs_tpu.methods.dissipation import apply_dissipation
from yaqs_tpu.methods.stochastic import (
    channel_weights,
    channel_weights2,
    site_moment_matrices,
    stochastic_process,
)
from yaqs_tpu.methods.tdvp import TDVPConfig
from yaqs_tpu.models.operators import lowering, pauli_x, pauli_y, pauli_z

L, CHI = 4, 8


def _random_mps(seed, chi=CHI, length=L, norm=1.0):
    rng = np.random.default_rng(seed)
    t = mps_ops.named_product_state("random", length, chi, rng=rng)
    t, _ = mps_ops.normalize_canonical(jnp.asarray(t))
    t = np.asarray(t) * norm ** (1.0 / 1.0)
    # scale site 0 so total norm = `norm` (canonical-at-0)
    t[0] *= 1.0
    return jnp.asarray(t)


def _entangled_mps(seed, length=L, chi=CHI):
    """A genuinely entangled normalized state: random product evolved by a
    couple of random bond unitaries applied via dense -> exact MPS."""
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=2**length) + 1j * rng.normal(size=2**length)
    psi /= np.linalg.norm(psi)
    return psi


def _mps_from_state(psi, length=L, chi=CHI):
    """Exact dense -> padded MPS (chi >= 2^(L/2) keeps it exact)."""
    t = np.zeros((length, 2, chi, chi), dtype=np.complex128)
    # sequential SVD, site 0 least significant => reverse axes first
    a = psi.reshape([2] * length)
    a = a.transpose(list(reversed(range(length))))  # site0 axis first
    m = a.reshape(2, -1)
    left_dim = 1
    carry = m.reshape(1 * 2, -1)
    for i in range(length - 1):
        u, s, vh = np.linalg.svd(carry, full_matrices=False)
        k = min(len(s), chi)
        u, s, vh = u[:, :k], s[:k], vh[:k]
        t[i, :, :left_dim, :k] = u.reshape(left_dim, 2, -1).transpose(1, 0, 2)
        carry = (s[:, None] * vh).reshape(k * 2, -1) if i < length - 2 else (s[:, None] * vh)
        left_dim = k
    t[length - 1, :, :left_dim, :1] = carry.reshape(left_dim, 2, 1).transpose(1, 0, 2)
    # verify exactness of the conversion itself
    np.testing.assert_allclose(
        np.asarray(mps_ops.to_statevector(jnp.asarray(t))), psi, atol=1e-10
    )
    return jnp.asarray(t)


def test_site_moment_matrices_match_dense():
    """T_i[b,k] = <psi| (|b><k|)_i |psi> for an entangled state."""
    psi = _entangled_mps(0)
    t = _mps_from_state(psi)
    moments, n2 = site_moment_matrices(t)
    np.testing.assert_allclose(float(n2), 1.0, atol=1e-10)
    for i in range(L):
        for b in range(2):
            for k in range(2):
                op = np.zeros((2, 2), dtype=complex)
                op[b, k] = 1.0  # |b><k|
                want = np.vdot(psi, embed_one_site(op, i, L) @ psi)
                np.testing.assert_allclose(
                    complex(np.asarray(moments)[i, b, k]), want, atol=1e-9
                )


def test_channel_weights_match_dense_expectation():
    """w_k = dt gamma_k <psi| L_k^dag L_k |psi> for mixed named channels."""
    psi = _entangled_mps(1)
    t = _mps_from_state(psi)
    gammas = [0.1, 0.25, 0.05, 0.4]
    names = ["lowering", "x", "z", "y"]
    sites = [0, 1, 2, 3]
    nm = NoiseModel(
        [
            {"name": n, "sites": [s], "strength": g}
            for n, s, g in zip(names, sites, gammas)
        ]
    )
    cn = compile_noise(nm, L, 2)
    dt = 0.3
    w = np.asarray(channel_weights(t, cn, dt))
    mats = {"lowering": lowering, "x": pauli_x, "z": pauli_z, "y": pauli_y}
    for k, (n, s, g) in enumerate(zip(names, sites, gammas)):
        ldl = mats[n].conj().T @ mats[n]
        want = dt * g * np.real(np.vdot(psi, embed_one_site(ldl, s, L) @ psi))
        np.testing.assert_allclose(w[k], want, atol=1e-9)


def test_channel_weights_pdf_normalization_vs_norm_deficit():
    """After dissipation by dt, the norm deficit equals sum_k w_k to O(dt^2)
    (the TJM's PDF normalization identity; reference stochastic_process.py)."""
    psi = _entangled_mps(2)
    t = _mps_from_state(psi)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.2} for i in range(L)]
    )
    cn = compile_noise(nm, L, 2)
    for dt in (0.05, 0.025):
        diss = apply_dissipation(t, cn, dt)
        _, n2 = site_moment_matrices(diss)
        deficit = 1.0 - float(n2)
        w_sum = float(np.sum(np.asarray(channel_weights(t, cn, dt))))
        # deficit = w_sum + O(dt^2); halving dt must quarter the error
        assert abs(deficit - w_sum) < 2.0 * dt**2 * w_sum / dt, (dt, deficit, w_sum)
    d1 = abs(
        (1.0 - float(site_moment_matrices(apply_dissipation(t, cn, 0.05))[1]))
        - float(np.sum(np.asarray(channel_weights(t, cn, 0.05))))
    )
    d2 = abs(
        (1.0 - float(site_moment_matrices(apply_dissipation(t, cn, 0.025))[1]))
        - float(np.sum(np.asarray(channel_weights(t, cn, 0.025))))
    )
    assert d2 < d1 / 3.0  # second-order identity


def test_two_site_channel_weights_match_dense():
    """Adjacent two-site factored (crosstalk) channel weights vs dense."""
    psi = _entangled_mps(3)
    t = _mps_from_state(psi)
    nm = NoiseModel(
        [
            {
                "name": "corr",
                "sites": [1, 2],
                "strength": 0.3,
                "matrix": np.kron(lowering, lowering) + 0.2 * np.eye(4),
            }
        ]
    )
    cn = compile_noise(nm, L, 2)
    assert cn.ch2_gamma.shape[0] == 1
    dt = 0.2
    w = float(np.asarray(channel_weights2(t, cn, dt))[0])
    lmat = np.kron(lowering, lowering) + 0.2 * np.eye(4)
    # embedding convention: matrix rows are (site1, site2) with site1 most
    # significant inside the pair block; build the dense op via factors
    u, s, vh = np.linalg.svd(
        lmat.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(4, 4)
    )
    dense = np.zeros((2**L, 2**L), dtype=complex)
    for kk in range(len(s)):
        if s[kk] < 1e-14:
            continue
        a = (u[:, kk] * s[kk]).reshape(2, 2)
        b = vh[kk].reshape(2, 2)
        dense += embed_operator({1: a, 2: b}, L)
    ldl = dense.conj().T @ dense
    want = dt * 0.3 * np.real(np.vdot(psi, ldl @ psi))
    np.testing.assert_allclose(w, want, atol=1e-9)


def test_jump_application_per_channel():
    """Force each channel to fire and compare the post-jump state against the
    dense application of its jump operator (up to normalization/phase-free
    global norm)."""
    psi = _entangled_mps(4)
    t = _mps_from_state(psi)
    names = ["lowering", "x", "z"]
    sites = [0, 2, 3]
    nm = NoiseModel(
        [{"name": n, "sites": [s], "strength": 1.0} for n, s in zip(names, sites)]
    )
    cn = compile_noise(nm, L, 2)
    mats = {"lowering": lowering, "x": pauli_x, "z": pauli_z}
    from yaqs_tpu.methods.stochastic import _apply_channel

    for k, (n, s) in enumerate(zip(names, sites)):
        out = jax.jit(lambda tt, kk=k: _apply_channel(tt, cn, jnp.asarray(kk)))(t)
        got = np.asarray(mps_ops.to_statevector(out))
        want = embed_one_site(mats[n], s, L) @ psi
        got_n = got / np.linalg.norm(got)
        want_n = want / np.linalg.norm(want)
        # states may differ by the dropped global factor only
        np.testing.assert_allclose(
            abs(np.vdot(got_n, want_n)), 1.0, atol=1e-9, err_msg=f"{n}@{s}"
        )


def test_jump_probability_statistics():
    """The jump decision fires with probability = norm deficit: drive many
    keys through stochastic_process on a fixed sub-normalized state."""
    psi = _entangled_mps(5)
    t = _mps_from_state(psi)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.6} for i in range(L)]
    )
    cn = compile_noise(nm, L, 2)
    dt = 0.4
    diss = apply_dissipation(t, cn, dt)
    _, n2 = site_moment_matrices(diss)
    dp = 1.0 - float(n2)
    assert 0.05 < dp < 0.9  # the test needs a non-trivial probability

    n_keys = 4000
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i))(
        jnp.arange(n_keys)
    )
    _, jumped = jax.jit(
        jax.vmap(lambda k: stochastic_process(diss, cn, dt, k))
    )(keys)
    rate = float(np.asarray(jumped).mean())
    stderr = np.sqrt(dp * (1 - dp) / n_keys)
    assert abs(rate - dp) < 5 * stderr + 0.005, (rate, dp)


def test_jump_channel_selection_statistics():
    """Conditioned on jumping, channel k fires with probability w_k / sum w:
    compare empirical per-site jump signatures against the weights."""
    # state with site-dependent <n>: |1> on site 0, |+> on 1, |0> on 2
    length = 3
    vecs = {
        0: np.array([0, 1], dtype=complex),
        1: np.array([1, 1], dtype=complex) / np.sqrt(2),
        2: np.array([1, 0], dtype=complex),
    }
    psi = np.zeros(2**length, dtype=complex)
    for idx in range(2**length):
        amp = 1.0
        for s in range(length):
            amp *= vecs[s][(idx >> s) & 1]
        psi[idx] = amp
    t = _mps_from_state(psi, length=length, chi=4)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 1.0} for i in range(length)]
    )
    cn = compile_noise(nm, length, 2)
    dt = 0.25
    w = np.asarray(channel_weights(t, cn, dt))
    np.testing.assert_allclose(w, dt * np.array([1.0, 0.5, 0.0]), atol=1e-9)

    # after a lowering jump at site s, <n_s> = 0: identify the channel fired
    diss = apply_dissipation(t, cn, dt)
    n_keys = 3000
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(7), i))(
        jnp.arange(n_keys)
    )

    def probe(k):
        out, jumped = stochastic_process(diss, cn, dt, k)
        n_ops = jnp.stack([jnp.diag(jnp.array([0.0, 1.0], out.real.dtype))] * length)
        vals = mps_ops.site_expectations(out, n_ops.astype(out.dtype), jnp.arange(length))
        return jnp.real(vals), jumped

    vals, jumped = jax.jit(jax.vmap(probe))(keys)
    vals = np.asarray(vals)[np.asarray(jumped)]
    assert len(vals) > 100
    # channel 0 jump zeroes <n_0>; channel 1 jump zeroes <n_1>
    fired0 = np.sum(vals[:, 0] < 1e-6) / len(vals)
    frac0_want = w[0] / w.sum()
    stderr = np.sqrt(frac0_want * (1 - frac0_want) / len(vals))
    assert abs(fired0 - frac0_want) < 5 * stderr + 0.01, (fired0, frac0_want)


def test_dissipation_operator_matches_expm():
    """apply_dissipation applies exp(-dt/2 sum gamma L^dag L) exactly for
    one-site channels (eigendecomposition path) — dense oracle."""
    psi = _entangled_mps(6)
    t = _mps_from_state(psi)
    gammas = [0.3, 0.1, 0.5, 0.2]
    nm = NoiseModel(
        [
            {"name": "lowering", "sites": [i], "strength": g}
            for i, g in enumerate(gammas)
        ]
    )
    cn = compile_noise(nm, L, 2)
    dt = 0.37
    out = apply_dissipation(t, cn, dt)
    got = np.asarray(mps_ops.to_statevector(out))
    import scipy.linalg

    acc = np.zeros((2**L, 2**L), dtype=complex)
    for i, g in enumerate(gammas):
        ldl = lowering.conj().T @ lowering
        acc += g * embed_one_site(ldl, i, L)
    want = scipy.linalg.expm(-dt / 2 * acc) @ psi
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_stochastic_process_noiseless_is_normalize():
    t = _mps_from_state(_entangled_mps(7)) * 0.7
    out, jumped = stochastic_process(t, None, 0.1, jax.random.PRNGKey(0))
    assert not bool(jumped)
    np.testing.assert_allclose(
        float(mps_ops.norm_squared(out)), 1.0, atol=1e-10
    )


def test_stochastic_process_respects_truncation_config():
    """Two-site jumps split through the configured truncation policy."""
    psi = _entangled_mps(8)
    t = _mps_from_state(psi)
    nm = NoiseModel(
        [
            {
                "name": "corr",
                "sites": [1, 2],
                "strength": 50.0,  # force the jump with near-certainty
                "matrix": np.kron(lowering, lowering) + 0.4 * np.eye(4),
            }
        ]
    )
    cn = compile_noise(nm, L, 2)
    dt = 0.5
    diss = apply_dissipation(t, cn, dt, TDVPConfig(max_bond_dim=CHI))
    out, jumped = stochastic_process(
        diss, cn, dt, jax.random.PRNGKey(3), TDVPConfig(max_bond_dim=CHI)
    )
    assert bool(jumped)
    got = np.asarray(mps_ops.to_statevector(out))
    lmat = np.kron(lowering, lowering) + 0.4 * np.eye(4)
    u, s, vh = np.linalg.svd(
        lmat.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(4, 4)
    )
    dense = np.zeros((2**L, 2**L), dtype=complex)
    for kk in range(len(s)):
        a = (u[:, kk] * s[kk]).reshape(2, 2)
        b = vh[kk].reshape(2, 2)
        dense += embed_operator({1: a, 2: b}, L)
    # the jump applies to the DISSIPATED state
    psi_diss = np.asarray(mps_ops.to_statevector(diss))
    want = dense @ psi_diss
    got_n = got / np.linalg.norm(got)
    want_n = want / np.linalg.norm(want)
    np.testing.assert_allclose(abs(np.vdot(got_n, want_n)), 1.0, atol=1e-8)


def test_longrange_pauli_channel_weight_is_scalar():
    """Long-range Pauli (unitary-factored) channels satisfy L^dag L = I, so
    their PDF weight is gamma*dt*||psi||^2 (the reference's Pauli shortcut,
    stochastic_process.py:140-177)."""
    psi = _entangled_mps(7)
    t = _mps_from_state(psi)
    gamma, dt = 0.35, 0.2
    nm = NoiseModel(
        [{"name": "longrange_crosstalk_xy", "sites": [0, 3], "strength": gamma}]
    )
    cn = compile_noise(nm, L, 2)
    w = np.asarray(channel_weights(t, cn, dt))
    # normalized state: weight == gamma * dt exactly
    np.testing.assert_allclose(float(w.sum()), gamma * dt, atol=1e-9)


def test_longrange_pauli_jump_application_matches_dense():
    """Forcing the long-range factored channel applies X_0 Y_3 (dense oracle)."""
    psi = _entangled_mps(11)
    t = _mps_from_state(psi)
    nm = NoiseModel(
        [{"name": "longrange_crosstalk_xy", "sites": [0, 3], "strength": 1.0}]
    )
    cn = compile_noise(nm, L, 2)
    from yaqs_tpu.methods.stochastic import _apply_channel

    out = jax.jit(lambda tt: _apply_channel(tt, cn, jnp.asarray(0)))(t)
    got = np.asarray(mps_ops.to_statevector(out))
    want = embed_operator({0: pauli_x, 3: pauli_y}, L) @ psi
    got_n = got / np.linalg.norm(got)
    want_n = want / np.linalg.norm(want)
    np.testing.assert_allclose(abs(np.vdot(got_n, want_n)), 1.0, atol=1e-9)


def test_longrange_crosstalk_tjm_matches_lindblad_small():
    """End-to-end: 3-site TJM with a long-range ZX crosstalk channel agrees
    with the exact Lindblad evolution of the same model (ensemble mean)."""
    import scipy.linalg

    from yaqs_tpu import (
        AnalogSimParams,
        Hamiltonian,
        Observable,
        Simulator,
        State,
    )
    from yaqs_tpu.analog.lindblad import build_liouvillian

    length, gamma, dt, steps = 3, 0.4, 0.1, 5
    ham = Hamiltonian.ising(length, 1.0, 0.5)
    nm = NoiseModel(
        [{"name": "longrange_crosstalk_zx", "sites": [0, 2], "strength": gamma}]
    )
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(length)],
        elapsed_time=dt * steps,
        dt=dt,
        num_traj=600,
        max_bond_dim=8,
        svd_threshold=1e-12,
        random_seed=5,
    )
    res = Simulator().run(State(length, state="x+"), ham, params, nm)

    h = ham.ensure_matrix()
    jump = np.sqrt(gamma) * embed_operator({0: pauli_z, 2: pauli_x}, length)
    liou = build_liouvillian(h, [jump])
    prop = scipy.linalg.expm(liou * dt)
    psi0 = State(length, state="x+").to_vector()
    vec = np.outer(psi0, psi0.conj()).reshape(-1)
    want = np.zeros((length, steps + 1))
    for j in range(steps + 1):
        if j > 0:
            vec = prop @ vec
        rho = vec.reshape(2**length, 2**length)
        for i in range(length):
            want[i, j] = np.real(np.trace(embed_one_site(pauli_z, i, length) @ rho))
    # Monte-Carlo tolerance at 600 trajectories
    np.testing.assert_allclose(res.expectation_values, want, atol=0.08)
