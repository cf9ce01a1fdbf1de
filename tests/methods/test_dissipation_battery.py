"""Dissipative half-step battery vs dense exp(-dt/2 sum gamma L^dag L).

Mirrors the reference's tests/core/methods/test_dissipation.py contracts on
the fixed-shape engine: one-site batched application, adjacent two-site
(merged-pair) dissipators, long-range Pauli crosstalk factorization,
order-independence among commuting dissipators, norm-decay bookkeeping
(deficit = jump probability), and canonical-form restoration.  Oracle: dense
matrix exponential on the statevector.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.noise_model import NoiseModel, compile_noise
from yaqs_tpu.methods.dissipation import apply_dissipation, dissipation_operators
from yaqs_tpu.models.operators import PAULI, lowering


def _dense_generator(processes, L, d=2):
    """sum_k gamma_k (L_k^dag L_k) embedded densely."""
    dim = d**L
    g = np.zeros((dim, dim), dtype=complex)
    for p in processes:
        nm = NoiseModel([p])
        proc = nm.processes[0]
        sites = proc["sites"]
        gamma = proc["strength"]
        if len(sites) == 1:
            op = proc.get("matrix")
            if op is None:
                op = {"z": PAULI["Z"], "x": PAULI["X"], "lowering": lowering}[proc["name"]]
            full = np.ones((1, 1))
            # to_statevector convention: site 0 least significant
            for s in range(L - 1, -1, -1):
                full = np.kron(full, op if s == sites[0] else np.eye(d))
        else:
            mats = {}
            if "matrix" in proc and proc["matrix"] is not None:
                m4 = np.asarray(proc["matrix"]).reshape(d, d, d, d)
            else:
                fac = proc["factors"]
                m4 = np.einsum("ab,cd->acbd", fac[0], fac[1])
            # embed two-site operator on (lo, hi)
            lo, hi = sorted(sites)
            full = np.zeros((dim, dim), dtype=complex)
            for a in range(d):
                for b in range(d):
                    for c in range(d):
                        for e in range(d):
                            amp = m4[a, c, b, e]
                            if amp == 0:
                                continue
                            pa = np.ones((1, 1))
                            for s in range(L - 1, -1, -1):
                                if s == lo:
                                    ei = np.zeros((d, d)); ei[a, b] = 1
                                    pa = np.kron(pa, ei)
                                elif s == hi:
                                    ei = np.zeros((d, d)); ei[c, e] = 1
                                    pa = np.kron(pa, ei)
                                else:
                                    pa = np.kron(pa, np.eye(d))
                            full += amp * pa
        g += gamma * (full.conj().T @ full)
    return g


def _random_mps(L, chi, seed=0):
    rng = np.random.default_rng(seed)
    t = mps_ops.named_product_state("x+", L, chi).astype(np.complex128)
    # entangle lightly: random two-site rotations via dense route is overkill;
    # perturb and recanonicalize instead
    t = np.asarray(t) + 0.1 * (
        rng.standard_normal(t.shape) + 1j * rng.standard_normal(t.shape)
    ) * (np.abs(np.asarray(t)) > 0)
    t = jnp.asarray(t)
    t = mps_ops.canonicalize_right(t)
    t, _ = mps_ops.normalize_canonical(t)
    return t


def _to_vec(t):
    return np.asarray(mps_ops.to_statevector(jnp.asarray(t)))


def _check_vs_dense(processes, L, dt=0.3, chi=8, seed=3, atol=1e-8):
    from yaqs_tpu.methods.tdvp import TDVPConfig

    tensors = _random_mps(L, chi, seed)
    psi0 = _to_vec(tensors)
    noise = compile_noise(NoiseModel(processes), L, 2)
    trunc = TDVPConfig(krylov_dim=4, threshold=1e-12, max_bond_dim=chi)
    out = apply_dissipation(tensors, noise, dt, trunc)
    psi1 = _to_vec(out)
    expected = sla.expm(-0.5 * dt * _dense_generator(processes, L)) @ psi0
    np.testing.assert_allclose(psi1, expected, atol=atol)
    return out, psi1, expected


def test_one_site_dissipation_matches_dense():
    _check_vs_dense(
        [{"name": "lowering", "sites": [i], "strength": 0.2 + 0.1 * i} for i in range(4)],
        L=4,
    )


def test_one_site_mixed_channels_match_dense():
    _check_vs_dense(
        [{"name": "z", "sites": [0], "strength": 0.3},
         {"name": "lowering", "sites": [1], "strength": 0.5},
         {"name": "x", "sites": [2], "strength": 0.1}],
        L=3,
    )


def test_adjacent_two_site_dissipator_matches_dense():
    m = np.kron(PAULI["X"], PAULI["Y"]) + 0.3 * np.kron(lowering, lowering)
    _check_vs_dense(
        [{"name": "pair", "sites": [1, 2], "strength": 0.4, "matrix": m}],
        L=4, atol=1e-7,
    )


def test_longrange_pauli_crosstalk_matches_dense():
    _check_vs_dense(
        [{"name": "longrange_crosstalk_xy", "sites": [0, 3], "strength": 0.25}],
        L=4, atol=1e-7,
    )


def test_dissipation_norm_deficit_is_jump_probability():
    """After dissipation the squared-norm deficit equals the first-order
    total jump weight (TJM bookkeeping: the state is intentionally left
    unnormalized)."""
    L, dt = 3, 1e-3
    procs = [{"name": "lowering", "sites": [i], "strength": 0.4} for i in range(L)]
    tensors = _random_mps(L, 8, seed=5)
    psi0 = _to_vec(tensors)
    noise = compile_noise(NoiseModel(procs), L, 2)
    out = apply_dissipation(tensors, noise, dt)
    norm2 = float(np.vdot(_to_vec(out), _to_vec(out)).real)
    g = _dense_generator(procs, L)
    expected_deficit = dt * float(np.vdot(psi0, g @ psi0).real)
    assert abs((1.0 - norm2) - expected_deficit) < 5e-2 * expected_deficit


def test_dissipation_order_independent():
    """Commuting one-site dissipators: applying channels together equals
    any sequential order (reference order-independence contract)."""
    L = 3
    pa = {"name": "lowering", "sites": [0], "strength": 0.3}
    pb = {"name": "z", "sites": [2], "strength": 0.7}
    t = _random_mps(L, 8, seed=7)
    na = compile_noise(NoiseModel([pa]), L, 2)
    nb = compile_noise(NoiseModel([pb]), L, 2)
    nab = compile_noise(NoiseModel([pa, pb]), L, 2)
    joint = _to_vec(apply_dissipation(t, nab, 0.4))
    seq = _to_vec(apply_dissipation(apply_dissipation(t, na, 0.4), nb, 0.4))
    seq2 = _to_vec(apply_dissipation(apply_dissipation(t, nb, 0.4), na, 0.4))
    np.testing.assert_allclose(joint, seq, atol=1e-9)
    np.testing.assert_allclose(seq, seq2, atol=1e-9)


def test_dissipation_leaves_gauge_to_caller():
    """Design deviation from the reference (documented): the output is NOT
    recanonicalized — the stochastic process computes jump weights
    gauge-free and renormalization restores the canonical form, saving a
    QR sweep per call.  The STATE must still be exact (checked vs dense
    above); here we pin that a follow-up canonicalize+normalize restores a
    unit-norm canonical-at-0 state."""
    L = 4
    procs = [{"name": "lowering", "sites": [i], "strength": 0.2} for i in range(L)]
    t = _random_mps(L, 8, seed=9)
    noise = compile_noise(NoiseModel(procs), L, 2)
    out = apply_dissipation(t, noise, 0.3)
    vec = _to_vec(out)
    canon, prev = mps_ops.normalize_canonical(mps_ops.canonicalize_right(out))
    np.testing.assert_allclose(float(prev), np.linalg.norm(vec), rtol=1e-10)
    np.testing.assert_allclose(
        _to_vec(canon), vec / np.linalg.norm(vec), atol=1e-10
    )


def test_zero_strength_dissipation_is_identity():
    L = 3
    t = _random_mps(L, 8, seed=11)
    noise = compile_noise(
        NoiseModel([{"name": "lowering", "sites": [0], "strength": 0.0}]), L, 2
    )
    out = apply_dissipation(t, noise, 0.5)
    np.testing.assert_allclose(_to_vec(out), _to_vec(t), atol=1e-12)


def test_dissipation_operators_shapes_and_unitarity_limit():
    """dt -> 0 limit: the per-site operators approach the identity."""
    L = 4
    noise = compile_noise(
        NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.5} for i in range(L)]),
        L, 2,
    )
    ops = np.asarray(dissipation_operators(noise, 0.0))
    assert ops.shape == (L, 2, 2)
    for i in range(L):
        np.testing.assert_allclose(ops[i], np.eye(2), atol=1e-12)
