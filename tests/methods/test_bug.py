"""BUG integrator vs dense evolution and vs TDVP."""

from __future__ import annotations

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.mpo_builders import heisenberg_mpo, ising_mpo, mpo_to_matrix
from yaqs_tpu.methods.bug import bug_step
from yaqs_tpu.methods.tdvp import TDVPConfig


def test_bug_matches_dense_tfim():
    L, chi, dt, steps = 5, 8, 0.05, 3
    w = ising_mpo(L, 1.0, 0.7)
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    cfg = TDVPConfig(krylov_dim=20, threshold=1e-12, max_bond_dim=chi)
    wj = jnp.asarray(w)
    for _ in range(steps):
        tensors = bug_step(tensors, wj, dt, cfg)
    psi = np.asarray(mps_ops.to_statevector(tensors))
    expected = scipy.linalg.expm(-1j * dt * steps * h) @ psi0
    fid = abs(np.vdot(psi, expected)) ** 2 / (np.vdot(psi, psi).real)
    assert fid > 1 - 1e-6, fid


def test_bug_matches_dense_heisenberg():
    L, chi, dt, steps = 4, 8, 0.04, 3
    w = heisenberg_mpo(L, 0.4, 0.6, 1.0, h=0.3)
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("Neel", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    cfg = TDVPConfig(krylov_dim=20, threshold=1e-12, max_bond_dim=chi)
    wj = jnp.asarray(w)
    for _ in range(steps):
        tensors = bug_step(tensors, wj, dt, cfg)
    psi = np.asarray(mps_ops.to_statevector(tensors))
    expected = scipy.linalg.expm(-1j * dt * steps * h) @ psi0
    np.testing.assert_allclose(psi, expected, atol=5e-4)
    np.testing.assert_allclose(np.vdot(psi, psi).real, 1.0, atol=1e-8)


def test_compress_roundtrip():
    rng = np.random.default_rng(0)
    L, chi = 5, 6
    raw = np.zeros((L, 2, chi, chi), dtype=np.complex128)
    dims = [1, 2, 4, 4, 2, 1]
    for i in range(L):
        raw[i, :, : dims[i], : dims[i + 1]] = rng.normal(
            size=(2, dims[i], dims[i + 1])
        ) + 1j * rng.normal(size=(2, dims[i], dims[i + 1]))
    t = jnp.asarray(raw)
    psi = np.asarray(mps_ops.to_statevector(t))
    out = mps_ops.compress(t, threshold=0.0, chi_out=4)
    assert out.shape == (L, 2, 4, 4)
    psi2 = np.asarray(mps_ops.to_statevector(out))
    np.testing.assert_allclose(psi2, psi, atol=1e-10)


def test_bug_single_site():
    """L=1: no internal bonds — bug_step must reduce to exact local
    evolution (reference test_bug.py:251 single-site case)."""
    L, chi, dt = 1, 4, 0.07
    w = ising_mpo(L, 0.0, 0.9)  # pure transverse field: h = -0.9 X
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("zeros", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    cfg = TDVPConfig(krylov_dim=8, threshold=1e-12, max_bond_dim=chi)
    out = bug_step(tensors, jnp.asarray(w), dt, cfg)
    psi = np.asarray(mps_ops.to_statevector(out))
    expected = scipy.linalg.expm(-1j * dt * h) @ psi0
    np.testing.assert_allclose(psi, expected, atol=1e-10)


def test_bug_norm_and_energy_at_truncation_cap():
    """Entanglement growth from a product state under a tight chi cap: the
    rank-revealing truncation keeps the state normalized and energy drifts
    only at the truncation scale (the BUG selling point — robust fixed-rank
    integration; reference bug.py module docs)."""
    L, chi, dt, steps = 8, 4, 0.05, 6
    w = ising_mpo(L, 1.0, 1.0)  # critical TFIM: fastest entanglement growth
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    e0 = np.real(np.vdot(psi0, h @ psi0))
    cfg = TDVPConfig(krylov_dim=15, threshold=1e-10, max_bond_dim=chi)
    wj = jnp.asarray(w)
    for _ in range(steps):
        tensors = bug_step(tensors, wj, dt, cfg)
        tensors, _ = mps_ops.normalize_canonical(tensors)
    psi = np.asarray(mps_ops.to_statevector(tensors))
    np.testing.assert_allclose(np.vdot(psi, psi).real, 1.0, atol=1e-8)
    e_t = np.real(np.vdot(psi, h @ psi))
    # unitary evolution conserves <H>; fixed-rank projection perturbs it only
    # at the truncation scale (loose bound — exact evolution would hit 0)
    assert abs(e_t - e0) < 0.05 * L, (e0, e_t)
    # and the state still tracks the exact evolution reasonably at chi=4
    expected = scipy.linalg.expm(-1j * dt * steps * h) @ psi0
    fid = abs(np.vdot(psi, expected)) ** 2
    assert fid > 0.98, fid


def test_bug_effective_ranks_respect_cap():
    """Post-step effective bond ranks never exceed max_bond_dim (the
    rank-revealing split enforces the cap, not just the padding)."""
    L, chi_pad, cap, dt = 6, 8, 3, 0.08
    w = ising_mpo(L, 1.0, 1.0)
    tensors = jnp.asarray(mps_ops.named_product_state("x+", L, chi_pad))
    cfg = TDVPConfig(krylov_dim=12, threshold=1e-12, max_bond_dim=cap)
    wj = jnp.asarray(w)
    for _ in range(4):
        tensors = bug_step(tensors, wj, dt, cfg)
    spectra, _ = mps_ops.bond_spectra(tensors)
    eff = np.sum(np.asarray(spectra) > 1e-9, axis=1)
    assert np.all(eff <= cap), eff
