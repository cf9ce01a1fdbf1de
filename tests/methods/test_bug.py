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
