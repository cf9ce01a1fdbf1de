"""TDVP sweeps vs dense exact evolution (the core physics oracle).

Mirrors the reference's validation strategy (tests/core/methods/tdvp/): small
chains where the MPS bond dimension covers the full Hilbert space must
reproduce exp(-i H t) |psi> to high accuracy.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.mpo_builders import heisenberg_mpo, ising_mpo, mpo_to_matrix
from yaqs_tpu.methods.tdvp import TDVPConfig, sweep_1site, sweep_2site, tdvp_step


def dense_evolve(h, psi0, t):
    return scipy.linalg.expm(-1j * t * h) @ psi0


def fidelity(a, b):
    return abs(np.vdot(a, b)) ** 2 / (np.vdot(a, a).real * np.vdot(b, b).real)


def test_2tdvp_matches_dense_tfim():
    L, chi, dt, steps = 6, 16, 0.05, 4
    w = ising_mpo(L, 1.0, 0.7)
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    cfg = TDVPConfig(krylov_dim=25, trunc_mode="discarded_weight", threshold=1e-14, max_bond_dim=chi)
    wj = jnp.asarray(w)
    for _ in range(steps):
        tensors = sweep_2site(tensors, wj, dt, cfg)
    psi = np.asarray(mps_ops.to_statevector(tensors))
    expected = dense_evolve(h, psi0, dt * steps)
    assert fidelity(psi, expected) > 1 - 1e-10
    np.testing.assert_allclose(np.vdot(psi, psi).real, 1.0, atol=1e-10)
    # phase-sensitive comparison as well
    np.testing.assert_allclose(psi, expected, atol=1e-6)


def test_2tdvp_matches_dense_heisenberg():
    L, chi, dt, steps = 5, 8, 0.04, 3
    w = heisenberg_mpo(L, 0.4, 0.6, 1.0, h=0.3)
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("Neel", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    cfg = TDVPConfig(krylov_dim=25, threshold=1e-14, max_bond_dim=chi)
    wj = jnp.asarray(w)
    for _ in range(steps):
        tensors = sweep_2site(tensors, wj, dt, cfg)
    psi = np.asarray(mps_ops.to_statevector(tensors))
    expected = dense_evolve(h, psi0, dt * steps)
    # symmetric-sweep splitting error is O(dt^3) per step
    np.testing.assert_allclose(psi, expected, atol=5e-5)


def test_2tdvp_second_order_convergence():
    L, chi, t_final = 5, 8, 0.12
    w = heisenberg_mpo(L, 0.4, 0.6, 1.0, h=0.3)
    h = mpo_to_matrix(w)
    t0 = jnp.asarray(mps_ops.named_product_state("Neel", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(t0))
    expected = dense_evolve(h, psi0, t_final)
    wj = jnp.asarray(w)
    cfg = TDVPConfig(krylov_dim=25, threshold=1e-14, max_bond_dim=chi)
    errs = []
    for steps in (2, 4):
        tensors = t0
        for _ in range(steps):
            tensors = sweep_2site(tensors, wj, t_final / steps, cfg)
        errs.append(np.linalg.norm(np.asarray(mps_ops.to_statevector(tensors)) - expected))
    # halving dt must cut the error by ~2^2 (allow slack)
    assert errs[1] < errs[0] / 2.5


def test_1tdvp_matches_dense_at_full_bond():
    # Start from an entangled state at full bond dimension so 1TDVP's fixed
    # bond manifold contains the exact trajectory.
    L, chi, dt, steps = 4, 8, 0.05, 3
    w = ising_mpo(L, 1.0, 0.5)
    h = mpo_to_matrix(w)
    rng = np.random.default_rng(7)
    psi0 = rng.normal(size=2**L) + 1j * rng.normal(size=2**L)
    psi0 /= np.linalg.norm(psi0)
    # dense -> MPS via successive SVDs (site 0 least significant)
    tensors = np.zeros((L, 2, chi, chi), dtype=np.complex128)
    # reshape psi with site0 fastest: index (s3 s2 s1 s0) -> tensor train L->R
    amp = psi0.reshape([2] * L)  # axes (s3, s2, s1, s0)
    amp = amp.transpose(tuple(reversed(range(L))))  # (s0, s1, s2, s3)
    m = amp.reshape(1, -1)  # (bond0 * s0-slowest layout)
    left_dim = 1
    for i in range(L - 1):
        m = m.reshape(left_dim * 2, -1)
        u, s, vh = np.linalg.svd(m, full_matrices=False)
        k = min(len(s), chi)
        tensors[i, :, :left_dim, :k] = u[:, :k].reshape(left_dim, 2, -1).transpose(1, 0, 2)[
            :, :, :k
        ]
        m = (np.diag(s[:k]) @ vh[:k]).reshape(k, -1)
        left_dim = k
    tensors[L - 1, :, :left_dim, 0] = m.reshape(left_dim, 2).T
    tj = jnp.asarray(tensors)
    np.testing.assert_allclose(
        np.asarray(mps_ops.to_statevector(tj)), psi0, atol=1e-12
    )
    tj = mps_ops.canonicalize_right(tj)  # sweeps expect canonical form at site 0
    cfg = TDVPConfig(krylov_dim=25, mode="1site")
    wj = jnp.asarray(w)
    for _ in range(steps):
        tj = sweep_1site(tj, wj, dt, cfg)
    psi = np.asarray(mps_ops.to_statevector(tj))
    expected = dense_evolve(h, psi0, dt * steps)
    np.testing.assert_allclose(psi, expected, atol=1e-6)


def test_two_site_chain():
    L, chi, dt = 2, 4, 0.1
    w = ising_mpo(L, 1.0, 0.3)
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("zeros", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    cfg = TDVPConfig(krylov_dim=10, threshold=1e-14, max_bond_dim=chi)
    out = sweep_2site(tensors, jnp.asarray(w), dt, cfg)
    psi = np.asarray(mps_ops.to_statevector(out))
    np.testing.assert_allclose(psi, dense_evolve(h, psi0, dt), atol=1e-9)


def test_tdvp_step_substeps_improve_accuracy():
    L, chi = 5, 16
    w = ising_mpo(L, 1.0, 1.0)
    h = mpo_to_matrix(w)
    t0 = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(t0))
    expected = dense_evolve(h, psi0, 0.2)
    wj = jnp.asarray(w)
    errs = []
    for sweeps in (1, 2):
        cfg = TDVPConfig(krylov_dim=20, threshold=1e-14, max_bond_dim=chi, sweeps=sweeps)
        out = tdvp_step(t0, wj, 0.2, cfg)
        errs.append(np.linalg.norm(np.asarray(mps_ops.to_statevector(out)) - expected))
    assert errs[1] <= errs[0] * 1.05  # substeps never hurt
    assert errs[0] < 1e-4


def test_truncation_keeps_norm_reasonable():
    # chi smaller than needed: truncation loses weight but sweep stays stable.
    L, chi, dt = 8, 4, 0.05
    w = ising_mpo(L, 1.0, 1.2)
    tensors = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    cfg = TDVPConfig(krylov_dim=15, threshold=1e-10, max_bond_dim=chi)
    wj = jnp.asarray(w)
    for _ in range(5):
        tensors = sweep_2site(tensors, wj, dt, cfg)
    n2 = float(mps_ops.norm_squared(tensors))
    assert 0.9 < n2 <= 1.0 + 1e-9


def test_complex64_sweep_accuracy():
    """The TPU runs complex64; a c64 sweep must track the c128 sweep to
    single-precision accuracy (guards the dtype-polymorphic kernels)."""
    L, chi, dt = 6, 8, 0.05
    w = ising_mpo(L, 1.0, 0.7)
    t128 = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    t64 = t128.astype(jnp.complex64)
    cfg = TDVPConfig(krylov_dim=15, threshold=1e-6, max_bond_dim=chi)
    out128 = sweep_2site(t128, jnp.asarray(w), dt, cfg)
    out64 = sweep_2site(t64, jnp.asarray(w).astype(jnp.complex64), dt, cfg)
    psi128 = np.asarray(mps_ops.to_statevector(out128))
    psi64 = np.asarray(mps_ops.to_statevector(out64))
    fid = abs(np.vdot(psi64, psi128)) ** 2 / (
        np.vdot(psi64, psi64).real * np.vdot(psi128, psi128).real
    )
    assert fid > 1 - 1e-5, fid


def test_subspace_split_sweep_accuracy():
    """The SVD-free subspace split must track the exact-split sweep closely
    (fast TPU path; truncation is keep-all at the padded cap)."""
    L, chi, dt, steps = 6, 8, 0.05, 4
    w = ising_mpo(L, 1.0, 0.8)
    t0 = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    wj = jnp.asarray(w)
    exact_cfg = TDVPConfig(krylov_dim=20, threshold=1e-14, max_bond_dim=chi)
    fast_cfg = TDVPConfig(krylov_dim=20, threshold=1e-14, max_bond_dim=chi, svd_method="subspace")
    te, tf = t0, t0
    for _ in range(steps):
        te = sweep_2site(te, wj, dt, exact_cfg)
        tf = sweep_2site(tf, wj, dt, fast_cfg)
    pe = np.asarray(mps_ops.to_statevector(te))
    pf = np.asarray(mps_ops.to_statevector(tf))
    fid = abs(np.vdot(pe, pf)) ** 2 / (np.vdot(pe, pe).real * np.vdot(pf, pf).real)
    assert fid > 1 - 1e-8, fid
    # also against the dense oracle
    h = mpo_to_matrix(w)
    psi0 = np.asarray(mps_ops.to_statevector(t0))
    expected = dense_evolve(h, psi0, dt * steps)
    assert fidelity(pf, expected) > 1 - 1e-7


def test_dynamic_sweep_matches_dense_growth_phase():
    """Dynamic mode on a bond-growth trajectory (product state, uncapped):
    all bonds start unsaturated, so the sweep is pure 2-site and must track
    the dense oracle like the 2-site integrator."""
    from yaqs_tpu.methods.tdvp import sweep_dynamic

    L, chi, dt, steps = 5, 8, 0.05, 4
    w = ising_mpo(L, 1.0, 0.7)
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    cfg = TDVPConfig(
        krylov_dim=25, threshold=1e-14, max_bond_dim=chi, mode="dynamic"
    )
    wj = jnp.asarray(w)
    for _ in range(steps):
        tensors = sweep_dynamic(tensors, wj, dt, cfg)
        tensors, _ = mps_ops.normalize_canonical(tensors)
    psi = np.asarray(mps_ops.to_statevector(tensors))
    expected = dense_evolve(h, psi0, dt * steps)
    np.testing.assert_allclose(psi, expected, atol=5e-5)


def test_dynamic_sweep_saturated_uses_projector_update():
    """At a saturating cap the dynamic rule must stay accurate and keep the
    state normalized; the saturated branch (1-site projector update) is
    exercised because chi_needed exceeds the cap after a few steps."""
    from yaqs_tpu.methods.tdvp import sweep_dynamic

    L, chi, dt, steps = 6, 4, 0.05, 6  # full rank would need chi=8
    w = heisenberg_mpo(L, 0.4, 0.6, 1.0, h=0.3)
    h = mpo_to_matrix(w)
    tensors = jnp.asarray(mps_ops.named_product_state("Neel", L, chi))
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    cfg_dyn = TDVPConfig(
        krylov_dim=25, threshold=1e-10, max_bond_dim=chi, mode="dynamic"
    )
    cfg_2s = TDVPConfig(krylov_dim=25, threshold=1e-10, max_bond_dim=chi)
    t_dyn = t_2s = tensors
    for _ in range(steps):
        t_dyn = sweep_dynamic(t_dyn, jnp.asarray(w), dt, cfg_dyn)
        t_dyn, _ = mps_ops.normalize_canonical(t_dyn)
        t_2s = sweep_2site(t_2s, jnp.asarray(w), dt, cfg_2s)
    psi_dyn = np.asarray(mps_ops.to_statevector(t_dyn))
    psi_2s = np.asarray(mps_ops.to_statevector(t_2s))
    expected = dense_evolve(h, psi0, dt * steps)
    err_dyn = 1 - fidelity(psi_dyn, expected)
    err_2s = 1 - fidelity(psi_2s, expected)
    # the projector update at saturated bonds must not blow up the error
    # relative to capped 2-site truncation (both are O(truncation))
    assert err_dyn < 10 * max(err_2s, 1e-8), (err_dyn, err_2s)
    np.testing.assert_allclose(np.vdot(psi_dyn, psi_dyn).real, 1.0, atol=1e-8)


def test_1site_newton_shifts_match_qr():
    """canon_method="newton" replaces the 1-site sweep's Householder QR/LQ
    center shifts with Newton-Schulz polar shifts (the TPU fast path); both
    must produce the same evolved state to the polar iteration's accuracy
    budget (~1e-6 in x64, same as canonicalize_right's newton mode)."""
    L, chi, dt, steps = 6, 8, 0.05, 3
    w = ising_mpo(L, 1.0, 0.7)
    wj = jnp.asarray(w)
    t0 = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    # grow entanglement first so the 1-site shifts see generic tensors
    grow = TDVPConfig(krylov_dim=20, threshold=1e-14, max_bond_dim=chi)
    for _ in range(2):
        t0 = sweep_2site(t0, wj, dt, grow)
    t_qr = t_nw = t0
    for _ in range(steps):
        t_qr = sweep_1site(t_qr, wj, dt, TDVPConfig(krylov_dim=20, mode="1site"))
        t_nw = sweep_1site(
            t_nw, wj, dt, TDVPConfig(krylov_dim=20, mode="1site", canon_method="newton")
        )
    p_qr = np.asarray(mps_ops.to_statevector(t_qr))
    p_nw = np.asarray(mps_ops.to_statevector(t_nw))
    # ~600 polar shifts at ~1e-5 subspace error each accumulate to ~1e-7
    # infidelity (same budget as canonicalize_right's newton mode)
    assert fidelity(p_qr, p_nw) > 1 - 1e-6
    # and both still track the dense oracle from the common start
    h = mpo_to_matrix(w)
    expected = dense_evolve(h, np.asarray(mps_ops.to_statevector(t0)), dt * steps)
    assert fidelity(p_nw, expected) > 1 - 1e-6


def test_dynamic_newton_shifts_match_qr():
    """Same guard for the dynamic sweep's saturated-bond branch."""
    from yaqs_tpu.methods.tdvp import sweep_dynamic

    L, chi, dt, steps = 6, 4, 0.05, 5  # cap saturates -> 1-site branch runs
    w = heisenberg_mpo(L, 0.4, 0.6, 1.0, h=0.3)
    wj = jnp.asarray(w)
    t_qr = t_nw = jnp.asarray(mps_ops.named_product_state("Neel", L, chi))
    cfg_qr = TDVPConfig(krylov_dim=20, threshold=1e-10, max_bond_dim=chi, mode="dynamic")
    cfg_nw = TDVPConfig(
        krylov_dim=20, threshold=1e-10, max_bond_dim=chi, mode="dynamic",
        canon_method="newton",
    )
    for _ in range(steps):
        t_qr, _ = mps_ops.normalize_canonical(sweep_dynamic(t_qr, wj, dt, cfg_qr))
        t_nw, _ = mps_ops.normalize_canonical(sweep_dynamic(t_nw, wj, dt, cfg_nw))
    p_qr = np.asarray(mps_ops.to_statevector(t_qr))
    p_nw = np.asarray(mps_ops.to_statevector(t_nw))
    assert fidelity(p_qr, p_nw) > 1 - 1e-5


def test_dynamic_mode_via_tdvp_step_and_simulator_params():
    """mode='dynamic' must thread through tdvp_step (reference tdvp_mode
    semantics) and produce finite physical observables."""
    L, chi = 4, 4
    w = ising_mpo(L, 1.0, 0.5)
    cfg = TDVPConfig(krylov_dim=10, threshold=1e-10, max_bond_dim=chi, mode="dynamic")
    tensors = jnp.asarray(mps_ops.named_product_state("x+", L, chi))
    out = tdvp_step(tensors, jnp.asarray(w), 0.05, cfg)
    h = mpo_to_matrix(w)
    psi0 = np.asarray(mps_ops.to_statevector(tensors))
    psi = np.asarray(mps_ops.to_statevector(out))
    np.testing.assert_allclose(psi, dense_evolve(h, psi0, 0.05), atol=1e-6)
