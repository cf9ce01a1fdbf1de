"""Memory characterization: exact backend, process tensor, QMI, operational
response diagnostics."""

from __future__ import annotations

import pytest

import numpy as np
import scipy.linalg

from yaqs_tpu import Hamiltonian, NoiseModel
from yaqs_tpu.characterization.memory.exact import ExactBackend
from yaqs_tpu.characterization.memory.interventions import MPIntervention, sample_intervention
from yaqs_tpu.characterization.memory.operational import sample_probes
from yaqs_tpu.characterization.memory.process_tensor import build_process_tensor
from yaqs_tpu.memory_characterizer import MemoryCharacterizer


def manual_sequence(h, tau, meas, prep, length):
    """Straight numpy oracle for one MP sequence (site 0 = system = LSB)."""
    u = scipy.linalg.expm(-1j * tau * h)
    dim = h.shape[0]
    env = dim // 2
    psi0 = np.zeros(dim, dtype=complex)
    psi0[0] = 1.0
    rho = np.outer(psi0, psi0.conj())
    for m, p in zip(meas, prep):
        rho = u @ rho @ u.conj().T
        r = rho.reshape(env, 2, env, 2)
        rho_env = np.einsum("s,esft,t->ef", m.conj(), r, p * 0 + m)
        rho = np.einsum("ef,s,t->esft", rho_env, p, p.conj()).reshape(dim, dim)
    rho = u @ rho @ u.conj().T
    return np.einsum("eset->st", rho.reshape(env, 2, env, 2))


def test_exact_backend_matches_manual():
    L, tau = 3, 0.3
    ham = Hamiltonian.ising(L, 1.0, 0.7)
    h = ham.ensure_matrix()
    rng = np.random.default_rng(0)
    k = 2
    meas = np.stack([rng.normal(size=2) + 1j * rng.normal(size=2) for _ in range(k)])
    meas /= np.linalg.norm(meas, axis=1, keepdims=True)
    prep = np.stack([rng.normal(size=2) + 1j * rng.normal(size=2) for _ in range(k)])
    prep /= np.linalg.norm(prep, axis=1, keepdims=True)
    backend = ExactBackend(ham, tau)
    got = backend.evaluate_sequences(meas[None], prep[None])[0]
    expected = manual_sequence(h, tau, meas, prep, L)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_process_tensor_matches_exact_backend():
    L, tau, k = 3, 0.25, 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    pt = build_process_tensor(ham, num_interventions=k, tau=tau)
    backend = ExactBackend(ham, tau)
    rng = np.random.default_rng(1)
    for _ in range(4):
        seq = [sample_intervention(rng) for _ in range(k)]
        kraus = np.stack([iv.kraus for iv in seq])[None]
        direct = backend.evaluate_kraus_sequences(kraus)[0]
        via_pt = pt.evaluate_probe(seq)
        np.testing.assert_allclose(via_pt, direct, atol=1e-10)


def test_choi_state_is_density_matrix():
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    pt = build_process_tensor(ham, num_interventions=2, tau=0.3)
    rho = pt.choi_state()
    np.testing.assert_allclose(rho, rho.conj().T, atol=1e-10)
    w = np.linalg.eigvalsh(rho)
    assert w.min() > -1e-10
    np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-10)


def test_qmi_zero_for_decoupled_system():
    # J=0: the system qubit (site 0) never talks to the environment.
    ham = Hamiltonian.pauli(3, two_body=[], one_body=[(-0.8, "X")])
    pt = build_process_tensor(ham, num_interventions=2, tau=0.4)
    assert abs(pt.qmi(1)) < 1e-8


def test_qmi_positive_for_coupled_system():
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    pt = build_process_tensor(ham, num_interventions=2, tau=1.0)
    assert pt.qmi(1) > 0.01, pt.qmi(1)
    assert MemoryCharacterizer().compute_qmi(pt) == pt.qmi(1)


def test_operational_memory_detects_memory():
    """Response entropy vanishes for a decoupled system and is positive for a
    coupled chain (the reference's headline diagnostic)."""
    tau, k = 0.4, 3
    mc = MemoryCharacterizer(preset="quick")

    ham_free = Hamiltonian.pauli(3, two_body=[], one_body=[(-0.8, "X")])
    res_free = mc.characterize(ham_free, num_interventions=k, tau=tau, seed=7)
    assert res_free.entropy < 1e-6, res_free.summary()

    ham_coupled = Hamiltonian.ising(3, 1.0, 0.5)
    res = mc.characterize(ham_coupled, num_interventions=k, tau=tau, seed=7)
    assert res.entropy > 0.05, res.summary()
    assert res.by_cut[(k + 1) // 2].modes >= 1


def test_characterize_process_tensor_target_agrees_with_exact():
    tau, k = 0.3, 2
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    mc = MemoryCharacterizer(preset="quick")
    pt = build_process_tensor(ham, num_interventions=k, tau=tau)
    probe_set = sample_probes(
        cut=1, num_interventions=k, n_pasts=6, n_futures=6, rng=np.random.default_rng(3)
    )
    res_pt = mc.characterize(pt, cut=1, probe_set=probe_set)
    res_ex = mc.characterize(ham, num_interventions=k, tau=tau, cut=1, probe_set=probe_set)
    np.testing.assert_allclose(
        res_pt.by_cut[1].response_matrix, res_ex.by_cut[1].response_matrix, atol=1e-8
    )


def test_noisy_backend_runs():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    nm = NoiseModel([{"name": "z", "sites": [1], "strength": 0.2}])
    backend = ExactBackend(ham, 0.3, nm)
    rng = np.random.default_rng(2)
    seq = [sample_intervention(rng) for _ in range(2)]
    kraus = np.stack([iv.kraus for iv in seq])[None]
    rho = backend.evaluate_kraus_sequences(kraus)[0]
    w = np.real(np.trace(rho))
    assert 0 < w <= 1 + 1e-9
    np.testing.assert_allclose(rho, rho.conj().T, atol=1e-10)


# ---------------------------------------------------------------------------
# MPO (tensor-train) process tensor
# ---------------------------------------------------------------------------


def test_mpo_process_tensor_matches_dense():
    from yaqs_tpu.characterization.memory.mpo_process_tensor import (
        build_process_tensor_mpo,
    )

    L, tau, k = 3, 0.25, 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    dense = build_process_tensor(ham, num_interventions=k, tau=tau)
    mpo = build_process_tensor_mpo(
        ham, num_interventions=k, tau=tau, max_bond_dim=None
    )
    # identical multilinear map
    np.testing.assert_allclose(mpo.to_dense().tensor, dense.tensor, atol=1e-9)
    # identical probe outputs
    rng = np.random.default_rng(3)
    for _ in range(4):
        seq = [sample_intervention(rng) for _ in range(k)]
        np.testing.assert_allclose(
            mpo.evaluate_probe(seq), dense.evaluate_probe(seq), atol=1e-10
        )
    # information measures agree
    np.testing.assert_allclose(mpo.qmi(1), dense.qmi(1), atol=1e-8)


def test_mpo_process_tensor_deep_and_truncated():
    """k = 4 legs would need 16^4 dense simulations; the train needs 16*chi
    per leg.  Probe outputs must match the direct sequence simulator."""
    from yaqs_tpu.characterization.memory.mpo_process_tensor import (
        build_process_tensor_mpo,
    )

    L, tau, k = 3, 0.3, 4
    ham = Hamiltonian.ising(L, 1.0, 0.6)
    mpo = build_process_tensor_mpo(ham, num_interventions=k, tau=tau, max_bond_dim=64)
    assert max(mpo.bond_dims) <= 64
    backend = ExactBackend(ham, tau)
    rng = np.random.default_rng(5)
    for _ in range(3):
        seq = [sample_intervention(rng) for _ in range(k)]
        kraus = np.stack([iv.kraus for iv in seq])[None]
        direct = backend.evaluate_kraus_sequences(kraus)[0]
        np.testing.assert_allclose(mpo.evaluate_probe(seq), direct, atol=1e-8)


def test_mpo_process_tensor_noisy_legs():
    """Unlike the reference's direct construction, noisy (Lindblad) legs are
    supported because branches are density matrices."""
    from yaqs_tpu.characterization.memory.mpo_process_tensor import (
        build_process_tensor_mpo,
    )

    L, tau, k = 2, 0.4, 2
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    nm = NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.15} for i in range(L)])
    dense = build_process_tensor(ham, num_interventions=k, tau=tau, noise_model=nm)
    mpo = build_process_tensor_mpo(
        ham, num_interventions=k, tau=tau, noise_model=nm, max_bond_dim=None
    )
    np.testing.assert_allclose(mpo.to_dense().tensor, dense.tensor, atol=1e-9)


def test_mpo_process_tensor_via_characterizer():
    mc = MemoryCharacterizer(preset="quick")
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    pt = mc.build_process_tensor(ham, num_interventions=2, tau=0.3, method="mpo")
    assert pt.k == 2
    # non-uniform schedule
    pt2 = mc.build_process_tensor(ham, timesteps=[0.1, 0.2, 0.3], method="mpo")
    assert pt2.k == 2
    assert pt2.timesteps == [0.1, 0.2, 0.3]
    # characterize() accepts the MPO form as a probe target
    res = mc.characterize(pt, seed=0)
    assert np.isfinite(res.entropy)


# ---------------------------------------------------------------------------
# MPS sequence backend (long chains)
# ---------------------------------------------------------------------------


def test_mps_backend_matches_exact_noiseless():
    from yaqs_tpu.characterization.memory.mps_backend import MPSBackend

    L, tau, k = 4, 0.3, 2
    ham = Hamiltonian.ising(L, 1.0, 0.7)
    rng = np.random.default_rng(2)
    batch = 3
    meas = rng.normal(size=(batch, k, 2)) + 1j * rng.normal(size=(batch, k, 2))
    meas /= np.linalg.norm(meas, axis=-1, keepdims=True)
    prep = rng.normal(size=(batch, k, 2)) + 1j * rng.normal(size=(batch, k, 2))
    prep /= np.linalg.norm(prep, axis=-1, keepdims=True)

    kraus = np.einsum("bks,bkt->bkst", prep, meas.conj())
    exact = ExactBackend(ham, tau).evaluate_kraus_sequences(kraus)
    mps = MPSBackend(ham, tau, chi=16, dt=0.05, krylov_dim=20).evaluate_sequences(
        meas, prep
    )
    np.testing.assert_allclose(mps, exact, atol=5e-4)


@pytest.mark.slow
def test_mps_backend_noisy_matches_lindblad():
    """Trajectory-averaged noisy sequences agree with the exact Lindblad
    backend within Monte-Carlo error."""
    from yaqs_tpu.characterization.memory.mps_backend import MPSBackend

    L, tau, k = 3, 0.4, 1
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    nm = NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.2} for i in range(L)])
    rng = np.random.default_rng(7)
    meas = rng.normal(size=(2, k, 2)) + 1j * rng.normal(size=(2, k, 2))
    meas /= np.linalg.norm(meas, axis=-1, keepdims=True)
    prep = rng.normal(size=(2, k, 2)) + 1j * rng.normal(size=(2, k, 2))
    prep /= np.linalg.norm(prep, axis=-1, keepdims=True)

    kraus = np.einsum("bks,bkt->bkst", prep, meas.conj())
    exact = ExactBackend(ham, tau, nm).evaluate_kraus_sequences(kraus)
    mps = MPSBackend(
        ham, tau, nm, chi=8, dt=0.05, num_traj=300, seed=11
    ).evaluate_kraus_sequences(kraus)
    np.testing.assert_allclose(mps, exact, atol=0.08)


def test_mps_backend_long_chain_via_characterizer():
    """L = 12 is far beyond the dense backend; the MPS route runs the full
    operational workflow."""
    ham = Hamiltonian.ising(12, 1.0, 1.0)
    mc = MemoryCharacterizer(preset="quick")
    res = mc.characterize(
        ham,
        num_interventions=2,
        tau=0.2,
        backend="mps",
        backend_options={"chi": 8, "dt": 0.1},
        seed=0,
    )
    assert np.isfinite(res.entropy)


# ---------------------------------------------------------------------------
# Intervention styles (haar / clifford unitaries, measure_prepare)
# ---------------------------------------------------------------------------


def test_clifford_group_enumeration():
    """24 distinct phase-canonical elements, unitary, closed under product
    (reference shared/interventions.py:182-240)."""
    from yaqs_tpu.characterization.memory.interventions import (
        enumerate_clifford_unitaries,
    )

    elems = enumerate_clifford_unitaries()
    assert len(elems) == 24
    eye = np.eye(2)
    for u in elems:
        np.testing.assert_allclose(u @ u.conj().T, eye, atol=1e-12)

    def canon(u):
        flat = u.reshape(-1)
        ref = flat[int(np.flatnonzero(np.abs(flat) > 1e-9)[0])]
        return u * np.exp(-1j * np.angle(ref))

    # closure: every pairwise product is again in the group (mod phase)
    for a in elems[:6]:
        for b in elems[:6]:
            c = canon(a @ b)
            assert any(np.allclose(c, w, atol=1e-10) for w in elems)


def test_intervention_styles_sample_expected_types():
    from yaqs_tpu.characterization.memory.interventions import (
        MPIntervention,
        UnitaryIntervention,
        enumerate_clifford_unitaries,
        sample_intervention,
    )

    rng = np.random.default_rng(0)
    cliffords = enumerate_clifford_unitaries()
    for _ in range(8):
        iv = sample_intervention(rng, "clifford")
        assert isinstance(iv, UnitaryIntervention)
        assert any(np.allclose(iv.u, c, atol=1e-12) for c in cliffords)
    iv = sample_intervention(rng, "haar")
    assert isinstance(iv, UnitaryIntervention)
    np.testing.assert_allclose(iv.u @ iv.u.conj().T, np.eye(2), atol=1e-12)
    iv = sample_intervention(rng, "measure_prepare")
    assert isinstance(iv, MPIntervention)
    # kraus of an MP pair is the rank-1 |p><m|
    np.testing.assert_allclose(iv.kraus, np.outer(iv.prep, iv.meas.conj()), atol=1e-14)
    import pytest

    with pytest.raises(ValueError, match="unknown intervention style"):
        sample_intervention(rng, "nope")


def test_unitary_intervention_exact_backend_physics():
    """A unitary intervention through the Kraus machinery must equal the
    direct dense conjugation, and preserve the trace (weight 1)."""
    from yaqs_tpu.characterization.memory.interventions import sample_intervention

    L, tau, k = 3, 0.3, 2
    ham = Hamiltonian.ising(L, 1.0, 0.7)
    rng = np.random.default_rng(4)
    seq = [sample_intervention(rng, "clifford") for _ in range(k)]
    kraus = np.stack([iv.kraus for iv in seq])[None]
    rho = ExactBackend(ham, tau).evaluate_kraus_sequences(kraus)[0]
    np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-10)  # TP map

    # dense oracle: evolve |0..0>, conjugate site 0 by U at each step
    import scipy.linalg

    from yaqs_tpu.analog.embedding import embed_one_site

    h = ham.ensure_matrix()
    u_seg = scipy.linalg.expm(-1j * tau * h)
    psi = np.zeros(2**L, dtype=complex)
    psi[0] = 1.0
    for iv in seq:
        psi = u_seg @ psi
        psi = embed_one_site(iv.u, 0, L) @ psi
    psi = u_seg @ psi
    full = np.outer(psi, psi.conj()).reshape(2 ** (L - 1), 2, 2 ** (L - 1), 2)
    rho_sys = np.einsum("eset->st", full)
    np.testing.assert_allclose(rho, rho_sys, atol=1e-10)


def test_memory_characterizer_clifford_style():
    mc = MemoryCharacterizer(preset="quick", intervention_style="clifford")
    res = mc.characterize(
        Hamiltonian.ising(2, 1.0, 0.5), num_interventions=2, tau=0.3, seed=3
    )
    assert np.isfinite(res.entropy)


# ---------------------------------------------------------------------------
# characterize() orchestration contracts (reference memory_characterizer.py:
# 101-127 probe-set coercion, :586-640 validation)
# ---------------------------------------------------------------------------


def test_characterize_reuses_probe_set_from_prior_result():
    import pytest

    tau, k = 0.3, 2
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    mc = MemoryCharacterizer(preset="quick")
    first = mc.characterize(ham, num_interventions=k, tau=tau, cut=1, seed=11)
    again = mc.characterize(ham, num_interventions=k, tau=tau, cut=1, probe_set=first)
    np.testing.assert_allclose(again.entropy, first.entropy, atol=1e-12)
    cut = next(iter(first.by_cut))
    np.testing.assert_allclose(
        again.by_cut[cut].response_matrix, first.by_cut[cut].response_matrix, atol=1e-12
    )
    with pytest.raises(TypeError):
        mc.characterize(ham, num_interventions=k, tau=tau, cut=1, probe_set=object())


def test_characterize_rejects_cut_and_cuts_together():
    import pytest

    mc = MemoryCharacterizer(preset="quick")
    with pytest.raises(ValueError, match="not both"):
        mc.characterize(
            Hamiltonian.ising(2, 1.0, 0.5),
            num_interventions=2,
            tau=0.3,
            cut=1,
            cuts=[1, 2],
        )


def test_characterize_rejects_empty_cuts():
    import pytest

    mc = MemoryCharacterizer(preset="quick")
    with pytest.raises(ValueError, match="nonempty"):
        mc.characterize(
            Hamiltonian.ising(2, 1.0, 0.5), num_interventions=2, tau=0.3, cuts=[]
        )


def test_characterize_rejects_probe_set_for_multi_cut():
    import pytest

    ham = Hamiltonian.ising(3, 1.0, 0.5)
    mc = MemoryCharacterizer(preset="quick")
    probe_set = sample_probes(
        cut=1, num_interventions=3, n_pasts=4, n_futures=4, rng=np.random.default_rng(0)
    )
    with pytest.raises(ValueError, match="multiple cuts"):
        mc.characterize(
            ham, num_interventions=3, tau=0.3, cuts=[1, 2], probe_set=probe_set
        )


def test_characterize_rejects_negative_delay_and_non_hamiltonian_delay():
    import pytest

    ham = Hamiltonian.ising(3, 1.0, 0.5)
    mc = MemoryCharacterizer(preset="quick")
    with pytest.raises(ValueError, match=">= 0"):
        mc.characterize(ham, num_interventions=2, tau=0.3, delay=-1)
    pt = build_process_tensor(ham, num_interventions=2, tau=0.3)
    with pytest.raises(ValueError, match="Hamiltonian"):
        mc.characterize(pt, delay=1)


def test_characterize_rejects_result_as_target():
    import pytest

    ham = Hamiltonian.ising(2, 1.0, 0.5)
    mc = MemoryCharacterizer(preset="quick")
    res = mc.characterize(ham, num_interventions=2, tau=0.3, seed=5)
    with pytest.raises(TypeError, match="probe_set="):
        mc.characterize(res)


def test_entropy_monotone_in_coupling():
    """Response entropy grows with the system-bath coupling (reference
    paper-geometry physics regression: entropy rises with J)."""
    tau, k = 0.4, 3
    mc = MemoryCharacterizer(preset="quick")
    entropies = []
    for j_coupling in (0.0, 0.4, 1.0):
        ham = Hamiltonian.pauli(
            3,
            two_body=[(j_coupling, "Z", "Z")],
            one_body=[(-0.8, "X")],
        )
        res = mc.characterize(ham, num_interventions=k, tau=tau, seed=7)
        entropies.append(res.entropy)
    assert entropies[0] < 1e-6
    assert entropies[0] < entropies[1] < entropies[2], entropies


def test_compute_qmi_cmi_reject_non_process_tensor():
    import pytest

    mc = MemoryCharacterizer(preset="quick")
    with pytest.raises(TypeError, match="process tensor"):
        mc.compute_qmi(Hamiltonian.ising(2, 1.0, 0.5))
    with pytest.raises(TypeError, match="process tensor"):
        mc.compute_cmi(object(), 1, 2)
