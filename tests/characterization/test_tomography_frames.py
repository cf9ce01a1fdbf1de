"""Dual-frame / CPTP contracts for the process-tensor tomography basis.

Mirrors the reference's tomography basis battery
(/root/reference/tests/characterization/memory/backends/tomography/
test_basis.py and test_process_tensors.py: biorthogonality, reconstruction
identity, CPTP encodings, predict contracts) with independent linear-algebra
oracles built in the test.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import Hamiltonian
from yaqs_tpu.characterization.memory.interventions import (
    MPIntervention,
    UnitaryIntervention,
)
from yaqs_tpu.characterization.memory.mpo_process_tensor import (
    build_process_tensor_mpo,
    choi_basis_and_duals,
    get_basis_states,
)
from yaqs_tpu.characterization.memory.process_tensor import build_process_tensor

RNG = np.random.default_rng(90817)


def random_unitary(n: int, rng) -> np.ndarray:
    z = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    q, r = np.linalg.qr(z)
    return q * (np.diag(r) / np.abs(np.diag(r)))


def random_cptp_choi(rng) -> np.ndarray:
    """Choi matrix (system-prep (x) meas^T convention of the frame) of a
    random qubit channel built from an explicit Kraus set."""
    # Stinespring: random isometry 2 -> 2*2
    u = random_unitary(4, rng)
    kraus = [u[2 * e : 2 * e + 2, :2] for e in range(2)]
    choi = np.zeros((4, 4), dtype=np.complex128)
    for k in kraus:
        # frame convention C = sum |p><p| (x) (|m><m|)^T for rank-1 MP pairs;
        # a general channel's frame-space Choi is sum_k (k (x) conj(k))
        # reshaped to the (out, in^T) kron layout
        choi += np.einsum("ca,eb->caeb", k, k.conj()).reshape(4, 4)
    return choi


# ---------------------------------------------------------------------------
# frame structure
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("basis", ["tetrahedral", "standard", "random"])
def test_dual_frame_biorthogonality(basis):
    """Tr(D_i^dag C_j) = delta_ij — the defining dual-frame property."""
    chois, pairs, duals, kets = choi_basis_and_duals(basis, seed=5)
    assert chois.shape == (16, 4, 4) and duals.shape == (16, 4, 4)
    assert len(pairs) == 16
    gram = np.array(
        [[np.trace(duals[i].conj().T @ chois[j]) for j in range(16)] for i in range(16)]
    )
    np.testing.assert_allclose(gram, np.eye(16), atol=1e-9)


@pytest.mark.parametrize("basis", ["tetrahedral", "standard", "random"])
def test_frame_is_informationally_complete(basis):
    chois, _, _, _ = choi_basis_and_duals(basis, seed=3)
    frame = np.column_stack([c.reshape(-1) for c in chois])
    assert np.linalg.matrix_rank(frame, tol=1e-8) == 16


@pytest.mark.parametrize("basis", ["tetrahedral", "standard", "random"])
def test_reconstruction_identity_random_cptp_choi(basis):
    """Expanding a random channel's Choi in the frame via the duals and
    re-summing the frame elements must reproduce it exactly."""
    chois, _, duals, _ = choi_basis_and_duals(basis, seed=11)
    target = random_cptp_choi(np.random.default_rng(2))
    coeffs = np.array([np.trace(d.conj().T @ target) for d in duals])
    rebuilt = np.tensordot(coeffs, chois, axes=(0, 0))
    np.testing.assert_allclose(rebuilt, target, atol=1e-9)


def test_basis_states_normalized_and_seeded():
    for basis in ("tetrahedral", "standard"):
        kets = get_basis_states(basis)
        assert len(kets) == 4
        for k in kets:
            np.testing.assert_allclose(np.linalg.norm(k), 1.0, atol=1e-12)
    a = get_basis_states("random", seed=7)
    b = get_basis_states("random", seed=7)
    c = get_basis_states("random", seed=8)
    np.testing.assert_array_equal(np.stack(a), np.stack(b))
    assert not np.allclose(np.stack(a), np.stack(c))
    for k in a:
        np.testing.assert_allclose(np.linalg.norm(k), 1.0, atol=1e-12)


def test_unknown_basis_rejected():
    with pytest.raises(ValueError, match="basis"):
        get_basis_states("hexagonal")


def test_tetrahedral_bloch_symmetry():
    """The tetrahedral kets' Bloch vectors have pairwise overlap |<a|b>|^2 =
    (1 - 1/3)/2 + 1/2 = 1/3 (regular tetrahedron)."""
    kets = get_basis_states("tetrahedral")
    for i in range(4):
        for j in range(i + 1, 4):
            ov = abs(np.vdot(kets[i], kets[j])) ** 2
            np.testing.assert_allclose(ov, 1.0 / 3.0, atol=1e-10)


# ---------------------------------------------------------------------------
# CPTP physicality of process-tensor predictions
# ---------------------------------------------------------------------------


def _unitary_sequence(k: int, seed: int) -> list[MPIntervention]:
    rng = np.random.default_rng(seed)
    return [UnitaryIntervention(random_unitary(2, rng)) for _ in range(k)]


def _mp_sequence(k: int, seed: int) -> list[MPIntervention]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(k):
        kets = [random_unitary(2, rng)[:, 0] for _ in range(2)]
        out.append(MPIntervention(meas=kets[0], prep=kets[1]))
    return out


@pytest.fixture(scope="module")
def pt_pair():
    ham = Hamiltonian.ising(2, 1.0, 0.7)
    k = 2
    dense = build_process_tensor(ham, num_interventions=k, tau=0.35)
    mpo = build_process_tensor_mpo(ham, num_interventions=k, tau=0.35)
    return dense, mpo


def test_unitary_probe_outputs_are_density_matrices(pt_pair):
    """Trace-preserving interventions: the predicted final system state has
    unit trace and is positive semidefinite (the comb is CPTP leg-wise)."""
    dense, mpo = pt_pair
    for pt in (dense, mpo):
        for seed in range(4):
            rho = np.asarray(pt.evaluate_probe(_unitary_sequence(2, seed)))
            np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-8)
            np.testing.assert_allclose(rho, rho.conj().T, atol=1e-9)
            evals = np.linalg.eigvalsh(rho)
            assert evals.min() > -1e-9


def test_mp_probe_outputs_are_subnormalized(pt_pair):
    """Measure-prepare probes return the unnormalized branch state whose
    trace is the sequence's Born weight in [0, 1]."""
    dense, mpo = pt_pair
    for pt in (dense, mpo):
        for seed in range(4):
            rho = np.asarray(pt.evaluate_probe(_mp_sequence(2, seed)))
            tr = np.trace(rho).real
            assert -1e-9 <= tr <= 1.0 + 1e-9
            evals = np.linalg.eigvalsh((rho + rho.conj().T) / 2)
            assert evals.min() > -1e-8


def test_mp_probe_weights_sum_to_one_over_complete_pvm(pt_pair):
    """Summing the branch weights over a complete projective measurement at
    the first slot (same re-preparation) must give probability 1."""
    dense, _ = pt_pair
    z0 = np.array([1, 0], dtype=np.complex128)
    z1 = np.array([0, 1], dtype=np.complex128)
    second = _unitary_sequence(1, 3)
    total = 0.0
    for m in (z0, z1):
        seq = [MPIntervention(meas=m, prep=z0), *second]
        total += np.trace(np.asarray(dense.evaluate_probe(seq))).real
    np.testing.assert_allclose(total, 1.0, atol=1e-8)


def test_evaluate_probe_length_mismatch_raises(pt_pair):
    dense, mpo = pt_pair
    for pt in (dense, mpo):
        with pytest.raises(ValueError, match="interventions"):
            pt.evaluate_probe(_unitary_sequence(3, 0))
        with pytest.raises(ValueError, match="interventions"):
            pt.evaluate_probe([])


def test_dense_and_mpo_agree_on_random_probes(pt_pair):
    dense, mpo = pt_pair
    for seed in range(3):
        seq = _mp_sequence(2, 100 + seed)
        np.testing.assert_allclose(
            np.asarray(dense.evaluate_probe(seq)),
            np.asarray(mpo.evaluate_probe(seq)),
            atol=1e-7,
        )


def test_identity_dynamics_process_tensor_is_markovian():
    """H=0 dynamics carries no memory: QMI across any cut is zero, and a
    unitary probe sequence returns the (unchanged) initial system state."""
    ham = Hamiltonian.ising(2, 0.0, 0.0)
    pt = build_process_tensor(ham, num_interventions=2, tau=0.5)
    assert abs(pt.qmi(1)) < 1e-8
    u = random_unitary(2, np.random.default_rng(4))
    rho = np.asarray(
        pt.evaluate_probe([UnitaryIntervention(u), UnitaryIntervention(np.eye(2, dtype=np.complex128))])
    )
    # initial system state |0><0| propagated through u then identity
    want = u @ np.array([[1, 0], [0, 0]], dtype=np.complex128) @ u.conj().T
    np.testing.assert_allclose(rho, want, atol=1e-8)


def test_qmi_scale_invariance_under_probe_convention(pt_pair):
    """QMI is a property of the normalized Choi state — rebuilding the dense
    PT from the MPO train (different internal scaling path) must give the
    same QMI."""
    dense, mpo = pt_pair
    np.testing.assert_allclose(mpo.to_dense().qmi(1), dense.qmi(1), atol=1e-6)
