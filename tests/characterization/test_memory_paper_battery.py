"""Paper-geometry memory characterization battery.

Mirrors the reference's paper-benchmark smoke tests and surrogate/predict
workflow contracts (/root/reference/tests/test_memory_characterizer.py:391-634:
paper geometry finite entropy, Markovian at zero coupling, coupling-monotone
entropy under a shared probe set, delay validation, surrogate train/predict
contracts) with independent oracles:

- at J=0 the system and bath never interact, so the operational cross-cut
  memory is EXACTLY zero under x64 (the centered response matrix vanishes
  to machine precision) — asserted at several cuts and with reset delays;
- entropy at a fixed probe set grows with the Ising coupling;
- the surrogate must reject probe sequences whose length differs from its
  training ``num_interventions`` (silently mis-positioned encodings
  otherwise), and dataset sampling validates its sizes.

Trend pins were measured on this implementation across seeds before being
asserted (seeds 0/1 hold with >=0.1 margin; seed-fragile reference trends —
integrated entropy vs bath size, effective-rank growth — are deliberately
not pinned).
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import Hamiltonian, MemoryCharacterizer
from yaqs_tpu.characterization.memory.exact import ExactBackend
from yaqs_tpu.characterization.memory.interventions import sample_intervention
from yaqs_tpu.characterization.memory.operational import (
    run_memory_characterization,
    sample_probes,
)
from yaqs_tpu.characterization.memory.process_tensor import build_process_tensor
from yaqs_tpu.characterization.memory.surrogate import (
    sample_dataset,
    train_surrogate,
)

K, CUT, N = 6, 3, 10
TAU = 0.4


def _characterize(ham, *, cut=CUT, k=K, n=N, probe_set=None, delay=0, seed=0,
                  tau=TAU):
    return run_memory_characterization(
        backend=ExactBackend(ham, tau),
        cut=cut,
        num_interventions=k,
        n_pasts=n,
        n_futures=n,
        rng=np.random.default_rng(seed),
        probe_set=probe_set,
        delay=delay,
    )


# ---------------------------------------------------------------- paper physics
def test_paper_geometry_finite_entropy():
    """L=2 Ising at unit coupling: finite entropy, at least one mode."""
    res = _characterize(Hamiltonian.ising(2, 1.0, 1.0))
    assert np.isfinite(res.entropy)
    assert res.entropy > 0.1
    assert res.modes >= 1
    assert res.singular_values[0] > 0


@pytest.mark.parametrize("cut,k", [(1, 3), (2, 3), (3, 6)])
def test_markovian_at_zero_coupling_any_cut(cut, k):
    """J=0: the bath never talks to the system, so the centered response is
    zero to machine precision regardless of where the temporal cut sits."""
    for length in (2, 3):
        res = _characterize(Hamiltonian.ising(length, 0.0, 0.9), cut=cut, k=k)
        assert res.entropy == pytest.approx(0.0, abs=1e-8)
        assert res.modes == 0
        assert np.linalg.norm(res.response_matrix) < 1e-10


def test_zero_coupling_stays_markovian_under_delay():
    """Reset slots cannot create memory in a decoupled process."""
    for delay in (1, 3):
        res = _characterize(Hamiltonian.ising(2, 0.0, 0.9), delay=delay)
        assert res.entropy == pytest.approx(0.0, abs=1e-8)


@pytest.mark.parametrize("seed", [0, 1])
def test_entropy_rises_with_coupling_at_shared_probes(seed):
    """With one probe set shared across targets, S_V(J) is ordered
    0 == J=0 < J=0.5 < J=2 (measured margins >= 0.1 at these seeds)."""
    probes = sample_probes(
        cut=CUT, num_interventions=K, n_pasts=N, n_futures=N,
        rng=np.random.default_rng(seed),
    )
    ent = {
        j: _characterize(Hamiltonian.ising(2, j, 1.0), probe_set=probes).entropy
        for j in (0.0, 0.5, 2.0)
    }
    assert ent[0.0] == pytest.approx(0.0, abs=1e-8)
    assert ent[0.5] > 0.1
    assert ent[2.0] > ent[0.5] + 0.1


def test_probe_reuse_via_prior_result_matches_explicit_probe_set():
    """MemoryCharacterizer accepts a prior single-cut result as probe_set=
    and reproduces the explicit-ProbeSet run bitwise."""
    mc = MemoryCharacterizer(preset="quick", n_pasts=N, n_futures=N)
    ham0 = Hamiltonian.ising(2, 0.0, 1.0)
    anchor = mc.characterize(ham0, num_interventions=K, tau=TAU, cut=CUT, seed=3)
    probes = anchor.by_cut[CUT].probe_set

    ham = Hamiltonian.ising(2, 1.5, 1.0)
    via_result = mc.characterize(
        ham, num_interventions=K, tau=TAU, cut=CUT, probe_set=anchor
    )
    via_probes = mc.characterize(
        ham, num_interventions=K, tau=TAU, cut=CUT, probe_set=probes
    )
    np.testing.assert_array_equal(
        via_result.by_cut[CUT].response_matrix,
        via_probes.by_cut[CUT].response_matrix,
    )
    assert via_result.entropy == via_probes.entropy


def test_spectrum_diagnostics_are_consistent():
    """Singular values sorted nonincreasing and nonnegative; the response
    matrix is the (n_pasts, 3 * n_futures) centered Bloch block."""
    res = _characterize(Hamiltonian.ising(2, 1.0, 1.0))
    s = np.asarray(res.singular_values)
    assert np.all(s >= 0)
    assert np.all(np.diff(s) <= 1e-12)
    assert res.response_matrix.shape == (N, 3 * N)
    assert 1 <= res.modes <= len(s)


# ------------------------------------------------------- workflow validation
def test_build_process_tensor_rejects_unknown_method():
    mc = MemoryCharacterizer(preset="quick")
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    with pytest.raises(ValueError, match="method"):
        mc.build_process_tensor(ham, num_interventions=2, tau=0.3, method="tensor")


def test_build_process_tensor_dense_requires_k_and_tau():
    mc = MemoryCharacterizer(preset="quick")
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    with pytest.raises(ValueError, match="requires"):
        mc.build_process_tensor(ham, tau=0.3)
    with pytest.raises(ValueError, match="requires"):
        mc.build_process_tensor(ham, num_interventions=2)


def test_predict_forwards_to_evaluate_probes():
    """predict(target, sequences) is the backend protocol, usable with a
    process tensor exactly as with a surrogate."""
    ham = Hamiltonian.ising(2, 0.8, 0.6)
    pt = build_process_tensor(ham, num_interventions=2, tau=0.3)
    rng = np.random.default_rng(5)
    seqs = [[sample_intervention(rng) for _ in range(2)] for _ in range(4)]
    mc = MemoryCharacterizer(preset="quick")
    np.testing.assert_array_equal(mc.predict(pt, seqs), pt.evaluate_probes(seqs))


# ------------------------------------------------------------- initial_state
def test_initial_state_vector_and_rho_agree():
    """A state vector and its rank-1 density matrix drive the same run up to
    the two normalization orders' rounding (reference initial_psi,
    memory_characterizer.py:516)."""
    ham = Hamiltonian.ising(2, 1.0, 1.0)
    dim = 4
    rng = np.random.default_rng(0)
    psi = rng.normal(size=dim) + 1j * rng.normal(size=dim)
    probes = sample_probes(cut=2, num_interventions=3, n_pasts=6, n_futures=6,
                           rng=np.random.default_rng(1))
    runs = []
    for init in (psi, np.outer(psi, psi.conj()) / np.vdot(psi, psi).real):
        backend = ExactBackend(ham, TAU, initial_state=init)
        runs.append(run_memory_characterization(
            backend=backend, cut=2, num_interventions=3, probe_set=probes))
    np.testing.assert_allclose(
        runs[0].response_matrix, runs[1].response_matrix, atol=1e-12
    )
    assert runs[0].entropy == pytest.approx(runs[1].entropy, abs=1e-10)


def test_initial_state_changes_the_characterization():
    """A different bath start changes the response (the probe grid sees the
    bath through the coupling), while J=0 stays exactly memoryless for ANY
    start — the interventions fully reset the decoupled system."""
    probes = sample_probes(cut=CUT, num_interventions=K, n_pasts=N, n_futures=N,
                           rng=np.random.default_rng(2))
    ham = Hamiltonian.ising(2, 1.0, 1.0)
    plus = np.ones(4, dtype=complex) / 2.0
    e_default = run_memory_characterization(
        backend=ExactBackend(ham, TAU), cut=CUT, num_interventions=K,
        probe_set=probes).entropy
    e_plus = run_memory_characterization(
        backend=ExactBackend(ham, TAU, initial_state=plus), cut=CUT,
        num_interventions=K, probe_set=probes).entropy
    assert abs(e_plus - e_default) > 1e-6

    decoupled = Hamiltonian.ising(2, 0.0, 0.9)
    e0 = run_memory_characterization(
        backend=ExactBackend(decoupled, TAU, initial_state=plus), cut=CUT,
        num_interventions=K, probe_set=probes).entropy
    assert e0 == pytest.approx(0.0, abs=1e-8)


def test_initial_state_validation():
    ham = Hamiltonian.ising(2, 1.0, 1.0)
    with pytest.raises(ValueError, match="shape"):
        ExactBackend(ham, TAU, initial_state=np.ones(3))
    with pytest.raises(ValueError, match="nonzero"):
        ExactBackend(ham, TAU, initial_state=np.zeros(4))
    with pytest.raises(ValueError, match="Hermitian"):
        ExactBackend(ham, TAU, initial_state=1j * np.eye(4))
    mc = MemoryCharacterizer(preset="quick", n_pasts=4, n_futures=4)
    pt = build_process_tensor(ham, num_interventions=2, tau=0.3)
    with pytest.raises(ValueError, match="Hamiltonian"):
        mc.characterize(pt, cut=1, initial_state=np.ones(4) / 2.0)
    with pytest.raises(ValueError, match="exact"):
        mc.characterize(ham, num_interventions=2, tau=0.3, cut=1,
                        backend="mps", initial_state=np.ones(4) / 2.0)


def test_characterize_forwards_initial_state():
    """The facade's initial_state= reaches the exact backend."""
    ham = Hamiltonian.ising(2, 1.0, 1.0)
    mc = MemoryCharacterizer(preset="quick", n_pasts=6, n_futures=6)
    plus = np.ones(4, dtype=complex) / 2.0
    a = mc.characterize(ham, num_interventions=3, tau=TAU, cut=2, seed=9,
                        initial_state=plus)
    probes = a.by_cut[2].probe_set
    direct = run_memory_characterization(
        backend=ExactBackend(ham, TAU, initial_state=plus), cut=2,
        num_interventions=3, probe_set=probes)
    np.testing.assert_array_equal(a.by_cut[2].response_matrix,
                                  direct.response_matrix)


def test_initial_state_rejects_indefinite_density_matrix():
    """Hermitian + positive trace is not enough: an indefinite matrix would
    silently drive an unphysical characterization (ADVICE r4)."""
    ham = Hamiltonian.ising(2, 1.0, 1.0)
    indefinite = np.diag([1.5, -0.5, 0.0, 0.0]).astype(complex)  # trace 1, Hermitian
    with pytest.raises(ValueError, match="positive semidefinite"):
        ExactBackend(ham, TAU, initial_state=indefinite)
    # tiny negative rounding noise still passes
    ok = np.diag([1.0, 1e-13 * -1, 0.0, 0.0]).astype(complex)
    ExactBackend(ham, TAU, initial_state=ok)


def test_characterize_accepts_initial_psi_alias():
    """Reference call sites use initial_psi=; it must be a drop-in alias
    (reference memory_characterizer.py:516)."""
    ham = Hamiltonian.ising(2, 1.0, 1.0)
    mc = MemoryCharacterizer(preset="quick", n_pasts=6, n_futures=6)
    plus = np.ones(4, dtype=complex) / 2.0
    a = mc.characterize(ham, num_interventions=3, tau=TAU, cut=2, seed=9,
                        initial_psi=plus)
    b = mc.characterize(ham, num_interventions=3, tau=TAU, cut=2, seed=9,
                        initial_state=plus)
    np.testing.assert_array_equal(a.by_cut[2].response_matrix,
                                  b.by_cut[2].response_matrix)
    with pytest.raises(ValueError, match="not both"):
        mc.characterize(ham, num_interventions=3, tau=TAU, cut=2, seed=9,
                        initial_state=plus, initial_psi=plus)


# -------------------------------------------------------- surrogate contracts
def test_sample_dataset_validates_sizes():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    with pytest.raises(ValueError, match="num_interventions"):
        sample_dataset(ham, num_interventions=0, tau=0.3)
    with pytest.raises(ValueError, match="num_sequences"):
        sample_dataset(ham, num_interventions=2, tau=0.3, num_sequences=0)
    with pytest.raises(ValueError, match="tau"):
        sample_dataset(ham, num_interventions=2, tau=float("nan"))


@pytest.fixture(scope="module")
def tiny_surrogate():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    data = sample_dataset(ham, num_interventions=2, tau=0.3, num_sequences=48,
                          seed=0)
    return train_surrogate(data, epochs=8, seed=0, d_model=16, n_heads=2,
                           n_layers=1)


def test_surrogate_rejects_mismatched_sequence_length(tiny_surrogate):
    rng = np.random.default_rng(0)
    bad = [[sample_intervention(rng) for _ in range(3)] for _ in range(2)]
    with pytest.raises(ValueError, match="trained for 2"):
        tiny_surrogate.evaluate_probes(bad)


def test_surrogate_predictions_are_near_physical(tiny_surrogate):
    """Even a barely-trained surrogate returns hermitized 2x2 predictions."""
    rng = np.random.default_rng(1)
    seqs = [[sample_intervention(rng) for _ in range(2)] for _ in range(5)]
    rhos = tiny_surrogate.evaluate_probes(seqs)
    assert rhos.shape == (5, 2, 2)
    np.testing.assert_allclose(rhos, np.conj(np.swapaxes(rhos, 1, 2)), atol=1e-12)


def test_characterize_surrogate_default_k_comes_from_surrogate(tiny_surrogate):
    """characterize(surrogate) without num_interventions probes at the
    surrogate's trained sequence length."""
    mc = MemoryCharacterizer(preset="quick", n_pasts=4, n_futures=4)
    res = mc.characterize(tiny_surrogate, cut=1, seed=0)
    assert res.num_interventions == 2
    assert np.isfinite(res.entropy)


def test_characterize_surrogate_wrong_k_is_rejected(tiny_surrogate):
    """An explicit num_interventions mismatching the surrogate's training
    length fails loudly instead of silently mis-encoding positions."""
    mc = MemoryCharacterizer(preset="quick", n_pasts=4, n_futures=4)
    with pytest.raises(ValueError, match="trained for 2"):
        mc.characterize(tiny_surrogate, num_interventions=3, cut=1, seed=0)
