"""MemoryCharacterizer facade edges (reference test_memory_characterizer.py).

Mirrors the remaining by-name gaps of the reference file on repo semantics:
process-tensor default cuts, QMI/CMI input guards, probe-set reuse across
calls, delay validation, and build->characterize composition.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import Hamiltonian, MemoryCharacterizer
from yaqs_tpu.characterization.memory.operational import sample_probes
from yaqs_tpu.characterization.memory.process_tensor import build_process_tensor

TAU = 0.3


@pytest.fixture(scope="module")
def ham():
    return Hamiltonian.ising(2, 1.0, 0.5)


@pytest.fixture(scope="module")
def pt(ham):
    return build_process_tensor(ham, num_interventions=3, tau=TAU)


@pytest.fixture()
def mc():
    return MemoryCharacterizer(preset="quick", n_pasts=4, n_futures=4)


def test_build_then_characterize_composes(ham, mc, pt):
    """build_process_tensor output feeds characterize directly (reference
    test_build_process_tensor_then_characterize)."""
    res = mc.characterize(pt, cut=1, seed=3)
    assert np.isfinite(res.by_cut[1].entropy)


def test_characterize_process_tensor_default_cut(mc, pt):
    """Omitting cut= on a process tensor characterizes ONE middle cut."""
    res = mc.characterize(pt)
    cuts = list(res.by_cut)
    assert len(cuts) == 1 and 1 <= cuts[0] <= pt.k


def test_characterize_multi_cut_returns_each(mc, ham):
    res = mc.characterize(ham, num_interventions=3, tau=TAU, cuts=[1, 2], seed=5)
    assert sorted(res.by_cut) == [1, 2]
    for c in (1, 2):
        assert np.isfinite(res.by_cut[c].entropy)


def test_compute_qmi_rejects_non_process_tensor(mc):
    with pytest.raises(TypeError, match="process tensor"):
        mc.compute_qmi("nonsense", cut=1)
    with pytest.raises(TypeError, match="process tensor"):
        mc.compute_cmi(object(), 0, 1)


def test_compute_qmi_and_cmi_from_process_tensor(mc, pt):
    qmi = mc.compute_qmi(pt, cut=1)
    cmi = mc.compute_cmi(pt, 1, 2)
    assert np.isfinite(qmi) and qmi >= -1e-10
    assert np.isfinite(cmi) and cmi >= -1e-10


def test_qmi_cmi_cut_bounds_validated(pt):
    """Out-of-range cuts raise a clear ValueError instead of an obscure
    reshape failure (found writing this battery)."""
    with pytest.raises(ValueError, match="cut"):
        pt.qmi(0)
    with pytest.raises(ValueError, match="cut"):
        pt.qmi(pt.k + 1)
    with pytest.raises(ValueError, match="cut1 < cut2"):
        pt.cmi(0, 1)
    with pytest.raises(ValueError, match="cut1 < cut2"):
        pt.cmi(2, 2)


def test_characterize_rejects_unknown_probe_kwargs(mc, ham):
    with pytest.raises(TypeError):
        mc.characterize(ham, num_interventions=2, tau=TAU, cut=1, bogus_kw=3)


def test_characterize_delay_rejects_negative(mc, ham):
    with pytest.raises(ValueError, match="delay"):
        mc.characterize(ham, num_interventions=2, tau=TAU, cut=1, delay=-1)


def test_characterize_delay_rejects_process_tensor(mc, pt):
    with pytest.raises(ValueError, match="Hamiltonian"):
        mc.characterize(pt, cut=1, delay=1)


def test_characterize_reuses_explicit_probe_set(mc, ham):
    """The same probe set drives bit-identical response matrices across
    calls (reference test_characterize_reuses_probe_set)."""
    probes = sample_probes(cut=1, num_interventions=2, n_pasts=4, n_futures=4,
                           rng=np.random.default_rng(7))
    a = mc.characterize(ham, num_interventions=2, tau=TAU, cut=1,
                        probe_set=probes)
    b = mc.characterize(ham, num_interventions=2, tau=TAU, cut=1,
                        probe_set=probes)
    np.testing.assert_array_equal(a.by_cut[1].response_matrix,
                                  b.by_cut[1].response_matrix)


def test_probe_set_rejected_for_multi_cut(mc, ham):
    probes = sample_probes(cut=1, num_interventions=2, n_pasts=4, n_futures=4,
                           rng=np.random.default_rng(8))
    with pytest.raises(ValueError, match="multiple cuts"):
        mc.characterize(ham, num_interventions=2, tau=TAU, cuts=[1, 2],
                        probe_set=probes)


def test_entropy_monotone_in_coupling(mc):
    """Stronger system-bath coupling cannot DECREASE operational memory
    (reference test_characterize_entropy_monotone_in_coupling; exact
    backend, shared probes)."""
    probes = sample_probes(cut=1, num_interventions=3, n_pasts=6, n_futures=6,
                           rng=np.random.default_rng(11))
    ents = []
    for j in (0.0, 0.5, 1.0):
        res = mc.characterize(Hamiltonian.ising(2, j, 0.8),
                              num_interventions=3, tau=TAU, cut=1,
                              probe_set=probes)
        ents.append(res.by_cut[1].entropy)
    assert ents[0] == pytest.approx(0.0, abs=1e-8)
    assert ents[2] >= ents[1] >= ents[0] - 1e-10


def test_markovian_at_zero_coupling_all_cuts(mc):
    res = mc.characterize(Hamiltonian.ising(3, 0.0, 0.7),
                          num_interventions=3, tau=TAU, cuts=[1, 2], seed=2)
    for c in (1, 2):
        assert res.by_cut[c].entropy == pytest.approx(0.0, abs=1e-8)


def test_predict_rejects_hamiltonian_target(mc, ham):
    """predict() is the backend protocol (process tensor / surrogate); a
    raw Hamiltonian has no evaluate_probes (reference
    test_predict_hamiltonian_removed)."""
    with pytest.raises((TypeError, AttributeError)):
        mc.predict(ham, [[]])
