"""Unit/oracle tests for the operational-memory internals.

Covers the probe sampling, probe-grid assembly, Pauli-channel extraction,
response-matrix centering, and spectrum diagnostics against closed-form
expectations (reference semantics: mqt-yaqs characterization/memory/
operational_memory/{samples,grid,response_matrix,results}.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.characterization.memory.interventions import (
    MPIntervention,
    UnitaryIntervention,
)
from yaqs_tpu.characterization.memory.operational import (
    ProbeSet,
    probe_grid_sequences,
    sample_probes,
)
from yaqs_tpu.characterization.memory.response import (
    assemble_response_matrix,
    compute_spectrum,
    pauli_channels,
)
from yaqs_tpu.characterization.memory.results import CharacterizationResult, CutResult


# ---------------------------------------------------------------- sampling
def test_sample_probes_shapes_and_counts():
    rng = np.random.default_rng(0)
    ps = sample_probes(
        cut=2, num_interventions=4, n_pasts=3, n_futures=5, rng=rng
    )
    assert ps.n_pasts == 3 and ps.n_futures == 5
    assert all(len(p) == 1 for p in ps.past_pairs)  # cut - 1 interventions
    assert all(len(f) == 2 for f in ps.future_pairs)  # k - cut interventions
    for ket in ps.past_cut_meas + ps.future_prep_cut:
        assert ket.shape == (2,)
        assert np.linalg.norm(ket) == pytest.approx(1.0, abs=1e-12)


@pytest.mark.parametrize("cut", [0, 5])
def test_sample_probes_cut_bounds(cut):
    with pytest.raises(ValueError, match="cut must satisfy"):
        sample_probes(cut=cut, num_interventions=4, n_pasts=1, n_futures=1)


def test_sample_probes_styles_produce_expected_intervention_types():
    rng = np.random.default_rng(1)
    for style, typ in [
        ("haar", UnitaryIntervention),
        ("measure_prepare", MPIntervention),
        ("clifford", UnitaryIntervention),
    ]:
        ps = sample_probes(
            cut=2, num_interventions=3, n_pasts=2, n_futures=2,
            rng=rng, intervention_style=style,
        )
        for seq in ps.past_pairs + ps.future_pairs:
            for iv in seq:
                assert isinstance(iv, typ), style


def test_sample_probes_reproducible_with_seeded_rng():
    a = sample_probes(cut=1, num_interventions=2, n_pasts=2, n_futures=2,
                      rng=np.random.default_rng(7))
    b = sample_probes(cut=1, num_interventions=2, n_pasts=2, n_futures=2,
                      rng=np.random.default_rng(7))
    np.testing.assert_allclose(a.past_cut_meas, b.past_cut_meas)
    np.testing.assert_allclose(a.future_prep_cut, b.future_prep_cut)


# ---------------------------------------------------------------- probe grid
def _tiny_probe_set(cut=2, k=3, n_p=2, n_f=2, seed=3):
    return sample_probes(cut=cut, num_interventions=k, n_pasts=n_p,
                         n_futures=n_f, rng=np.random.default_rng(seed))


def test_probe_grid_shape_and_cut_slot():
    ps = _tiny_probe_set()
    kraus = probe_grid_sequences(ps)
    assert kraus.shape == (4, 3, 2, 2)
    # The cut slot (index cut-1) must be the rank-1 |prep_j><meas_i| pair.
    for i in range(2):
        for j in range(2):
            slot = kraus[i * 2 + j, ps.cut - 1]
            expected = np.outer(ps.future_prep_cut[j], ps.past_cut_meas[i].conj())
            np.testing.assert_allclose(slot, expected, atol=1e-14)
            assert np.linalg.matrix_rank(slot) == 1


def test_probe_grid_delay_inserts_reset_slots():
    ps = _tiny_probe_set(cut=1, k=2)
    kraus = probe_grid_sequences(ps, delay=2)
    assert kraus.shape[1] == 4  # k + delay columns
    reset = np.zeros((2, 2), dtype=complex)
    reset[0, 0] = 1.0
    # The delay slots directly after the cut are |0><0| soft resets.
    np.testing.assert_allclose(kraus[:, 1], np.broadcast_to(reset, (4, 2, 2)), atol=1e-14)
    np.testing.assert_allclose(kraus[:, 2], np.broadcast_to(reset, (4, 2, 2)), atol=1e-14)


def test_probe_grid_row_ordering_is_past_major():
    ps = _tiny_probe_set(cut=1, k=1, n_p=3, n_f=2)
    kraus = probe_grid_sequences(ps)
    for i in range(3):
        for j in range(2):
            expected = np.outer(ps.future_prep_cut[j], ps.past_cut_meas[i].conj())
            np.testing.assert_allclose(kraus[i * 2 + j, 0], expected, atol=1e-14)


# ---------------------------------------------------------------- channels
def test_pauli_channels_bloch_vectors():
    # |0><0| -> z=+1; |+><+| -> x=+1; |+i><+i| -> y=+1.
    zero = np.array([[1, 0], [0, 0]], dtype=complex)
    plus = np.full((2, 2), 0.5, dtype=complex)
    plus_i = np.array([[0.5, -0.5j], [0.5j, 0.5]])
    vals, weights = pauli_channels(np.stack([zero, plus, plus_i]))
    np.testing.assert_allclose(weights, [1, 1, 1], atol=1e-14)
    np.testing.assert_allclose(vals[0], [0, 0, 1], atol=1e-14)
    np.testing.assert_allclose(vals[1], [1, 0, 0], atol=1e-14)
    np.testing.assert_allclose(vals[2], [0, 1, 0], atol=1e-14)


def test_pauli_channels_normalization_of_unnormalized_states():
    rho = 0.25 * np.array([[1, 0], [0, 0]], dtype=complex)  # weight 0.25
    vals, weights = pauli_channels(rho[None])
    assert weights[0] == pytest.approx(0.25)
    np.testing.assert_allclose(vals[0], [0, 0, 1], atol=1e-14)  # normalized
    vals_raw, _ = pauli_channels(rho[None], normalize=False)
    np.testing.assert_allclose(vals_raw[0], [0, 0, 0.25], atol=1e-14)


def test_pauli_channels_zero_weight_guard():
    vals, weights = pauli_channels(np.zeros((1, 2, 2), dtype=complex))
    assert np.all(np.isfinite(vals))
    assert weights[0] == pytest.approx(0.0)


# ---------------------------------------------------------------- response
def test_memoryless_process_centers_to_zero():
    # Final state independent of the past branch -> centered matrix vanishes.
    rng = np.random.default_rng(5)
    future_bloch = rng.normal(size=(4, 3))
    pauli_ij = np.broadcast_to(future_bloch[None], (3, 4, 3)).copy()
    raw, centered = assemble_response_matrix(pauli_ij)
    assert np.linalg.norm(raw) > 0
    np.testing.assert_allclose(centered, 0.0, atol=1e-12)
    spec = compute_spectrum(centered, reference_scale=np.linalg.norm(raw))
    assert spec["modes"] == 0
    assert spec["entropy"] == pytest.approx(0.0)


def test_rank_one_memory_gives_one_mode_zero_entropy():
    # Past-dependence through a single direction -> exactly one memory mode.
    past = np.array([1.0, -1.0, 0.5])
    future = np.array([0.2, 0.4, 0.6, 0.8])
    pauli_ij = np.einsum("i,j->ij", past, future).reshape(3, 4, 1)
    pauli_ij = np.repeat(pauli_ij, 3, axis=2)
    _, centered = assemble_response_matrix(pauli_ij)
    spec = compute_spectrum(centered)
    assert spec["modes"] == 1
    assert spec["entropy"] == pytest.approx(0.0, abs=1e-10)


def test_uniform_spectrum_entropy_log_n():
    m = np.diag([1.0, 1.0, 1.0])
    spec = compute_spectrum(m)
    assert spec["modes"] == 3
    assert spec["entropy"] == pytest.approx(np.log(3))


def test_weights_scale_rows():
    pauli_ij = np.ones((2, 2, 3))
    weights = np.array([[2.0, 2.0], [0.0, 0.0]])
    raw, _ = assemble_response_matrix(pauli_ij, weights)
    # Mean weight is 1 -> rows scaled by w/mean(w) = [2, 0].
    np.testing.assert_allclose(raw[0], 2.0)
    np.testing.assert_allclose(raw[1], 0.0)


# ---------------------------------------------------------------- results
def _cut_result(cut, entropy=0.1):
    return CutResult(cut=cut, entropy=entropy, modes=1,
                     singular_values=np.array([1.0]),
                     response_matrix=np.ones((1, 3)))


def test_result_merge_and_summary():
    a = CharacterizationResult(4, {1: _cut_result(1, 0.5)})
    b = CharacterizationResult(4, {2: _cut_result(2, 0.25)})
    merged = a.merge(b)
    assert sorted(merged.by_cut) == [1, 2]
    assert merged.entropy == pytest.approx(0.5)  # first cut
    text = merged.summary()
    assert "cut 1" in text and "cut 2" in text and "entropy=0.5000" in text


def test_result_merge_rejects_mismatched_intervention_counts():
    a = CharacterizationResult(4, {1: _cut_result(1)})
    b = CharacterizationResult(5, {2: _cut_result(2)})
    with pytest.raises(ValueError, match="cannot merge"):
        a.merge(b)


def test_probe_set_properties():
    ps = ProbeSet(cut=1, num_interventions=2, past_pairs=[[]],
                  past_cut_meas=[np.array([1.0, 0.0])],
                  future_prep_cut=[np.array([1.0, 0.0]), np.array([0.0, 1.0])],
                  future_pairs=[[], []])
    assert ps.n_pasts == 1
    assert ps.n_futures == 2
