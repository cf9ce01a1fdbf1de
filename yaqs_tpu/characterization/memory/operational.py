"""Operational memory workflow: split-cut probing -> response diagnostics.

Reference: mqt-yaqs characterization/memory/operational_memory/run.py +
samples.py + grid.py — sample past/future probe branches at a causal cut,
evaluate every (past, future) pair on a backend, center the Pauli response
over the past index, and read off the memory entropy / mode count from the
singular spectrum.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .interventions import (
    CARDINAL_KETS,
    MPIntervention,
    sample_intervention,
    sample_ket,
)
from .response import assemble_response_matrix, compute_spectrum, pauli_channels
from .results import CharacterizationResult, CutResult

__all__ = ["ProbeSet", "sample_probes", "run_memory_characterization"]


@dataclasses.dataclass
class ProbeSet:
    """Sampled probes at a fixed cut (reference samples.ProbeSet).

    ``past_pairs[i]``: the ``cut - 1`` interventions before the cut (MP pairs
    or unitaries, per ``intervention_style``);
    ``past_cut_meas[i]``: the measurement ket at the cut;
    ``future_prep_cut[j]``: the preparation ket at the cut;
    ``future_pairs[j]``: the ``k - cut`` interventions after the cut.
    """

    cut: int
    num_interventions: int
    past_pairs: list[list]
    past_cut_meas: list[np.ndarray]
    future_prep_cut: list[np.ndarray]
    future_pairs: list[list]

    @property
    def n_pasts(self) -> int:
        return len(self.past_pairs)

    @property
    def n_futures(self) -> int:
        return len(self.future_prep_cut)


def sample_probes(
    *,
    cut: int,
    num_interventions: int,
    n_pasts: int,
    n_futures: int,
    rng: np.random.Generator | None = None,
    intervention_style: str = "haar",
) -> ProbeSet:
    rng = rng or np.random.default_rng()
    if not 1 <= cut <= num_interventions:
        msg = f"cut must satisfy 1 <= cut <= {num_interventions}, got {cut}"
        raise ValueError(msg)
    past_pairs, past_cut_meas = [], []
    for _ in range(n_pasts):
        past_pairs.append(
            [sample_intervention(rng, intervention_style) for _ in range(cut - 1)]
        )
        past_cut_meas.append(sample_ket(rng, intervention_style))
    future_prep_cut, future_pairs = [], []
    for _ in range(n_futures):
        future_prep_cut.append(sample_ket(rng, intervention_style))
        future_pairs.append(
            [sample_intervention(rng, intervention_style) for _ in range(num_interventions - cut)]
        )
    return ProbeSet(cut, num_interventions, past_pairs, past_cut_meas, future_prep_cut, future_pairs)


def probe_grid_sequences(probe_set: ProbeSet, delay: int = 0):
    """Flatten the (past, future) grid into a Kraus array
    ``(n_p * n_f, k + delay, d, d)``: within-sequence interventions contribute
    their Kraus operator (rank-1 MP or full unitary), the cut slot is the
    rank-1 ``|prep_j><meas_i|`` pair, and ``delay`` inserts ``|0><0|``
    soft-reset slots right after the cut step (reference run.py delay
    semantics)."""
    k = probe_set.num_interventions
    d = probe_set.past_cut_meas[0].shape[0]
    zero = CARDINAL_KETS["0"][:d]
    reset = np.outer(zero, zero.conj())
    n_p, n_f = probe_set.n_pasts, probe_set.n_futures
    kraus = np.zeros((n_p * n_f, k + delay, d, d), dtype=np.complex128)
    for i in range(n_p):
        for j in range(n_f):
            row = i * n_f + j
            col = 0
            for iv in probe_set.past_pairs[i]:
                kraus[row, col] = iv.kraus
                col += 1
            kraus[row, col] = np.outer(
                probe_set.future_prep_cut[j], probe_set.past_cut_meas[i].conj()
            )
            col += 1
            for _ in range(delay):
                kraus[row, col] = reset
                col += 1
            for iv in probe_set.future_pairs[j]:
                kraus[row, col] = iv.kraus
                col += 1
    return kraus


def run_memory_characterization(
    *,
    backend,
    cut: int,
    num_interventions: int,
    n_pasts: int = 32,
    n_futures: int = 32,
    rng: np.random.Generator | None = None,
    probe_set: ProbeSet | None = None,
    intervention_style: str = "haar",
    delay: int = 0,
    use_weights: bool = False,
) -> CutResult:
    """Probe one causal cut; returns the per-cut diagnostics."""
    if delay < 0:
        msg = f"delay must be >= 0, got {delay}"
        raise ValueError(msg)
    if probe_set is None:
        probe_set = sample_probes(
            cut=cut,
            num_interventions=num_interventions,
            n_pasts=n_pasts,
            n_futures=n_futures,
            rng=rng,
            intervention_style=intervention_style,
        )
    elif probe_set.cut != cut or probe_set.num_interventions != num_interventions:
        msg = "supplied probe_set was built for a different cut/num_interventions"
        raise ValueError(msg)

    if hasattr(backend, "evaluate_kraus_sequences"):
        kraus = probe_grid_sequences(probe_set, delay=delay)
        rhos = backend.evaluate_kraus_sequences(kraus)
    else:  # process tensor / surrogate style: list-of-intervention probes
        if delay:
            msg = "delay requires a sequence-capable (exact) backend"
            raise ValueError(msg)
        sequences = []
        for i in range(probe_set.n_pasts):
            for j in range(probe_set.n_futures):
                seq = list(probe_set.past_pairs[i])
                seq.append(
                    MPIntervention(
                        meas=probe_set.past_cut_meas[i],
                        prep=probe_set.future_prep_cut[j],
                    )
                )
                seq.extend(probe_set.future_pairs[j])
                sequences.append(seq)
        rhos = backend.evaluate_probes(sequences)

    bloch, weights = pauli_channels(np.asarray(rhos))
    n_p, n_f = probe_set.n_pasts, probe_set.n_futures
    pauli_ij = bloch.reshape(n_p, n_f, 3)
    weights_ij = weights.reshape(n_p, n_f)
    m_raw, centered = assemble_response_matrix(
        pauli_ij, weights_ij if use_weights else None
    )
    spec = compute_spectrum(centered, reference_scale=np.linalg.norm(m_raw))
    return CutResult(
        cut=cut,
        entropy=spec["entropy"],
        modes=spec["modes"],
        singular_values=spec["singular_values"],
        response_matrix=centered,
        probe_set=probe_set,
        weights_ij=weights_ij,
    )


def characterize_cuts(
    *,
    backend,
    num_interventions: int,
    cuts: list[int],
    **kwargs,
) -> CharacterizationResult:
    by_cut = {
        cut: run_memory_characterization(
            backend=backend, cut=cut, num_interventions=num_interventions, **kwargs
        )
        for cut in cuts
    }
    return CharacterizationResult(num_interventions, by_cut)
