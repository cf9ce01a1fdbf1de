"""Run results: observables in user order, trajectories, aggregation.

Reference parity: mqt-yaqs core/data_structures/result.py (Result dataclass,
mean-over-trajectory aggregation, counts merging). On TPU the per-trajectory
buffers arrive as one batched device array; aggregation is a single mean.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

__all__ = ["Result"]


@dataclasses.dataclass
class Result:
    """Aggregated simulation output.

    Attributes:
        observables: the user-supplied observable list.
        expectation_values: ``(n_obs, n_times)`` mean over trajectories, rows
            in user order.
        trajectories: optional per-trajectory values ``(n_traj, n_obs, n_times)``.
        times: sampled time grid (analog) or None.
        num_trajectories: ensemble size that produced the averages.
        output_state: optional final state (first trajectory), engine-specific.
        measurements: optional per-shot bitstring arrays (digital).
        counts: optional aggregated counts dict (digital).
        multi_time_correlators: ``(n_pairs, n_times)`` complex two-time
            correlators ``<psi(t)|A U(t) B|psi(0)>`` (unitary ensembles).
        schmidt_spectra: per spectrum observable (keyed by user index), the
            ``(n_traj, chi, n_times)`` Schmidt values — per-trajectory arrays
            are kept, not averaged (reference SchmidtSpectrum aggregation).
        noise_model: the (sampled) noise model actually used.
        runtime_cost / max_bond / total_bond: per-timestep diagnostics curves.
    """

    observables: list[Any]
    expectation_values: np.ndarray | None = None
    trajectories: np.ndarray | None = None
    times: np.ndarray | None = None
    num_trajectories: int = 0
    output_state: Any = None
    measurements: Any = None
    counts: dict[str, int] | None = None
    noise_model: Any = None
    multi_time_correlators: np.ndarray | None = None
    schmidt_spectra: dict[int, np.ndarray] | None = None
    runtime_cost: np.ndarray | None = None
    max_bond: np.ndarray | None = None
    total_bond: np.ndarray | None = None
    elapsed_wall_time: float | None = None

    @property
    def multi_time_results(self) -> np.ndarray | None:
        """Reference field-name parity (result.py:180) for the two-time
        correlator matrix; this build stores it as ``multi_time_correlators``."""
        return self.multi_time_correlators

    @property
    def multi_time_times(self) -> np.ndarray | None:
        """Time grid of the multi-time correlators (reference result.py:179)."""
        return None if self.multi_time_correlators is None else self.times

    def observable(self, index_or_name) -> np.ndarray:
        """Expectation trajectory for one observable (by user index).

        Schmidt-spectrum observables return their ``(n_traj, chi, n_times)``
        spectra array (reference semantics: spectra are per-trajectory
        arrays, concatenated rather than averaged —
        simulation_parameters.py aggregate_trajectories)."""
        if self.schmidt_spectra and index_or_name in self.schmidt_spectra:
            return self.schmidt_spectra[index_or_name]
        assert self.expectation_values is not None
        return self.expectation_values[index_or_name]

    @staticmethod
    def aggregate(per_traj: np.ndarray) -> np.ndarray:
        """Mean over the leading trajectory axis."""
        return np.mean(per_traj, axis=0)
