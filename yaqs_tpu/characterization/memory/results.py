"""Memory characterization results.

Reference: mqt-yaqs characterization/memory/operational_memory/results.py —
per-cut entries (entropy, modes, singular values, probes), multi-cut merge,
and a text summary.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

__all__ = ["CutResult", "CharacterizationResult"]


@dataclasses.dataclass
class CutResult:
    cut: int
    entropy: float
    modes: int
    singular_values: np.ndarray
    response_matrix: np.ndarray
    probe_set: Any = None
    weights_ij: np.ndarray | None = None


@dataclasses.dataclass
class CharacterizationResult:
    num_interventions: int
    by_cut: dict[int, CutResult]

    def summary(self) -> str:
        lines = [f"Memory characterization ({self.num_interventions} interventions):"]
        for cut in sorted(self.by_cut):
            r = self.by_cut[cut]
            lines.append(
                f"  cut {cut}: entropy={r.entropy:.4f}, modes={r.modes}, "
                f"top singulars={np.round(r.singular_values[:4], 4).tolist()}"
            )
        return "\n".join(lines)

    @property
    def entropy(self) -> float:
        """Entropy at the single (or first) cut."""
        return self.by_cut[min(self.by_cut)].entropy

    def merge(self, other: CharacterizationResult) -> CharacterizationResult:
        if other.num_interventions != self.num_interventions:
            msg = "cannot merge results with different intervention counts"
            raise ValueError(msg)
        merged = dict(self.by_cut)
        merged.update(other.by_cut)
        return CharacterizationResult(self.num_interventions, merged)
