"""Intervention sampling and encodings for memory characterization.

An intervention at a probe step is a *measure-prepare* (MP) pair: project the
system qubit onto an effect ket ``|m>`` (recording the branch weight) and
re-prepare ``|p>``; the ``haar`` style samples both kets Haar-randomly, while
``measure_prepare`` samples from the six cardinal states (reference
shared/interventions.py styles; the ``clifford`` style samples stabilizer
kets).

Choi features (32 reals) encode the MP map's Choi matrix
``C = |p><p| (x) (|m><m|)^T`` flattened Re/Im — the input representation for
surrogates and probe bookkeeping.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "MPIntervention",
    "sample_ket",
    "sample_intervention",
    "choi_features",
    "CARDINAL_KETS",
    "DEFAULT_INTERVENTION_STYLE",
]

DEFAULT_INTERVENTION_STYLE = "haar"

_S2 = 1 / np.sqrt(2)
CARDINAL_KETS = {
    "0": np.array([1, 0], dtype=np.complex128),
    "1": np.array([0, 1], dtype=np.complex128),
    "+": np.array([_S2, _S2], dtype=np.complex128),
    "-": np.array([_S2, -_S2], dtype=np.complex128),
    "+i": np.array([_S2, 1j * _S2], dtype=np.complex128),
    "-i": np.array([_S2, -1j * _S2], dtype=np.complex128),
}


@dataclasses.dataclass
class MPIntervention:
    """One measure-prepare step: effect ket ``meas``, preparation ket ``prep``."""

    meas: np.ndarray
    prep: np.ndarray

    def features(self) -> np.ndarray:
        return choi_features(self.meas, self.prep)


def sample_ket(rng: np.random.Generator, style: str = "haar") -> np.ndarray:
    if style == "haar":
        v = rng.normal(size=2) + 1j * rng.normal(size=2)
        return v / np.linalg.norm(v)
    if style in {"measure_prepare", "clifford"}:
        keys = list(CARDINAL_KETS)
        return CARDINAL_KETS[keys[rng.integers(len(keys))]].copy()
    msg = f"unknown intervention style {style!r}"
    raise ValueError(msg)


def sample_intervention(rng: np.random.Generator, style: str = DEFAULT_INTERVENTION_STYLE) -> MPIntervention:
    return MPIntervention(meas=sample_ket(rng, style), prep=sample_ket(rng, style))


def choi_features(meas: np.ndarray, prep: np.ndarray) -> np.ndarray:
    """32-real Choi encoding of the MP map ``rho -> <m|rho|m> |p><p|``."""
    c = np.kron(np.outer(prep, prep.conj()), np.outer(meas, meas.conj()).T)
    return np.concatenate([c.real.reshape(-1), c.imag.reshape(-1)]).astype(np.float32)
