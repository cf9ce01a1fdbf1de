"""Intervention sampling and encodings for memory characterization.

A within-sequence intervention at a probe step is a linear map applied to the
system qubit, carried as a single Kraus operator ``K`` (``rho -> K rho K^dag``,
branch weight = trace):

- ``measure_prepare``: rank-1 measure-prepare ``K = |p><m|`` with kets sampled
  from the six cardinal states (reference shared/interventions.py MP style);
- ``haar``: a Haar-random single-qubit unitary (reference
  shared/interventions.py:162-178 ``_sample_random_unitary``);
- ``clifford``: a uniformly random element of the 24-element single-qubit
  Clifford group (reference shared/interventions.py:182-240
  ``enumerate_clifford_unitaries``).

The causal-cut slot stays ket-based in every style (reference
operational_memory/samples.py cut_measurement / cut_preparation steps): the
past branch ends in a measurement ket, the future branch starts with a
preparation ket.

Choi features (32 reals) encode the step map's Choi matrix
``J[(c,a),(e,b)] = K[c,a] conj(K[e,b])`` flattened Re/Im — the input
representation for surrogates and probe bookkeeping.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np

__all__ = [
    "MPIntervention",
    "UnitaryIntervention",
    "enumerate_clifford_unitaries",
    "sample_ket",
    "sample_intervention",
    "choi_features",
    "kraus_choi_features",
    "CARDINAL_KETS",
    "DEFAULT_INTERVENTION_STYLE",
    "INTERVENTION_STYLES",
]

DEFAULT_INTERVENTION_STYLE = "haar"
INTERVENTION_STYLES = ("haar", "clifford", "measure_prepare")

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

    @property
    def kraus(self) -> np.ndarray:
        return np.outer(self.prep, self.meas.conj())

    def features(self) -> np.ndarray:
        return choi_features(self.meas, self.prep)


@dataclasses.dataclass
class UnitaryIntervention:
    """One unitary step ``rho -> U rho U^dag`` (haar / clifford styles)."""

    u: np.ndarray

    @property
    def kraus(self) -> np.ndarray:
        return self.u

    def features(self) -> np.ndarray:
        return kraus_choi_features(self.u)


@lru_cache(maxsize=1)
def _clifford_unitaries() -> tuple[np.ndarray, ...]:
    """The 24 single-qubit Cliffords: closure of {H, S} with a canonical
    global phase (largest-magnitude entry made real positive)."""
    h = np.array([[1, 1], [1, -1]], dtype=np.complex128) / np.sqrt(2)
    s = np.array([[1, 0], [0, 1j]], dtype=np.complex128)

    def canonical(u):
        # first nonzero entry made real positive: Clifford entries are either
        # 0 or >= 1/sqrt(2) in magnitude, so "first nonzero" is stable under
        # floating-point noise (argmax on near-ties is not)
        flat = u.reshape(-1)
        idx = int(np.flatnonzero(np.abs(flat) > 1e-9)[0])
        ref = flat[idx]
        return u * np.exp(-1j * np.angle(ref))

    elems = [canonical(np.eye(2, dtype=np.complex128))]
    queue = list(elems)
    while queue:
        u = queue.pop()
        for g in (h, s):
            v = canonical(g @ u)
            if not any(np.allclose(v, w, atol=1e-12) for w in elems):
                elems.append(v)
                queue.append(v)
    if len(elems) != 24:  # pragma: no cover - group closure is fixed
        msg = f"Clifford enumeration produced {len(elems)} elements, expected 24"
        raise RuntimeError(msg)
    return tuple(elems)


def enumerate_clifford_unitaries() -> tuple[np.ndarray, ...]:
    """The 24 single-qubit Clifford unitaries (phase-canonical, cached)."""
    return _clifford_unitaries()


def sample_ket(rng: np.random.Generator, style: str = "haar") -> np.ndarray:
    """Sample a cut-slot ket: Haar for the unitary styles, cardinal for MP."""
    if style in {"haar", "clifford"}:
        v = rng.normal(size=2) + 1j * rng.normal(size=2)
        return v / np.linalg.norm(v)
    if style == "measure_prepare":
        keys = list(CARDINAL_KETS)
        return CARDINAL_KETS[keys[rng.integers(len(keys))]].copy()
    msg = f"unknown intervention style {style!r}; valid: {INTERVENTION_STYLES}"
    raise ValueError(msg)


def sample_intervention(rng: np.random.Generator, style: str = DEFAULT_INTERVENTION_STYLE):
    """Sample one within-sequence intervention step for the given style."""
    if style == "haar":
        a = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        q, r = np.linalg.qr(a)
        diag = np.diag(r)
        phases = np.where(np.abs(diag) > 1e-15, diag / np.abs(np.where(diag == 0, 1, diag)), 1.0)
        return UnitaryIntervention(u=q @ np.diag(phases))
    if style == "clifford":
        cliffords = enumerate_clifford_unitaries()
        return UnitaryIntervention(u=cliffords[int(rng.integers(len(cliffords)))].copy())
    if style == "measure_prepare":
        return MPIntervention(
            meas=sample_ket(rng, "measure_prepare"), prep=sample_ket(rng, "measure_prepare")
        )
    msg = f"unknown intervention style {style!r}; valid: {INTERVENTION_STYLES}"
    raise ValueError(msg)


def kraus_choi_features(kraus: np.ndarray) -> np.ndarray:
    """32-real Choi encoding of a single-Kraus map ``rho -> K rho K^dag``:
    ``J[(c,a),(e,b)] = K[c,a] conj(K[e,b])`` flattened Re/Im."""
    k = np.asarray(kraus, dtype=np.complex128)
    vec = k.reshape(-1)
    c = np.outer(vec, vec.conj())
    return np.concatenate([c.real.reshape(-1), c.imag.reshape(-1)]).astype(np.float32)


def choi_features(meas: np.ndarray, prep: np.ndarray) -> np.ndarray:
    """32-real Choi encoding of the MP map ``rho -> <m|rho|m> |p><p|``."""
    return kraus_choi_features(np.outer(prep, np.asarray(meas).conj()))
