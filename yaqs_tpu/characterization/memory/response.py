"""Split-cut response matrix and spectrum diagnostics.

Reference: mqt-yaqs characterization/memory/operational_memory/
response_matrix.py — extract XYZ Pauli channels from the probed final states,
center over the past index, assemble the (optionally weight-multiplied)
response matrix, and compute its singular spectrum, entropy, and mode count.

The centered-matrix property: a process with no memory across the cut yields
final states independent of the past branch, so every column is constant over
rows and the centered matrix vanishes (entropy 0, rank 0).
"""

from __future__ import annotations

import numpy as np

from ...models.operators import pauli_x, pauli_y, pauli_z

__all__ = ["pauli_channels", "assemble_response_matrix", "compute_spectrum"]

_PAULIS = np.stack([pauli_x, pauli_y, pauli_z])


def pauli_channels(rhos: np.ndarray, normalize: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """``(batch, d, d)`` unnormalized states -> ``(bloch (batch, 3), weights)``."""
    weights = np.real(np.trace(rhos, axis1=-2, axis2=-1))
    vals = np.real(np.einsum("kab,nba->nk", _PAULIS, rhos))
    if normalize:
        safe = np.where(np.abs(weights) > 1e-14, weights, 1.0)
        vals = vals / safe[:, None]
    return vals, weights


def assemble_response_matrix(
    pauli_xyz_ij: np.ndarray, weights_ij: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """``pauli_xyz_ij (n_pasts, n_futures, 3)`` -> (raw, centered) matrices
    ``(n_pasts, 3 * n_futures)``; centering removes the past-independent part.
    """
    n_p, n_f, _ = pauli_xyz_ij.shape
    m = pauli_xyz_ij
    if weights_ij is not None:
        w = weights_ij / np.maximum(np.mean(weights_ij), 1e-300)
        m = m * w[:, :, None]
    m_raw = m.reshape(n_p, 3 * n_f)
    centered = m_raw - m_raw.mean(axis=0, keepdims=True)
    return m_raw, centered


def compute_spectrum(
    matrix: np.ndarray, mode_tol: float = 1e-6, reference_scale: float | None = None
) -> dict:
    """Singular spectrum -> memory entropy and mode count.

    ``reference_scale`` (typically the raw/uncentered matrix norm) sets the
    absolute floor below which the centered matrix counts as numerically zero
    — otherwise roundoff singulars of a memoryless process masquerade as
    memory modes.
    """
    s = np.linalg.svd(matrix, compute_uv=False)
    floor = 0.0
    if reference_scale is not None:
        floor = float(reference_scale) * 1e-9
    if s.size == 0 or s[0] <= floor:
        return {"entropy": 0.0, "modes": 0, "singular_values": np.zeros_like(s)}
    total = np.sum(s**2)
    p = s**2 / total
    p_pos = p[p > 1e-16]
    entropy = float(-np.sum(p_pos * np.log(p_pos)))
    modes = int(np.sum(s > max(mode_tol * s[0], floor)))
    return {"entropy": entropy, "modes": modes, "singular_values": s}
