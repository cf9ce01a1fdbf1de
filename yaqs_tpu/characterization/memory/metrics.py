"""Density-matrix comparison metrics for process-tensor workflows.

Behavioral parity with the reference's shared metrics helpers
(/root/reference/src/mqt/yaqs/characterization/memory/shared/metrics.py:54-139):
relative Frobenius error, trace distance, and batched rho8-encoded means.
These are host-side numpy diagnostics (called once per evaluation, never in a
hot loop), so there is no reason to route them through jit.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "compute_rel_fro_error",
    "compute_trace_distance",
    "mean_frobenius_mse_rho8",
    "mean_trace_distance_rho8",
]


def _as_square_pair(a, b, name_a: str, name_b: str):
    a = np.asarray(a, dtype=np.complex128)
    b = np.asarray(b, dtype=np.complex128)
    if a.shape != b.shape:
        raise ValueError(
            f"{name_a} and {name_b} must share the same shape, got {a.shape} vs {b.shape}."
        )
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"{name_a} and {name_b} must be square matrices, got shape {a.shape}.")
    return a, b


def compute_rel_fro_error(a_mat, b_mat) -> float:
    """Relative Frobenius error ``||A - B||_F / max(||B||_F, 1e-15)``."""
    a, b = _as_square_pair(a_mat, b_mat, "a_mat", "b_mat")
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-15))


def compute_trace_distance(rho, sigma) -> float:
    """Trace distance ``0.5 ||rho - sigma||_1`` (hermitized difference)."""
    r, s = _as_square_pair(rho, sigma, "rho", "sigma")
    diff = r - s
    diff = 0.5 * (diff + diff.conj().T)
    return float(0.5 * np.abs(np.linalg.eigvalsh(diff)).sum())


def _check_rho8_batch(pred: np.ndarray, tgt: np.ndarray) -> None:
    if pred.shape != tgt.shape:
        raise ValueError(
            f"pred_rho8 and tgt_rho8 must share shape, got {pred.shape} vs {tgt.shape}."
        )
    if pred.shape[0] == 0:
        raise ValueError("pred_rho8 and tgt_rho8 must have a non-zero batch dimension.")


def mean_trace_distance_rho8(pred_rho8: np.ndarray, tgt_rho8: np.ndarray) -> float:
    """Mean trace distance over ``(N, 8)`` rho8-packed single-qubit states."""
    from .surrogate import unpack_rho8

    pred_rho8 = np.asarray(pred_rho8)
    tgt_rho8 = np.asarray(tgt_rho8)
    _check_rho8_batch(pred_rho8, tgt_rho8)
    return float(
        np.mean([
            compute_trace_distance(unpack_rho8(p), unpack_rho8(t))
            for p, t in zip(pred_rho8, tgt_rho8)
        ])
    )


def mean_frobenius_mse_rho8(pred_rho8: np.ndarray, tgt_rho8: np.ndarray) -> float:
    """Mean squared Frobenius (Hilbert-Schmidt) error over rho8 batches."""
    from .surrogate import unpack_rho8

    pred_rho8 = np.asarray(pred_rho8)
    tgt_rho8 = np.asarray(tgt_rho8)
    _check_rho8_batch(pred_rho8, tgt_rho8)
    diffs = [
        unpack_rho8(p) - unpack_rho8(t) for p, t in zip(pred_rho8, tgt_rho8)
    ]
    return float(np.mean([np.real(np.vdot(d, d)) for d in diffs]))
