"""Oracle tests for characterization.memory.metrics.

Trace distance and Frobenius metrics are checked against closed-form values
for known density-matrix pairs (reference semantics:
/root/reference/src/mqt/yaqs/characterization/memory/shared/metrics.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.characterization.memory.metrics import (
    compute_rel_fro_error,
    compute_trace_distance,
    mean_frobenius_mse_rho8,
    mean_trace_distance_rho8,
)
from yaqs_tpu.characterization.memory.surrogate import pack_rho8


def test_trace_distance_orthogonal_pure_states_is_one():
    rho0 = np.diag([1.0, 0.0]).astype(complex)
    rho1 = np.diag([0.0, 1.0]).astype(complex)
    assert compute_trace_distance(rho0, rho1) == pytest.approx(1.0)


def test_trace_distance_identical_is_zero():
    rho = np.array([[0.7, 0.2 + 0.1j], [0.2 - 0.1j, 0.3]])
    assert compute_trace_distance(rho, rho) == pytest.approx(0.0, abs=1e-14)


def test_trace_distance_pure_states_closed_form():
    # For pure states: T = sqrt(1 - |<a|b>|^2).
    rng = np.random.default_rng(7)
    for _ in range(5):
        a = rng.normal(size=2) + 1j * rng.normal(size=2)
        b = rng.normal(size=2) + 1j * rng.normal(size=2)
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        td = compute_trace_distance(np.outer(a, a.conj()), np.outer(b, b.conj()))
        assert td == pytest.approx(np.sqrt(1 - abs(np.vdot(a, b)) ** 2), abs=1e-12)


def test_trace_distance_hermitizes_input():
    # A tiny anti-Hermitian perturbation must not change the result.
    rho = np.diag([0.6, 0.4]).astype(complex)
    sigma = np.diag([0.5, 0.5]).astype(complex)
    base = compute_trace_distance(rho, sigma)
    skew = np.array([[0, 1e-3], [-1e-3, 0]])
    assert compute_trace_distance(rho + skew, sigma) == pytest.approx(base, abs=1e-12)


def test_rel_fro_error_scaling():
    b = np.eye(3, dtype=complex)
    a = b * 1.5
    assert compute_rel_fro_error(a, b) == pytest.approx(0.5)
    assert compute_rel_fro_error(b, b) == pytest.approx(0.0)


def test_rel_fro_error_zero_reference_guard():
    z = np.zeros((2, 2), dtype=complex)
    a = np.eye(2, dtype=complex)
    # Guarded denominator: finite, huge value instead of inf.
    assert np.isfinite(compute_rel_fro_error(a, z))


@pytest.mark.parametrize("fn", [compute_rel_fro_error, compute_trace_distance])
def test_shape_validation(fn):
    with pytest.raises(ValueError, match="share the same shape"):
        fn(np.eye(2), np.eye(3))
    with pytest.raises(ValueError, match="square"):
        fn(np.ones((2, 3)), np.ones((2, 3)))


def test_mean_trace_distance_rho8_matches_unbatched():
    rhos_a = [np.diag([1.0, 0.0]).astype(complex), np.diag([0.5, 0.5]).astype(complex)]
    rhos_b = [np.diag([0.0, 1.0]).astype(complex), np.diag([0.5, 0.5]).astype(complex)]
    pred = np.stack([pack_rho8(r) for r in rhos_a])
    tgt = np.stack([pack_rho8(r) for r in rhos_b])
    expected = np.mean([compute_trace_distance(a, b) for a, b in zip(rhos_a, rhos_b)])
    assert mean_trace_distance_rho8(pred, tgt) == pytest.approx(expected, abs=1e-6)


def test_mean_frobenius_mse_rho8_closed_form():
    rho = np.diag([1.0, 0.0]).astype(complex)
    sigma = np.diag([0.0, 1.0]).astype(complex)
    pred = pack_rho8(rho)[None]
    tgt = pack_rho8(sigma)[None]
    # ||diag(1,-1)||_F^2 = 2
    assert mean_frobenius_mse_rho8(pred, tgt) == pytest.approx(2.0, abs=1e-6)


def test_rho8_batch_validation():
    v = pack_rho8(np.eye(2) / 2)[None]
    with pytest.raises(ValueError, match="share shape"):
        mean_trace_distance_rho8(v, np.concatenate([v, v]))
    empty = np.zeros((0, 8))
    with pytest.raises(ValueError, match="non-zero batch"):
        mean_frobenius_mse_rho8(empty, empty)
