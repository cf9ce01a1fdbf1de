"""Krylov expm depth: coefficient conventions, scaling, norm behavior.

Extends tests/ops/test_krylov.py along the reference's matrix-exponential
battery axes (/root/reference/src/mqt/yaqs/core/libraries/
matrix_exponential.py + its tests): real/imaginary/complex coefficients,
dt magnitude sweeps, unnormalized and tensor-shaped inputs, unitarity of
the imaginary-coefficient propagator, Arnoldi on defective-ish operators,
and the grow-then-saturate relation between k and accuracy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from yaqs_tpu.ops.krylov import arnoldi_expm_apply, lanczos_expm_apply


def _herm(n, seed):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    return (m + m.conj().T) / 2


def _vec(n, seed):
    rng = np.random.default_rng(seed + 1000)
    return rng.normal(size=n) + 1j * rng.normal(size=n)


@pytest.mark.parametrize(
    "coeff",
    [(-0.3 + 0j), (0.2 + 0j), (-0.15j), (0.1 - 0.05j)],
    ids=["decay", "growth", "unitary", "mixed"],
)
def test_coefficient_conventions_match_scipy(coeff):
    """exp(coeff*A)v for every coefficient class the engines use: real decay
    (dissipation), imaginary (unitary TDVP), complex (MCWF H_eff)."""
    n = 48
    h = _herm(n, 3)
    v = _vec(n, 3)
    want = scipy.linalg.expm(coeff * h) @ v
    got = lanczos_expm_apply(lambda x: jnp.asarray(h) @ x, jnp.asarray(v), coeff, k=30)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


def test_unnormalized_input_scales_linearly():
    """expm application is linear: scaling v scales the output, bit-for-bit
    in the algorithm (the Lanczos basis normalizes internally)."""
    n = 32
    h = _herm(n, 5)
    v = _vec(n, 5)
    f = lambda s: np.asarray(
        lanczos_expm_apply(
            lambda x: jnp.asarray(h) @ x, jnp.asarray(s * v), -0.2j, k=20
        )
    )
    np.testing.assert_allclose(f(7.5), 7.5 * f(1.0), atol=1e-9)


def test_tensor_shaped_input_roundtrip():
    """Engines pass (d, chi, chi) site tensors; shape must be preserved and
    values equal the flattened computation."""
    h = _herm(2 * 4 * 4, 7)
    t = _vec(2 * 4 * 4, 7).reshape(2, 4, 4)
    hj = jnp.asarray(h)
    mv = lambda x: (hj @ x.reshape(-1)).reshape(2, 4, 4)
    got = lanczos_expm_apply(mv, jnp.asarray(t), -0.1j, k=20)
    assert got.shape == (2, 4, 4)
    want = scipy.linalg.expm(-0.1j * h) @ t.reshape(-1)
    np.testing.assert_allclose(np.asarray(got).reshape(-1), want, atol=1e-9)


def test_imaginary_coefficient_preserves_norm():
    n = 64
    h = _herm(n, 11)
    v = _vec(n, 11)
    v = v / np.linalg.norm(v)
    for dt in (0.01, 0.1, 0.5):
        got = lanczos_expm_apply(
            lambda x: jnp.asarray(h) @ x, jnp.asarray(v), -1j * dt, k=30
        )
        np.testing.assert_allclose(np.linalg.norm(np.asarray(got)), 1.0, atol=1e-9)


def test_accuracy_improves_with_k_until_saturation():
    n = 96
    h = _herm(n, 13)
    v = _vec(n, 13)
    want = scipy.linalg.expm(-0.4j * h) @ v
    errs = []
    for k in (4, 8, 16, 32):
        got = lanczos_expm_apply(
            lambda x: jnp.asarray(h) @ x, jnp.asarray(v), -0.4j, k=k
        )
        errs.append(np.max(np.abs(np.asarray(got) - want)))
    # improving until the saturation floor (epsilon-floored: once an error
    # reaches ~1e-9 its ordering vs the next is floating-point noise)
    floor = 1e-9
    assert errs[1] <= max(errs[0], floor) and errs[2] <= max(errs[1], floor), errs
    assert errs[3] < 1e-9, errs


def test_dt_magnitude_sweep():
    """One Krylov dimension serves dt over two decades at engine-relevant
    accuracy (the TDVP uses fixed k across the dt schedule)."""
    n = 64
    h = _herm(n, 17)
    v = _vec(n, 17)
    for dt in (0.005, 0.05, 0.25):
        want = scipy.linalg.expm(-1j * dt * h) @ v
        got = lanczos_expm_apply(
            lambda x: jnp.asarray(h) @ x, jnp.asarray(v), -1j * dt, k=25
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-8)


def test_arnoldi_matches_scipy_on_nonnormal_operator():
    """MCWF H_eff = H - i/2 sum L^dag L is non-Hermitian AND non-normal;
    Arnoldi must still track scipy."""
    n = 40
    rng = np.random.default_rng(19)
    h = _herm(n, 19)
    ls = rng.normal(size=(3, n, n)) + 1j * rng.normal(size=(3, n, n))
    heff = h - 0.5j * sum(l.conj().T @ l for l in ls)
    v = _vec(n, 19)
    want = scipy.linalg.expm(-0.1j * heff) @ v
    got = arnoldi_expm_apply(
        lambda x: jnp.asarray(heff) @ x, jnp.asarray(v), -0.1j, k=35
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-8)


def test_arnoldi_reduces_norm_for_dissipative_generator():
    """The MCWF no-jump propagator must shrink (never grow) the norm."""
    n = 24
    rng = np.random.default_rng(23)
    h = _herm(n, 23)
    l = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    heff = h - 0.5j * (l.conj().T @ l)
    v = _vec(n, 23)
    v = v / np.linalg.norm(v)
    got = arnoldi_expm_apply(
        lambda x: jnp.asarray(heff) @ x, jnp.asarray(v), -1j * 0.2, k=24
    )
    n_out = np.linalg.norm(np.asarray(got))
    assert n_out <= 1.0 + 1e-9
    assert n_out > 0.1  # and it did not collapse


def test_lanczos_no_reorth_matches_reorth_at_engine_shapes():
    """The TPU fast path disables reorthogonalization at k<=6; at those k the
    two variants must agree to engine accuracy on well-conditioned inputs."""
    n = 256
    h = _herm(n, 29)
    v = _vec(n, 29)
    kwargs = dict(coeff=-0.1j, k=6)
    a = lanczos_expm_apply(
        lambda x: jnp.asarray(h) @ x, jnp.asarray(v), reorthogonalize=True, **kwargs
    )
    b = lanczos_expm_apply(
        lambda x: jnp.asarray(h) @ x, jnp.asarray(v), reorthogonalize=False, **kwargs
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
