"""Zero-padding invariant at the chain boundaries.

Boundary bonds anchor at index 0; entries in ``tensors[0][:, 1:, :]`` and
``tensors[-1][:, :, 1:]`` are contraction-unreachable pads that MUST stay
zero.  LQ/polar canonicalization naturally fills the last site's pad columns
with unit-norm isometry-completion rows; a later two-site solve merging that
site then lets those unit singular values beat physical weight for the
truncation keep slots (bisected: a full-chain CX-generator window-TDVP stage
silently lost 0.43% of physical amplitude while the padded trace norm read
1.0).  These tests pin the invariant restored by
``mps_ops.zero_boundary_pads`` inside ``canonicalize_right``.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from yaqs_tpu.core import mps_ops


def junky_random_mps(length=6, d=2, chi=8, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.normal(size=(length, d, chi, chi)) + 1j * rng.normal(
        size=(length, d, chi, chi)
    )
    return t.astype(np.complex128)


@pytest.mark.parametrize("method", ["qr", "newton"])
def test_canonicalize_zeroes_boundary_pads(method):
    t = junky_random_mps()
    out = np.asarray(jax.jit(mps_ops.canonicalize_right, static_argnames=("method",))(t, method=method))
    assert np.abs(out[0][:, 1:, :]).max() == 0.0
    assert np.abs(out[-1][:, :, 1:]).max() == 0.0


def test_canonicalize_preserves_anchored_state():
    # the pads it zeroes were never reachable: the anchored dense vector of
    # a pad-clean state is unchanged by canonicalization
    rng = np.random.default_rng(1)
    length, d, chi = 5, 2, 4
    t = rng.normal(size=(length, d, chi, chi)) + 1j * rng.normal(
        size=(length, d, chi, chi)
    )
    t[0][:, 1:, :] = 0.0
    t[-1][:, :, 1:] = 0.0
    before = mps_ops.to_statevector_np(t)
    out = np.asarray(jax.jit(mps_ops.canonicalize_right)(t))
    after = mps_ops.to_statevector_np(out)
    np.testing.assert_allclose(after, before, atol=1e-10)


def test_trace_norm_equals_anchored_norm_after_canonicalization():
    # with pads zeroed, the eye-boundary transfer-chain norm counts exactly
    # the anchored physical weight
    t = junky_random_mps(seed=2)
    t[0][:, 1:, :] = 0.0
    t[-1][:, :, 1:] = 0.0
    out = np.asarray(jax.jit(mps_ops.canonicalize_right)(t))
    trace_n2 = float(np.asarray(mps_ops.norm_squared(out)))
    anchored_n2 = float(np.linalg.norm(mps_ops.to_statevector_np(out)) ** 2)
    np.testing.assert_allclose(trace_n2, anchored_n2, rtol=1e-10)


def test_normalize_canonical_unit_anchored_norm():
    t = junky_random_mps(seed=3)
    t[0][:, 1:, :] = 0.0
    t[-1][:, :, 1:] = 0.0
    out, _ = jax.jit(mps_ops.normalize_canonical)(t)
    vec = mps_ops.to_statevector_np(np.asarray(out))
    np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-10)


def test_length_one_pads_zeroed():
    t = junky_random_mps(length=1, seed=4)
    out = np.asarray(jax.jit(mps_ops.canonicalize_right)(t))
    assert np.abs(out[0][:, 1:, :]).max() == 0.0
    assert np.abs(out[0][:, :, 1:]).max() == 0.0
