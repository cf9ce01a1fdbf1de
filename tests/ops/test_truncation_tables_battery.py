"""Truncation keep-count tables (reference sweep-utils parametrized cases).

Mirrors the reference's split-truncation tables
(tests/core/methods/tdvp/test_sweep_utils.py) on the mask-semantics API:
explicit singular-value vectors with hand-computed expected keeps for every
mode, boundary/tie handling, cap/floor composition order, batched inputs,
and the split-level invariant that the masked tail power respects the
threshold.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from yaqs_tpu.ops.decomp import split_matrix_truncated
from yaqs_tpu.ops.truncation import keep_count, keep_mask


def _kc(svs, **kw):
    return int(np.asarray(keep_count(jnp.asarray(np.asarray(svs, float)), **kw)))


# ---------------------------------------------------------- discarded weight
@pytest.mark.parametrize(
    "svs,threshold,expected",
    [
        ([1.0, 0.5, 0.1, 0.01], 1e-3, 3),       # drop only the 1e-4 tail
        ([1.0, 0.5, 0.1, 0.01], 2e-2, 2),       # 0.01^2 + 0.1^2 > 2e-2? 0.0101 < 0.02 -> drop both
        ([1.0, 0.5, 0.1, 0.01], 1e-6, 4),       # nothing droppable
        ([1.0, 0.5, 0.1, 0.01], 10.0, 4),       # total power < threshold:
                                                 # NOTHING discarded (ref
                                                 # svd_utils: discard only
                                                 # while cum < threshold is
                                                 # reachable)
        ([1.0, 0.0, 0.0], 1e-12, 1),            # exact zeros drop for free? tail power 0 < thr
        ([0.6, 0.6, 0.6], 0.3, 3),              # 0.36 tail >= 0.3: keep all
        ([1.0], 0.5, 1),                         # single value, min_keep floor
    ],
)
def test_discarded_weight_table(svs, threshold, expected):
    assert _kc(svs, mode="discarded_weight", threshold=threshold) == expected


def test_discarded_weight_strictly_below_threshold_semantics():
    """The discarded tail's power stays STRICTLY below the threshold
    (reference svd_utils loop: discard while cum < threshold)."""
    svs = np.array([1.0, 0.3, 0.2, 0.1])
    for thr in (0.0099, 0.01, 0.0101, 0.05, 0.14):
        keep = _kc(svs, mode="discarded_weight", threshold=thr)
        tail = svs[keep:]
        assert float(np.sum(tail**2)) <= thr + 1e-12
        if keep < len(svs):
            bigger_tail = svs[keep - 1 :]
            assert float(np.sum(bigger_tail**2)) >= thr - 1e-12


# ------------------------------------------------------------------ relative
@pytest.mark.parametrize(
    "svs,threshold,expected",
    [
        ([1.0, 0.5, 0.1, 0.01], 0.05, 3),
        ([1.0, 0.5, 0.1, 0.01], 0.5, 2),
        ([1.0, 0.5, 0.1, 0.01], 0.005, 4),
        ([2.0, 1.0], 0.5, 2),                    # ratio exactly at threshold kept (>=)
        ([0.0, 0.0], 0.1, 1),                    # smax <= 0: min_keep floor
    ],
)
def test_relative_table(svs, threshold, expected):
    assert _kc(svs, mode="relative", threshold=threshold) == expected


# --------------------------------------------------------------- hard cutoff
@pytest.mark.parametrize(
    "svs,threshold,expected",
    [
        ([1.0, 0.5, 0.1, 0.01], 0.05, 3),
        ([1.0, 0.5, 0.1, 0.01], 0.1, 2),         # strictly greater: 0.1 dropped
        ([1.0, 0.5, 0.1, 0.01], 0.0, 4),
        ([1e-12, 1e-13], 1e-11, 1),               # all below: min_keep floor
    ],
)
def test_hard_cutoff_table(svs, threshold, expected):
    assert _kc(svs, mode="hard_cutoff", threshold=threshold) == expected


# ------------------------------------------------------- caps / floors / order
def test_cap_applied_after_mode_then_floor():
    svs = [1.0, 0.9, 0.8, 0.7]
    assert _kc(svs, mode="relative", threshold=0.5, max_bond_dim=2) == 2
    assert _kc(svs, mode="hard_cutoff", threshold=2.0, min_keep=3) == 3
    assert _kc(svs, mode="relative", threshold=0.5, max_bond_dim=3, min_keep=2) == 3


def test_invalid_cap_floor_combination_raises():
    with pytest.raises(ValueError, match="max_bond_dim"):
        _kc([1.0, 0.5], mode="relative", threshold=0.5, max_bond_dim=1, min_keep=2)


def test_unknown_mode_raises():
    with pytest.raises(ValueError, match="Unknown truncation mode"):
        _kc([1.0], mode="weighted", threshold=0.1)


# --------------------------------------------------------------------- masks
def test_mask_matches_keep_count_and_is_prefix():
    svs = np.array([1.0, 0.5, 0.25, 0.1, 0.01])
    for mode, thr in (("discarded_weight", 1e-2), ("relative", 0.2), ("hard_cutoff", 0.2)):
        mask, keep = keep_mask(jnp.asarray(svs), mode=mode, threshold=thr)
        mask = np.asarray(mask)
        k = int(np.asarray(keep))
        assert mask.sum() == k
        assert (mask[:k] == 1).all() and (mask[k:] == 0).all()


def test_batched_keep_counts_independent():
    s = jnp.asarray(
        np.array([[1.0, 0.5, 0.01], [1.0, 0.9, 0.8], [1.0, 0.0, 0.0]])
    )
    keeps = np.asarray(keep_count(s, mode="relative", threshold=0.4))
    np.testing.assert_array_equal(keeps, [2, 3, 1])


# ------------------------------------------------------------- split coupling
def _matrix_with_singulars(svs, n, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.zeros(n)
    s[: len(svs)] = svs
    return u @ np.diag(s) @ v.T


@pytest.mark.parametrize("distribution", ["left", "right", "sqrt"])
def test_split_masked_tail_power_respects_threshold(distribution):
    """Split-level invariant: the reconstruction error of the masked split
    equals the discarded tail (reference split_tdvp invariant)."""
    svs = [1.0, 0.6, 0.3, 0.05, 0.01]
    m = _matrix_with_singulars(svs, 6)
    thr = 0.01
    left, right, s_kept, keep = split_matrix_truncated(
        jnp.asarray(m), 6, mode="discarded_weight", threshold=thr,
        svd_distribution=distribution,
    )
    out = np.asarray(left) @ np.asarray(right)
    k = int(np.asarray(keep))
    tail = np.array(svs)[k:]
    np.testing.assert_allclose(
        np.linalg.norm(out - m), np.linalg.norm(tail), atol=1e-10
    )
    assert float(np.sum(tail**2)) <= thr + 1e-12


def test_split_distribution_variants_same_product():
    m = _matrix_with_singulars([1.0, 0.5, 0.2], 4, seed=3)
    outs = []
    for dist in ("left", "right", "sqrt"):
        left, right, _, _ = split_matrix_truncated(
            jnp.asarray(m), 4, mode="relative", threshold=0.1,
            svd_distribution=dist,
        )
        outs.append(np.asarray(left) @ np.asarray(right))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-10)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-10)


def test_split_pads_rank_deficient_output_bond():
    """chi larger than the true rank: padded columns are exactly zero."""
    m = _matrix_with_singulars([1.0, 0.5], 3, seed=5)  # rank 2 in a 3x3
    left, right, s_kept, keep = split_matrix_truncated(
        jnp.asarray(m), 5, mode="relative", threshold=1e-10
    )
    assert np.asarray(left).shape == (3, 5)
    assert np.asarray(right).shape == (5, 3)
    out = np.asarray(left) @ np.asarray(right)
    np.testing.assert_allclose(out, m, atol=1e-10)
