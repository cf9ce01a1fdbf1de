"""Truncation keep-count parity against the reference algorithm.

Oracle: a straight NumPy reimplementation of the reference's loop semantics
(mqt-yaqs core/linalg/svd_utils.py:22-83).
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.ops.truncation import keep_count, keep_mask


def ref_truncate(s_vec, *, mode, threshold, max_bond_dim=None, min_keep=1):
    n = int(s_vec.size)
    if n == 0:
        return 0
    if mode == "hard_cutoff":
        keep = int(np.sum(s_vec > threshold))
    elif mode == "relative":
        smax = float(s_vec[0])
        keep = 0 if smax <= 0.0 else int(np.sum((s_vec / smax) >= threshold))
    elif mode == "discarded_weight":
        keep = n
        discard = 0.0
        for idx, s in enumerate(reversed(s_vec)):
            discard += float(s) ** 2
            if discard >= threshold:
                keep = max(n - idx, min_keep)
                break
    else:
        raise ValueError(mode)
    if max_bond_dim is not None:
        keep = min(keep, max_bond_dim)
    keep = max(keep, min_keep)
    return min(keep, n)


@pytest.mark.parametrize("mode", ["discarded_weight", "relative", "hard_cutoff"])
@pytest.mark.parametrize("threshold", [0.0, 1e-12, 1e-6, 1e-3, 0.1, 0.9])
def test_keep_count_matches_reference(mode, threshold, seed):
    rng = np.random.default_rng(seed)
    for trial in range(50):
        n = rng.integers(1, 40)
        s = np.sort(rng.random(n))[::-1]
        if trial % 7 == 0:
            s[rng.integers(0, n) :] = 0.0  # exact zeros in the tail
        max_bd = None if trial % 3 else int(rng.integers(1, n + 1))
        min_keep = int(rng.integers(1, 3))
        if max_bd is not None and max_bd < min_keep:
            max_bd = min_keep
        expected = ref_truncate(
            s, mode=mode, threshold=threshold, max_bond_dim=max_bd, min_keep=min_keep
        )
        got = int(
            keep_count(s, mode=mode, threshold=threshold, max_bond_dim=max_bd, min_keep=min_keep)
        )
        assert got == expected, (mode, threshold, s, max_bd, min_keep)


def test_keep_mask_batched():
    s = np.array([[1.0, 0.5, 1e-8, 1e-9], [1.0, 1e-9, 1e-10, 0.0]])
    mask, keep = keep_mask(s, mode="relative", threshold=1e-6)
    np.testing.assert_array_equal(np.asarray(keep), [2, 1])
    np.testing.assert_array_equal(np.asarray(mask), [[1, 1, 0, 0], [1, 0, 0, 0]])


def test_relative_zero_smax_keeps_min():
    s = np.zeros(5)
    assert int(keep_count(s, mode="relative", threshold=1e-6, min_keep=2)) == 2
