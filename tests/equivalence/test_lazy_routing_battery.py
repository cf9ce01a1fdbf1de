"""Lazy-permutation routing battery for the MPO equivalence backend.

The checker routes long-range gates through ONE shared site permutation that
evolves across the whole interleaved two-circuit stream (no per-gate restore;
yaqs_tpu/equivalence/checker.py::_route_stream).  That layout sharing is the
round-4 performance redesign (QFT-50 816 s -> 40 s), so every case here
drives a permutation-state edge against the dense oracle
|Tr(U2^dag U1)| / 2^n at small n with exact settings (chi=64,
svd_threshold=1e-13 keeps n <= 6 streams lossless):

- gates addressed while the lazy layout has already moved their qubits;
- repeated same-pair and nested/overlapping long-range spans;
- descending (control > target) qargs under a moved layout;
- one-qubit gates landing on relocated qubits;
- both circuits of the pair contributing long-range moves to the shared
  permutation.

Reference scope: /root/reference/tests/test_equivalence_checker.py long-range
cases (lines 102-140) plus the reference's local checkerboard-update engine
(digital/utils/contraction_utils.py:271-341), which this lazy design replaces.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.digital.circuit import Circuit
from yaqs_tpu.equivalence import EquivalenceChecker
from yaqs_tpu.models.circuits import create_qft_circuit

CHECK = dict(method="mpo", max_bond_dim=64, svd_threshold=1e-13)


def _dense_fidelity(c1: Circuit, c2: Circuit) -> float:
    u1 = EquivalenceChecker._circuit_unitary(c1)
    u2 = EquivalenceChecker._circuit_unitary(c2)
    return abs(np.trace(u2.conj().T @ u1)) / u1.shape[0]


def _assert_matches_dense(c1: Circuit, c2: Circuit, atol=1e-8):
    res = EquivalenceChecker().check(c1, c2, **CHECK)
    assert res.method == "mpo"
    dense = _dense_fidelity(c1, c2)
    np.testing.assert_allclose(res.fidelity, dense, atol=atol)
    return res, dense


_2Q_POOL = ("cx", "cz", "rzz", "crz", "swap")
_1Q_POOL = ("h", "x", "ry", "rz", "s")


def _random_circuit(n: int, num_ops: int, rng: np.random.Generator) -> Circuit:
    """Long-range-heavy random circuit: 2q gates prefer distant pairs."""
    c = Circuit(n)
    for _ in range(num_ops):
        if rng.random() < 0.45:
            name = _1Q_POOL[rng.integers(len(_1Q_POOL))]
            params = (float(rng.uniform(0, 2 * np.pi)),) if name in ("ry", "rz") else ()
            getattr(c, name)(int(rng.integers(n)), params=params) if params else getattr(c, name)(int(rng.integers(n)))
        else:
            name = _2Q_POOL[rng.integers(len(_2Q_POOL))]
            a, b = map(int, rng.choice(n, size=2, replace=False))
            params = (float(rng.uniform(0, 2 * np.pi)),) if name in ("rzz", "crz") else ()
            if params:
                getattr(c, name)(a, b, params=params)
            else:
                getattr(c, name)(a, b)
    return c


@pytest.mark.parametrize("seed", range(5))
def test_random_long_range_streams_match_dense(seed):
    """Random interleaved streams: MPO fidelity == dense to 1e-8, and the
    verdict agrees with thresholding the dense value."""
    rng = np.random.default_rng(seed)
    n = 5 + seed % 2
    c1 = _random_circuit(n, 14, rng)
    c2 = _random_circuit(n, 14, rng)
    res, dense = _assert_matches_dense(c1, c2)
    assert res.equivalent == (dense >= 1 - 1e-6)


@pytest.mark.parametrize("seed", range(3))
def test_near_equivalent_perturbation_fidelity_pinned(seed):
    """c2 = c1 plus one small rz: fidelity must track cos(theta/2) exactly
    through an arbitrary lazy layout."""
    rng = np.random.default_rng(100 + seed)
    n = 6
    c1 = _random_circuit(n, 12, rng)
    c2 = _random_circuit(n, 12, np.random.default_rng(100 + seed))
    theta = 0.07
    c2.rz(int(rng.integers(n)), params=(theta,))
    res, dense = _assert_matches_dense(c1, c2)
    assert not res.equivalent
    assert res.fidelity == pytest.approx(abs(np.cos(theta / 2)), abs=1e-6)


def test_repeated_same_pair_long_range_cancels():
    """Two identical CX(0, n-1): the second rides the layout the first
    created (zero-hop fast case) and the pair cancels to identity."""
    n = 6
    c1 = Circuit(n)
    c1.cx(0, n - 1)
    c1.cx(0, n - 1)
    c2 = Circuit(n)  # identity
    res, dense = _assert_matches_dense(c1, c2)
    assert dense == pytest.approx(1.0, abs=1e-12)
    assert res.equivalent


def test_nested_overlapping_spans_match_dense():
    """cx(0,5), cx(1,4), cx(2,3): each span sees the layout its outer
    predecessors left behind."""
    n = 6
    c1 = Circuit(n)
    for a, b in ((0, 5), (1, 4), (2, 3)):
        c1.cx(a, b)
    c2 = Circuit(n)
    for a, b in ((0, 5), (1, 4), (2, 3)):
        c2.cx(a, b)
    res, _ = _assert_matches_dense(c1, c2)
    assert res.equivalent

    c3 = Circuit(n)
    for a, b in ((0, 5), (1, 4), (2, 4)):  # last span shifted
        c3.cx(a, b)
    res2, dense2 = _assert_matches_dense(c1, c3)
    assert not res2.equivalent
    assert dense2 < 1 - 1e-6


def test_descending_qargs_under_moved_layout():
    """Control above target (a > b) after earlier moves exercises the
    conjugate-by-SWAP branch with a non-identity layout."""
    n = 6
    c1 = Circuit(n)
    c1.cx(0, 5)          # moves the layout
    c1.crz(4, 0, params=(0.83,))   # descending, through moved sites
    c1.cx(5, 1)          # descending long-range
    c2 = Circuit(n)
    c2.cx(0, 5)
    c2.crz(4, 0, params=(0.83,))
    c2.cx(5, 1)
    res, _ = _assert_matches_dense(c1, c2)
    assert res.equivalent

    c3 = Circuit(n)
    c3.cx(0, 5)
    c3.crz(0, 4, params=(0.83,))   # qargs swapped: NOT the same operator
    c3.cx(5, 1)
    res2, dense2 = _assert_matches_dense(c1, c3)
    assert res2.fidelity == pytest.approx(dense2, abs=1e-8)
    assert not res2.equivalent


def test_one_qubit_gates_land_on_relocated_qubits():
    """After cx(0,5) the lazy layout holds qubits away from their physical
    slots; per-qubit rotations must follow the logical label, not the slot."""
    n = 6
    c1 = Circuit(n)
    c1.cx(0, 5)
    for q in range(n):
        c1.ry(q, params=(0.1 * (q + 1),))
    c1.cx(0, 5)

    # same operator built without long-range moves: conjugation by CX twice
    # cancels, so c2 applies the rotations in-place with the CX pair absorbed
    c2 = Circuit(n)
    c2.cx(0, 5)
    for q in range(n):
        c2.ry(q, params=(0.1 * (q + 1),))
    c2.cx(0, 5)
    res, _ = _assert_matches_dense(c1, c2)
    assert res.equivalent

    # move one rotation to a different logical qubit: caught
    c3 = Circuit(n)
    c3.cx(0, 5)
    for q in range(n):
        c3.ry((q + 1) % n, params=(0.1 * (q + 1),))
    c3.cx(0, 5)
    res2, dense2 = _assert_matches_dense(c1, c3)
    assert not res2.equivalent
    assert dense2 < 1 - 1e-6


def test_commuting_reorder_is_equivalent():
    """ZZ rotations on disjoint distant pairs commute: reordering them
    produces a different routing walk but the same operator."""
    n = 6
    c1 = Circuit(n)
    c1.rzz(0, 3, params=(0.4,))
    c1.rzz(1, 4, params=(0.9,))
    c1.rzz(2, 5, params=(1.3,))
    c2 = Circuit(n)
    c2.rzz(2, 5, params=(1.3,))
    c2.rzz(0, 3, params=(0.4,))
    c2.rzz(1, 4, params=(0.9,))
    res, dense = _assert_matches_dense(c1, c2)
    assert dense == pytest.approx(1.0, abs=1e-12)
    assert res.equivalent


def test_both_circuits_drive_the_shared_permutation():
    """c1 and c2 interleave with DIFFERENT long-range patterns; the shared
    layout must serve both streams."""
    n = 6
    c1 = Circuit(n)
    c1.h(0)
    c1.cx(0, 5)
    c1.cx(0, 3)
    c2 = Circuit(n)
    c2.h(0)
    c2.cx(0, 3)  # reversed order: NOT generally the same operator
    c2.cx(0, 5)
    res, dense = _assert_matches_dense(c1, c2)
    assert res.equivalent == (dense >= 1 - 1e-6)


def test_qft_self_equivalence_and_swapless_twin():
    """QFT-6 against itself is conclusive at full rank; dropping the final
    bit-reversal swaps is a permutation away and must NOT read equivalent."""
    n = 6
    qft = create_qft_circuit(n)
    res = EquivalenceChecker().check(qft, create_qft_circuit(n), **CHECK)
    assert res.equivalent
    assert res.kept_weight == pytest.approx(1.0, abs=1e-9)

    no_swaps = create_qft_circuit(n, include_swaps=False)
    res2, dense2 = _assert_matches_dense(qft, no_swaps)
    assert not res2.equivalent
    assert dense2 < 1 - 1e-6
