"""Measurement-statistics and gauge/padding sweep for the MPS class.

Mirrors the breadth of the reference's MPS battery
(/root/reference/tests/core/data_structures/test_mps.py, measurement +
canonical-form + padding sections) with independent oracles: every
statistical check is validated against dense-statevector Born
probabilities computed here from scratch, and every gauge check against
explicit tensor contractions.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.core.mps import MPS

RNG = np.random.default_rng(20260819)

H2 = np.array([[1, 1], [1, -1]], dtype=np.complex128) / np.sqrt(2)
SDG_H = (
    np.array([[1, 0], [0, -1j]], dtype=np.complex128).conj().T @ H2
)  # maps y-basis to computational


def dense_probs(mps: MPS, basis: str = "Z") -> np.ndarray:
    """Born probabilities from the dense statevector (site 0 least
    significant), independently of any MPS sampling code."""
    psi = mps.to_vec()
    psi = psi / np.linalg.norm(psi)
    if basis != "Z":
        rot = {"X": H2, "Y": SDG_H.conj().T}[basis]
        # site 0 least significant: full rotation is rot applied per qubit
        full = np.array([[1.0]], dtype=np.complex128)
        for _ in range(mps.length):
            full = np.kron(rot, full)
        psi = full @ psi
    return np.abs(psi) ** 2


def counts_to_probs(counts: dict[int, int], dim: int) -> np.ndarray:
    total = sum(counts.values())
    p = np.zeros(dim)
    for k, v in counts.items():
        p[k] = v / total
    return p


# ---------------------------------------------------------------------------
# basis-resolved shot sampling
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    ("state", "basis", "outcome"),
    [
        ("x+", "X", 0),
        ("x-", "X", 1),
        ("y+", "Y", 0),
        ("y-", "Y", 1),
        ("zeros", "Z", 0),
        ("ones", "Z", 1),
    ],
)
def test_single_shot_deterministic_eigenstates(state, basis, outcome):
    """Measuring an eigenstate of the chosen basis is deterministic."""
    for seed in range(5):
        assert MPS(1, state=state).measure_single_shot(seed=seed, basis=basis) == outcome


@pytest.mark.parametrize("basis", ["X", "Y", "Z"])
def test_measure_shots_match_dense_born_rule(basis):
    """Shot frequencies on a random entangled 3-qubit MPS must match the
    dense Born distribution in every global basis."""
    mps = MPS(3, state="haar-random", rng=np.random.default_rng(7))
    want = dense_probs(mps, basis)
    counts = mps.measure_shots(20000, seed=11, basis=basis)
    got = counts_to_probs(counts, 8)
    np.testing.assert_allclose(got, want, atol=0.02)


def test_measure_shots_x_basis_on_zero_is_uniform():
    counts = MPS(1, state="zeros").measure_shots(2000, seed=2, basis="X")
    assert sum(counts.values()) == 2000
    assert abs(counts.get(0, 0) - 1000) < 150


def test_measure_shots_bell_state_parity():
    """(|00>+|11>)/sqrt(2) yields only even-parity outcomes in both the Z
    and the X basis (it is a stabilizer state of ZZ and XX)."""
    bell = MPS(2, state="zeros")
    bell.apply_local(H2, 0)
    cx = np.eye(4, dtype=np.complex128)[[0, 1, 3, 2]]
    bell.apply_local(cx, (0, 1))
    for basis in ("Z", "X"):
        counts = bell.measure_shots(500, seed=5, basis=basis)
        assert set(counts) <= {0, 3}, (basis, counts)
        assert abs(counts.get(0, 0) - 250) < 70, (basis, counts)


def test_measure_shots_rejects_bad_basis_and_qudits():
    with pytest.raises(ValueError, match="basis"):
        MPS(1).measure_shots(2, basis="Q")
    with pytest.raises(ValueError, match="qubits"):
        MPS(2, physical_dimensions=3).measure_shots(2, basis="X")


def test_measure_shots_seed_reproducible():
    mps = MPS(3, state="haar-random", rng=np.random.default_rng(1))
    assert mps.measure_shots(64, seed=9) == mps.measure_shots(64, seed=9)
    # and basis-Z default equals explicit basis="Z"
    assert mps.measure_shots(64, seed=9) == mps.measure_shots(64, seed=9, basis="Z")


# ---------------------------------------------------------------------------
# in-place single-site measurement
# ---------------------------------------------------------------------------


def test_inplace_measure_x_basis_statistics_and_collapse():
    """X-measuring |0> is a fair coin; afterwards the state is the
    corresponding |+/-> eigenstate (checked against dense vectors)."""
    plus = np.array([1, 1], dtype=np.complex128) / np.sqrt(2)
    minus = np.array([1, -1], dtype=np.complex128) / np.sqrt(2)
    outcomes = []
    for seed in range(40):
        m = MPS(1, state="zeros")
        out = m.measure(0, basis="X", rng=np.random.default_rng(seed))
        outcomes.append(out)
        vec = m.to_vec()
        vec = vec / np.linalg.norm(vec)
        target = plus if out == 0 else minus
        fid = abs(np.vdot(target, vec))
        np.testing.assert_allclose(fid, 1.0, atol=1e-10)
    assert 5 < sum(outcomes) < 35  # both outcomes occur


def test_inplace_measure_bell_correlations():
    """Measuring one half of a Bell pair collapses the other half."""
    for seed in range(20):
        bell = MPS(2, state="zeros")
        bell.apply_local(H2, 0)
        cx = np.eye(4, dtype=np.complex128)[[0, 1, 3, 2]]
        bell.apply_local(cx, (0, 1))
        a = bell.measure(0, rng=np.random.default_rng(seed))
        b = bell.measure(1, rng=np.random.default_rng(seed + 1000))
        assert a == b


def test_inplace_measure_updates_marginals_sequentially():
    """Sequential site measurements on a product state reproduce the
    per-site marginals exactly (each site independent)."""
    thetas = [0.3, 1.1, 2.0]
    m = MPS(3, state="zeros")
    for i, th in enumerate(thetas):
        ry = np.array(
            [[np.cos(th / 2), -np.sin(th / 2)], [np.sin(th / 2), np.cos(th / 2)]],
            dtype=np.complex128,
        )
        m.apply_local(ry, i)
    hits = np.zeros(3)
    n = 300
    for seed in range(n):
        mm = m.copy()
        rng = np.random.default_rng(seed)
        hits += [mm.measure(i, rng=rng) for i in range(3)]
    want = [np.sin(th / 2) ** 2 for th in thetas]
    np.testing.assert_allclose(hits / n, want, atol=0.09)


def test_measure_invalid_site_raises():
    with pytest.raises(ValueError, match="site"):
        MPS(2).measure(5)
    with pytest.raises(ValueError, match="site"):
        MPS(2).measure(-1)


# ---------------------------------------------------------------------------
# PVM projection probabilities
# ---------------------------------------------------------------------------


def test_project_onto_bitstring_vs_dense():
    mps = MPS(3, state="haar-random", rng=np.random.default_rng(3))
    want = dense_probs(mps)
    for k in range(8):
        bits = "".join(str((k >> i) & 1) for i in range(3))  # site 0 first
        np.testing.assert_allclose(
            mps.project_onto_bitstring(bits), want[k], atol=1e-10
        )


def test_project_onto_bitstring_unnormalized_state():
    """PVM probabilities are norm-relative (reference divides by <psi|psi>)."""
    mps = MPS(2, state="haar-random", rng=np.random.default_rng(4))
    scaled = mps.copy()
    scaled.apply_local(2.0 * np.eye(2, dtype=np.complex128), 0)
    for bits in ("00", "10", "01", "11"):
        np.testing.assert_allclose(
            scaled.project_onto_bitstring(bits),
            mps.project_onto_bitstring(bits),
            atol=1e-10,
        )


# ---------------------------------------------------------------------------
# canonical form / gauge sweep
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("length", [1, 2, 4, 6])
def test_canonicalization_is_state_preserving_any_start(length):
    """set_canonical_form from an arbitrary (nonunitary-damaged) gauge must
    preserve the physical ray."""
    mps = MPS(length, state="haar-random", rng=np.random.default_rng(length))
    damage = np.array([[1.0, 0.3], [0.0, 0.7]], dtype=np.complex128)
    mps.apply_local(damage, length // 2)
    before = mps.to_vec()
    before = before / np.linalg.norm(before)
    mps.set_canonical_form()
    after = mps.to_vec()
    after = after / np.linalg.norm(after)
    np.testing.assert_allclose(abs(np.vdot(before, after)), 1.0, atol=1e-9)
    assert mps.check_canonical_form()


def test_check_canonical_form_rejects_sullied_gauge():
    mps = MPS(4, state="haar-random", rng=np.random.default_rng(9))
    mps.set_canonical_form()
    assert mps.check_canonical_form()
    t = np.array(mps.tensors)
    t[2] *= 1.7  # break the isometry at site 2
    bad = MPS(tensors=t)
    assert not bad.check_canonical_form()


def test_normalize_returns_norm_and_unit_result():
    mps = MPS(3, state="haar-random", rng=np.random.default_rng(5))
    mps.apply_local(3.0 * np.eye(2, dtype=np.complex128), 1)
    prev = mps.normalize()
    np.testing.assert_allclose(prev, 3.0, atol=1e-8)
    np.testing.assert_allclose(mps.norm(), 1.0, atol=1e-10)


# ---------------------------------------------------------------------------
# padding / truncation sweep
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(("length", "target"), [(2, 16), (3, 24), (5, 16), (6, 20)])
def test_pad_bond_dimension_shapes_and_state(length, target):
    mps = MPS(length, state="haar-random", rng=np.random.default_rng(length + 1))
    before = mps.to_vec()
    mps.pad_bond_dimension(target)
    assert mps.chi >= target
    np.testing.assert_allclose(mps.to_vec(), before, atol=1e-10)
    assert mps.check_if_valid_mps()


def test_pad_bond_dimension_shrink_raises():
    """Shrinking is truncation, not padding — an explicit error (reference
    test_pad_raises_on_shrink)."""
    mps = MPS(5, state="haar-random", rng=np.random.default_rng(2))
    with pytest.raises(ValueError, match="shrink"):
        mps.pad_bond_dimension(1)


def test_compress_matches_dense_svd_truncation():
    """Compressing a random 4-qubit state to chi=2 must keep exactly the
    weight of the two dominant Schmidt directions on every cut (oracle:
    dense SVD of the bipartition)."""
    mps = MPS(4, state="haar-random", rng=np.random.default_rng(6))
    psi = mps.to_vec()
    psi = psi / np.linalg.norm(psi)
    mps.normalize()
    mps.compress(threshold=0.0, max_bond_dim=2)
    vec = mps.to_vec()
    kept = np.linalg.norm(vec) ** 2
    # oracle upper bound: product of per-cut kept weights is <= kept fidelity
    # of a single optimal cut; compare against the weakest cut
    worst = 1.0
    for cut in range(1, 4):
        m = psi.reshape(2 ** (4 - cut), 2**cut, order="F")  # site 0 fastest
        s = np.linalg.svd(m, compute_uv=False)
        worst = min(worst, float(np.sum(s[:2] ** 2)))
    assert kept <= 1.0 + 1e-9
    assert kept >= worst**3 - 1e-9  # sequential cuts each lose at most (1-worst)
    # overlap with the original is at least the kept weight
    fid = abs(np.vdot(psi, vec / np.linalg.norm(vec))) ** 2
    assert fid >= worst**3 - 1e-9


def test_compress_noop_below_threshold():
    mps = MPS(3, state="x+")
    before = mps.to_vec()
    mps.compress(threshold=1e-12, max_bond_dim=4)
    after = mps.to_vec()
    np.testing.assert_allclose(
        after / np.linalg.norm(after), before / np.linalg.norm(before), atol=1e-10
    )


# ---------------------------------------------------------------------------
# entropy / Schmidt spectrum statistics
# ---------------------------------------------------------------------------


def test_haar_random_entropy_exceeds_product_states():
    """Haar-random MPS carry near-maximal cut entropy; product states none.
    (Reference haar statistics test, independently computed.)"""
    ents = [MPS(4, state="haar-random", rng=np.random.default_rng(s)).get_entropy(1) for s in range(8)]
    assert min(ents) > 0.25  # Page-ish: well above zero for every draw
    assert MPS(4, state="x+").get_entropy(1) < 1e-8


def test_schmidt_spectrum_vs_dense_all_bonds():
    mps = MPS(4, state="haar-random", rng=np.random.default_rng(8))
    psi = mps.to_vec()
    psi = psi / np.linalg.norm(psi)
    for bond in range(3):
        spec = np.asarray(mps.get_schmidt_spectrum(bond))
        # order='F': axis 0 indexes the low bits = sites 0..bond (the left
        # block of the cut between sites bond and bond+1)
        m = psi.reshape(2 ** (bond + 1), 2 ** (3 - bond), order="F")
        s = np.linalg.svd(m, compute_uv=False)
        got = np.sort(spec[spec > 1e-12])[::-1]
        np.testing.assert_allclose(got, s[: len(got)], atol=1e-9)


def test_long_range_gate_then_measure_consistency():
    """Long-range two-site gate (SWAP-routed) followed by shot sampling must
    match the dense pipeline end to end."""
    mps = MPS(4, state="haar-random", rng=np.random.default_rng(10))
    theta = 0.8
    zz = np.diag(np.exp(-1j * theta * np.array([1, -1, -1, 1])))
    mps.apply_local(zz, (0, 3))
    want = dense_probs(mps)
    got = counts_to_probs(mps.measure_shots(20000, seed=13), 16)
    np.testing.assert_allclose(got, want, atol=0.02)
