"""Exhaustive MPS gauge / measurement / manipulation edge cases.

Coverage model: reference tests/core/data_structures/test_mps.py (1730 LoC).
Every assertion is against an independent dense-statevector oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import MPS
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.models.operators import pauli_x, pauli_y, pauli_z

S2 = 1 / np.sqrt(2)
LOCAL = {
    "zeros": np.array([1, 0], dtype=complex),
    "ones": np.array([0, 1], dtype=complex),
    "x+": np.array([S2, S2], dtype=complex),
    "x-": np.array([S2, -S2], dtype=complex),
    "y+": np.array([S2, 1j * S2], dtype=complex),
    "y-": np.array([S2, -1j * S2], dtype=complex),
}


def product_vec(locals_per_site):
    """Dense product state, site 0 least significant."""
    psi = np.ones(1, dtype=complex)
    for v in locals_per_site:  # site 0 first -> kron new site on the LEFT
        psi = np.kron(v, psi)
    return psi


def random_state(seed, length):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=2**length) + 1j * rng.normal(size=2**length)
    return psi / np.linalg.norm(psi)


# ---------------------------------------------------------------------------
# Presets and conversions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(LOCAL))
def test_preset_product_states_to_vec(name):
    L = 4
    m = MPS(L, state=name, chi=4)
    np.testing.assert_allclose(m.to_vec(), product_vec([LOCAL[name]] * L), atol=1e-12)
    np.testing.assert_allclose(m.norm(), 1.0, atol=1e-12)


def test_neel_and_wall_presets():
    L = 5
    np.testing.assert_allclose(
        MPS(L, state="Neel").to_vec(),
        product_vec([LOCAL["zeros" if i % 2 == 0 else "ones"] for i in range(L)]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        MPS(L, state="wall").to_vec(),
        product_vec([LOCAL["zeros" if i < L // 2 else "ones"] for i in range(L)]),
        atol=1e-12,
    )


def test_basis_string_preset():
    L = 5
    m = MPS(L, state="basis", chi=2, basis_string="01101")
    idx = int(np.argmax(np.abs(m.to_vec())))
    assert idx == 0b10110  # site 0 = first char, least significant


def test_random_product_preset_is_normalized_product():
    m = MPS(4, state="random", chi=4)
    v = m.to_vec()
    np.testing.assert_allclose(np.vdot(v, v).real, 1.0, atol=1e-10)
    # product state: all bond entropies vanish
    m.normalize()
    for b in range(3):
        assert m.get_entropy(b) < 1e-10


def test_haar_random_preset_is_entangled_and_normalized():
    m = MPS(4, state="haar-random", chi=4)
    np.testing.assert_allclose(m.norm(), 1.0, atol=1e-8)
    m2 = MPS(4, state="haar-random", chi=4)
    # two draws differ
    assert abs(np.vdot(m.to_vec(), m2.to_vec())) < 0.999


def test_explicit_ragged_tensor_construction():
    # ragged site tensors are padded into the uniform array
    a0 = np.zeros((2, 1, 2)); a0[0, 0, 0] = a0[1, 0, 1] = S2
    a1 = np.zeros((2, 2, 1)); a1[0, 0, 0] = a1[1, 1, 0] = 1.0
    m = MPS(tensors=[a0, a1])
    want = np.zeros(4, dtype=complex); want[0b00] = want[0b11] = S2
    np.testing.assert_allclose(m.to_vec(), want, atol=1e-12)
    assert m.length == 2 and m.chi >= 2


def test_qudit_product_state():
    m = MPS(3, state="basis", chi=2, physical_dimensions=3, basis_string="201")
    v = m.to_vec()
    assert v.shape == (27,)
    assert abs(v[2 + 0 * 3 + 1 * 9]) == 1.0


# ---------------------------------------------------------------------------
# Gauge / norms / scalar products
# ---------------------------------------------------------------------------


def test_normalize_returns_previous_norm():
    m = MPS(3, state="x+", chi=4)
    m.tensors = m.tensors * 1.7  # scale all sites
    nrm = m.normalize()
    scale_expected = 1.7**3
    np.testing.assert_allclose(nrm, scale_expected, rtol=1e-10)
    np.testing.assert_allclose(m.norm(), 1.0, atol=1e-10)


def test_canonical_form_preserves_state():
    psi = random_state(0, 4)
    m = _mps_of(psi)
    v0 = m.to_vec()
    m.set_canonical_form(0)
    np.testing.assert_allclose(m.to_vec(), v0, atol=1e-10)
    with pytest.raises(NotImplementedError):
        m.set_canonical_form(2)


def test_scalar_product_vs_dense():
    psi, phi = random_state(1, 4), random_state(2, 4)
    np.testing.assert_allclose(
        _mps_of(phi).scalar_product(_mps_of(psi)),
        np.vdot(phi, psi),
        atol=1e-10,
    )
    # self-overlap = norm^2
    np.testing.assert_allclose(
        _mps_of(psi).scalar_product(_mps_of(psi)), 1.0, atol=1e-10
    )


def _mps_of(psi, chi=8):
    length = int(np.log2(len(psi)))
    from yaqs_tpu.core import mps_ops
    import jax.numpy as jnp

    # dense -> exact MPS by sequential SVD (independent of the class code)
    t = np.zeros((length, 2, chi, chi), dtype=np.complex128)
    a = psi.reshape([2] * length).transpose(list(reversed(range(length))))
    left_dim = 1
    carry = a.reshape(2, -1)
    for i in range(length - 1):
        u, s, vh = np.linalg.svd(carry.reshape(left_dim * 2, -1), full_matrices=False)
        k = min(len(s), chi)
        t[i, :, :left_dim, :k] = u[:, :k].reshape(left_dim, 2, -1).transpose(1, 0, 2)
        carry = s[:k, None] * vh[:k]
        left_dim = k
        carry = carry.reshape(left_dim * 2, -1) if i < length - 2 else carry
    t[length - 1, :, :left_dim, :1] = carry.reshape(left_dim, 2, 1).transpose(1, 0, 2)
    m = MPS(tensors=t)
    np.testing.assert_allclose(m.to_vec(), psi, atol=1e-10)
    return m


# ---------------------------------------------------------------------------
# Expectations
# ---------------------------------------------------------------------------


def test_expect_all_paulis_vs_dense():
    psi = random_state(3, 4)
    m = _mps_of(psi)
    for i in range(4):
        for name, op in (("x", pauli_x), ("y", pauli_y), ("z", pauli_z)):
            want = np.real(np.vdot(psi, embed_one_site(op, i, 4) @ psi))
            np.testing.assert_allclose(m.expect(op, i), want, atol=1e-9, err_msg=f"{name}{i}")


def test_local_expect_unnormalized():
    # local_expect expects the canonical-at-0 gauge (the engines' invariant)
    # with an arbitrary site-0 norm factor
    psi = random_state(4, 3)
    m = _mps_of(psi)
    m.normalize()  # canonical at 0, unit norm
    m.tensors = m.tensors.copy()
    m.tensors[0] = m.tensors[0] * 1.3  # gauge-preserving global scale
    want = 1.3**2 * np.vdot(psi, embed_one_site(pauli_z, 1, 3) @ psi)
    np.testing.assert_allclose(m.local_expect(pauli_z, 1), want, rtol=1e-8)


def test_mixed_expectation_vs_dense():
    psi, phi = random_state(5, 3), random_state(6, 3)
    want = np.vdot(phi, embed_one_site(pauli_x, 2, 3) @ psi)
    got = _mps_of(psi).mixed_expectation(_mps_of(phi), pauli_x, 2)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_mixed_expectation_two_site_vs_dense():
    """Two-site observables follow apply_local conventions (reference
    mixed_expectation, mps.py:1157-1172, accepts one- or two-site ops)."""
    L = 4
    psi, phi = random_state(5, L), random_state(6, L)
    op4 = np.kron(pauli_x, pauli_z) + 0.3 * np.kron(pauli_z, pauli_x)

    class _Obs:
        site_list = [1, 2]
        matrix = op4

    dense = (
        embed_one_site(pauli_x, 1, L) @ embed_one_site(pauli_z, 2, L)
        + 0.3 * embed_one_site(pauli_z, 1, L) @ embed_one_site(pauli_x, 2, L)
    )
    want = np.vdot(phi, dense @ psi)
    got = _mps_of(psi).mixed_expectation(_mps_of(phi), _Obs())
    np.testing.assert_allclose(got, want, atol=1e-9)

    # non-adjacent, explicit sites tuple (SWAP routing path)
    class _ObsFar:
        site_list = [0, 3]
        matrix = op4

    dense_far = (
        embed_one_site(pauli_x, 0, L) @ embed_one_site(pauli_z, 3, L)
        + 0.3 * embed_one_site(pauli_z, 0, L) @ embed_one_site(pauli_x, 3, L)
    )
    want_far = np.vdot(phi, dense_far @ psi)
    got_far = _mps_of(psi).mixed_expectation(_mps_of(phi), _ObsFar())
    np.testing.assert_allclose(got_far, want_far, atol=1e-9)


# ---------------------------------------------------------------------------
# apply_local edge cases
# ---------------------------------------------------------------------------


def test_apply_local_one_site_all_positions():
    psi = random_state(7, 4)
    for site in range(4):
        m = _mps_of(psi)
        m.apply_local(pauli_y, site)
        np.testing.assert_allclose(
            m.to_vec(), embed_one_site(pauli_y, site, 4) @ psi, atol=1e-9
        )


def test_apply_local_nonunitary():
    psi = random_state(8, 3)
    proj = np.array([[1, 0], [0, 0]], dtype=complex)
    m = _mps_of(psi)
    m.apply_local(proj, 1)
    np.testing.assert_allclose(m.to_vec(), embed_one_site(proj, 1, 3) @ psi, atol=1e-9)


def test_apply_local_two_site_orderings():
    """(i, j) with i < j, i > j, adjacent and distant, plus periodic wrap."""
    L = 5
    psi = random_state(9, L)
    cx = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)

    def dense_two(op4, i, j):
        a = psi.reshape([2] * L)
        ax_i, ax_j = L - 1 - i, L - 1 - j
        t = op4.reshape(2, 2, 2, 2)
        out = np.tensordot(t, a, axes=([2, 3], [ax_i, ax_j]))
        return np.moveaxis(out, [0, 1], [ax_i, ax_j]).reshape(-1)

    for (i, j) in [(0, 1), (1, 0), (0, 3), (3, 0), (2, 4), (4, 2), (0, 4), (4, 0)]:
        m = _mps_of(psi)
        m.apply_local(cx, (i, j))
        np.testing.assert_allclose(
            m.to_vec(), dense_two(cx, i, j), atol=1e-8, err_msg=f"({i},{j})"
        )


def test_apply_local_rejects_bad_sites():
    m = MPS(3, state="zeros", chi=4)
    with pytest.raises(ValueError):
        m.apply_local(pauli_x, 7)
    with pytest.raises(ValueError):
        m.apply_local(np.eye(4), (0, 5))


# ---------------------------------------------------------------------------
# Measurement
# ---------------------------------------------------------------------------


def test_measure_shots_statistics_match_born():
    # biased single qubit embedded in a chain
    theta = 0.7
    local = np.array([np.cos(theta), np.sin(theta)], dtype=complex)
    m = MPS(tensors=[
        local.reshape(2, 1, 1),
        LOCAL["zeros"].reshape(2, 1, 1),
    ])
    shots = 6000
    counts = m.measure_shots(shots, seed=1)
    p1 = sum(c for k, c in counts.items() if k & 1) / shots
    want = np.sin(theta) ** 2
    assert abs(p1 - want) < 5 * np.sqrt(want * (1 - want) / shots) + 0.01


def test_measure_shots_deterministic_for_basis_state():
    m = MPS(4, state="basis", chi=2, basis_string="1011")
    counts = m.measure_shots(64, seed=2)
    assert counts == {0b1101: 64}


def test_measure_single_shot_returns_int():
    out = MPS(3, state="Neel", chi=2).measure_single_shot(seed=3)
    assert out == 0b010  # Neel = |0 1 0>, site 0 least significant


def test_in_place_measure_collapses_and_normalizes():
    psi = random_state(10, 3)
    m = _mps_of(psi)
    rng = np.random.default_rng(0)
    outcome = m.measure(1, "Z", rng=rng)
    v = m.to_vec()
    np.testing.assert_allclose(np.vdot(v, v).real, 1.0, atol=1e-9)
    # post-measurement state has site 1 in |outcome> exactly
    proj = np.zeros((2, 2)); proj[1 - outcome, 1 - outcome] = 1.0
    np.testing.assert_allclose(
        np.linalg.norm(embed_one_site(proj, 1, 3) @ v), 0.0, atol=1e-9
    )


def test_measure_statistics_match_born_rule():
    psi = random_state(11, 3)
    m0 = _mps_of(psi)
    p1_want = float(np.real(np.vdot(psi, embed_one_site(np.diag([0.0, 1.0]), 0, 3) @ psi)))
    rng = np.random.default_rng(5)
    n = 400
    hits = sum(_mps_of(psi).measure(0, "Z", rng=rng) for _ in range(n))
    assert abs(hits / n - p1_want) < 5 * np.sqrt(p1_want * (1 - p1_want) / n) + 0.01


def test_project_onto_bitstring():
    psi = random_state(12, 3)
    m = _mps_of(psi)
    for idx, bits in [(0b000, "000"), (0b101, "101"), (0b110, "011")]:
        np.testing.assert_allclose(
            m.project_onto_bitstring(bits), abs(psi[idx]) ** 2, atol=1e-10
        )


def test_measure_invalid_inputs():
    m = MPS(3, state="zeros", chi=4)
    with pytest.raises(ValueError):
        m.measure(5)
    with pytest.raises(ValueError):
        m.measure(0, basis="Q")


# ---------------------------------------------------------------------------
# Entropy / Schmidt
# ---------------------------------------------------------------------------


def test_entropy_of_known_states():
    # product state: 0 everywhere; Bell pair across the cut: ln 2
    m = MPS(4, state="x+", chi=4)
    m.normalize()
    for b in range(3):
        np.testing.assert_allclose(m.get_entropy(b), 0.0, atol=1e-10)
    bell = np.zeros(4, dtype=complex); bell[0b00] = bell[0b11] = S2
    np.testing.assert_allclose(_mps_of(bell).get_entropy(0), np.log(2), atol=1e-9)


def test_schmidt_spectrum_vs_dense_svd():
    psi = random_state(13, 4)
    m = _mps_of(psi)
    m.normalize()
    for bond in range(3):
        spec = np.sort(m.get_schmidt_spectrum(bond))[::-1]
        # dense Schmidt: reshape with sites <= bond as one index.
        # statevector index = sum_s b_s 2^s -> fast axis = low sites
        a = psi.reshape(2 ** (4 - bond - 1), 2 ** (bond + 1))  # (high, low)
        s = np.linalg.svd(a, compute_uv=False)
        s_full = np.zeros_like(spec)
        s_full[: len(s)] = np.sort(s)[::-1][: len(spec)]
        np.testing.assert_allclose(spec, s_full, atol=1e-9)


# ---------------------------------------------------------------------------
# Compression / padding / cost diagnostics
# ---------------------------------------------------------------------------


def test_compress_truncates_and_preserves_dominant_state():
    # a weakly entangled state compresses to chi=1 near the product part
    psi = random_state(14, 3)
    base = product_vec([LOCAL["x+"]] * 3)
    mix = 0.99 * base + 0.01 * psi
    mix /= np.linalg.norm(mix)
    m = _mps_of(mix)
    m.compress(threshold=0.05, max_bond_dim=8)
    v = m.to_vec()
    v /= np.linalg.norm(v)
    assert abs(np.vdot(v, mix)) > 0.99


def test_pad_bond_dimension_is_exact():
    psi = random_state(15, 3)
    m = _mps_of(psi, chi=4)
    m.pad_bond_dimension(16)
    assert m.chi == 16
    np.testing.assert_allclose(m.to_vec(), psi, atol=1e-10)


def test_cost_diagnostics():
    m = MPS(5, state="zeros", chi=8)
    assert m.get_max_bond() == 8
    assert m.get_total_bond() == 8 * 4
    assert m.get_cost() == 4 * 8**3


def test_copy_is_independent():
    m = MPS(3, state="x+", chi=4)
    c = m.copy()
    c.apply_local(pauli_z, 0)  # Z|+> = |->
    assert not np.allclose(m.to_vec(), c.to_vec())
    np.testing.assert_allclose(m.to_vec(), product_vec([LOCAL["x+"]] * 3), atol=1e-12)
