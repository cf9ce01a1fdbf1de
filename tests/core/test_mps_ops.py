"""MPS functional-core invariants, validated against dense state vectors."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from yaqs_tpu.core import mps_ops
from yaqs_tpu.models.operators import pauli_x, pauli_z


def random_mps_np(length, d, chi, rng, bond=None):
    """Random padded MPS with active bond dimension ``bond`` (zero padding)."""
    bond = bond or chi
    tensors = np.zeros((length, d, chi, chi), dtype=np.complex128)
    dims = [1] + [min(bond, d ** min(i + 1, length - i - 1), chi) for i in range(length - 1)] + [1]
    for i in range(length):
        dl, dr = dims[i], dims[i + 1]
        block = rng.normal(size=(d, dl, dr)) + 1j * rng.normal(size=(d, dl, dr))
        tensors[i, :, :dl, :dr] = block
    return tensors


def dense_from_np(tensors):
    return np.asarray(mps_ops.to_statevector(jnp.asarray(tensors)))


def test_product_state_statevector():
    t = mps_ops.named_product_state("Neel", 4, chi=3)
    psi = dense_from_np(t)
    # Neel = |0101> with site 0 least significant: index = 0*1+1*2+0*4+1*8 = 10
    expected = np.zeros(16)
    expected[0b1010] = 1.0
    np.testing.assert_allclose(psi, expected, atol=1e-14)


def test_norm_and_scalar_product_match_dense(seed):
    rng = np.random.default_rng(seed)
    t = random_mps_np(5, 2, 4, rng, bond=3)
    psi = dense_from_np(t)
    tj = jnp.asarray(t)
    np.testing.assert_allclose(
        float(mps_ops.norm_squared(tj)), np.vdot(psi, psi).real, rtol=1e-12
    )
    t2 = random_mps_np(5, 2, 4, rng, bond=3)
    phi = dense_from_np(t2)
    np.testing.assert_allclose(
        complex(mps_ops.scalar_product(tj, jnp.asarray(t2))), np.vdot(psi, phi), rtol=1e-12
    )


def test_canonicalize_right_preserves_state_and_gauges(seed):
    rng = np.random.default_rng(seed)
    t = random_mps_np(6, 2, 4, rng, bond=4)
    psi = dense_from_np(t)
    canon = mps_ops.canonicalize_right(jnp.asarray(t))
    psi2 = np.asarray(mps_ops.to_statevector(canon))
    np.testing.assert_allclose(psi2, psi, atol=1e-10)
    # center-0 norm formula agrees with the full contraction
    np.testing.assert_allclose(
        float(mps_ops.norm_squared_center0(canon)), np.vdot(psi, psi).real, rtol=1e-10
    )


def test_normalize_canonical(seed):
    rng = np.random.default_rng(seed)
    t = random_mps_np(4, 2, 4, rng)
    canon, nrm = mps_ops.normalize_canonical(jnp.asarray(t))
    psi = dense_from_np(t)
    np.testing.assert_allclose(float(nrm), np.linalg.norm(psi), rtol=1e-10)
    np.testing.assert_allclose(float(mps_ops.norm_squared(canon)), 1.0, rtol=1e-10)


def embed_one_site(op, site, length):
    """Dense embedding with site 0 least significant."""
    m = np.array([[1.0]])
    for i in range(length):
        o = op if i == site else np.eye(2)
        m = np.kron(o, m)  # site i more significant than previous
    return m


def test_site_expectations_match_dense(seed):
    rng = np.random.default_rng(seed)
    t = random_mps_np(5, 2, 4, rng, bond=3)
    canon, _ = mps_ops.normalize_canonical(jnp.asarray(t))
    psi = np.asarray(mps_ops.to_statevector(canon))
    ops = jnp.asarray(np.stack([pauli_z, pauli_x, pauli_z]))
    sites = jnp.asarray([0, 2, 4])
    vals = np.asarray(mps_ops.site_expectations(canon, ops, sites))
    for k, (op, s) in enumerate([(pauli_z, 0), (pauli_x, 2), (pauli_z, 4)]):
        expected = np.vdot(psi, embed_one_site(op, s, 5) @ psi)
        np.testing.assert_allclose(vals[k], expected, atol=1e-10)


def test_all_site_expectations(seed):
    rng = np.random.default_rng(seed)
    t = random_mps_np(4, 2, 4, rng)
    canon, _ = mps_ops.normalize_canonical(jnp.asarray(t))
    psi = np.asarray(mps_ops.to_statevector(canon))
    vals = np.asarray(mps_ops.all_site_expectations(canon, jnp.asarray(pauli_z)))
    for s in range(4):
        expected = np.vdot(psi, embed_one_site(pauli_z, s, 4) @ psi)
        np.testing.assert_allclose(vals[s], expected, atol=1e-10)


def test_apply_one_site_operator(seed):
    rng = np.random.default_rng(seed)
    t = random_mps_np(4, 2, 3, rng)
    psi = dense_from_np(t)
    t2 = mps_ops.apply_one_site_operator(jnp.asarray(t), jnp.asarray(pauli_x), 2)
    psi2 = np.asarray(mps_ops.to_statevector(t2))
    np.testing.assert_allclose(psi2, embed_one_site(pauli_x, 2, 4) @ psi, atol=1e-12)


def test_bond_entropy_bell_pair():
    # |00> + |11> across the middle bond of a 2-site chain: entropy = ln 2
    t = np.zeros((2, 2, 4, 4), dtype=np.complex128)
    t[0, 0, 0, 0] = 1 / np.sqrt(2)
    t[0, 1, 0, 1] = 1 / np.sqrt(2)
    t[1, 0, 0, 0] = 1.0
    t[1, 1, 1, 0] = 1.0
    ents = np.asarray(mps_ops.bond_entropies(jnp.asarray(t)))
    np.testing.assert_allclose(ents[0], np.log(2), atol=1e-12)


def test_basis_and_haar_random_presets():
    t = mps_ops.named_product_state("basis", 4, chi=2, basis_string="0110")
    psi = dense_from_np(t)
    idx = 0b0110  # site 0 least significant: "0110" -> s0=0,s1=1,s2=1,s3=0 = 6
    assert abs(psi[6]) == 1.0

    rng = np.random.default_rng(0)
    t = mps_ops.named_product_state("haar-random", 5, chi=4, rng=rng)
    tj = jnp.asarray(t)
    n2 = float(mps_ops.norm_squared(tj))
    np.testing.assert_allclose(n2, 1.0, atol=1e-10)  # isometries -> normalized
    canon, _ = mps_ops.normalize_canonical(tj)
    ents = np.asarray(mps_ops.bond_entropies(canon))
    assert ents.max() > 0.1  # genuinely entangled


# -- reference-surface additions (bond_dimensions / validity / equality) -----------


def test_bond_dimensions_product_vs_entangled():
    from yaqs_tpu.core.mps import MPS

    prod = MPS(4, state="x+", chi=8)
    assert prod.bond_dimensions() == [1, 1, 1]
    bell = np.zeros(4, dtype=complex)
    bell[0] = bell[3] = 1 / np.sqrt(2)
    ghz = np.zeros(8, dtype=complex)
    ghz[0] = ghz[7] = 1 / np.sqrt(2)
    from yaqs_tpu.core import mps_ops as ops

    t = ops.statevector_to_mps(ghz, 3, 4, 2)
    m = MPS(tensors=t)
    assert m.bond_dimensions() == [2, 2]


def test_check_if_valid_mps_and_canonical_form():
    from yaqs_tpu.core.mps import MPS

    m = MPS(3, state="y-", chi=4)
    assert m.check_if_valid_mps()
    m.normalize()
    assert m.check_canonical_form()
    bad = MPS(tensors=np.full((3, 2, 4, 4), np.nan, dtype=complex))
    assert not bad.check_if_valid_mps()


def test_almost_equal_up_to_global_phase():
    from yaqs_tpu.core.mps import MPS

    a = MPS(3, state="x+", chi=4)
    b = MPS(3, state="x+", chi=4)
    b.tensors = np.asarray(b.tensors) * np.exp(0.7j) ** (1 / 3)
    a.normalize()
    b.normalize()
    assert a.almost_equal(b)
    c = MPS(3, state="zeros", chi=4)
    c.normalize()
    assert not a.almost_equal(c)
