"""MPO factory/operation depth tests vs dense oracles.

Mirrors /root/reference/tests/core/data_structures/test_mpo.py behaviors not
yet covered elsewhere: bose_hubbard / coupled_transmon / fermi_hubbard dense
parity (:399-648), from_matrix roundtrip (:738), rotate (:924), MPO x MPO
dense product (:981), identity preservation (:968), check_if_identity
(:951, 1143), pauli factory validation (:1150-1196), trivial Schmidt cut
(:844), and two-site partial traces (:1413). Oracles are independently
constructed dense matrices (site 0 least significant in kron order).
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.core.mpo import MPO
from yaqs_tpu.core.mps import MPS
from yaqs_tpu.models.operators import PAULI


def kron_chain(ops):
    """Dense kron with site 0 least significant (ops listed site 0 first)."""
    m = np.array([[1.0 + 0j]])
    for o in ops:
        m = np.kron(o, m)
    return m


def embed(op, site, length, d=2):
    ops = [np.eye(d)] * length
    ops[site] = op
    return kron_chain(ops)


def destroy(d):
    a = np.zeros((d, d), dtype=complex)
    for n in range(1, d):
        a[n - 1, n] = np.sqrt(n)
    return a


# -- factory dense parity -----------------------------------------------------------


def test_bose_hubbard_dense_parity():
    L, d, omega, J, U = 3, 3, 0.7, 0.4, 1.1
    a = destroy(d)
    ad = a.conj().T
    n = ad @ a
    h = np.zeros((d**L, d**L), dtype=complex)
    for i in range(L):
        h += omega * embed(n, i, L, d)
        h += 0.5 * U * embed(n @ (n - np.eye(d)), i, L, d)
    for i in range(L - 1):
        ops = [np.eye(d)] * L
        ops[i], ops[i + 1] = ad, a
        h += -J * kron_chain(ops)
        ops[i], ops[i + 1] = a, ad
        h += -J * kron_chain(ops)
    mpo = MPO.bose_hubbard(L, d, omega, J, U)
    np.testing.assert_allclose(mpo.to_matrix(), h, atol=1e-12)


def test_coupled_transmon_dense_parity():
    # qubit (d=2) - resonator (d=3) - qubit chain, padded to d=3
    L, dq, dr = 3, 2, 3
    wq, wr, alpha, g = 5.0, 6.1, -0.3, 0.08
    mpo = MPO.coupled_transmon(L, dq, dr, wq, wr, alpha, g)
    d = max(dq, dr)

    def pad(m, dim):
        out = np.zeros((d, d), dtype=complex)
        out[:dim, :dim] = m
        return out

    aq, ar = destroy(dq), destroy(dr)
    nq, nr = aq.conj().T @ aq, ar.conj().T @ ar
    hq = wq * nq + 0.5 * alpha * (nq @ (nq - np.eye(dq)))
    hr = wr * nr
    xq, xr = aq + aq.conj().T, ar + ar.conj().T

    h = np.zeros((d**L, d**L), dtype=complex)
    h += embed(pad(hq, dq), 0, L, d) + embed(pad(hr, dr), 1, L, d)
    h += embed(pad(hq, dq), 2, L, d)
    h += g * kron_chain([pad(xq, dq), pad(xr, dr), np.eye(d)])
    h += g * kron_chain([np.eye(d), pad(xr, dr), pad(xq, dq)])
    np.testing.assert_allclose(mpo.to_matrix(), h, atol=1e-12)


def test_fermi_hubbard_composite_dense_parity():
    L, t, u = 2, 0.8, 1.3
    mpo = MPO.fermi_hubbard_1d(L, t, u)
    c = np.array([[0, 1], [0, 0]], dtype=complex)
    eye2 = np.eye(2)
    c_up, c_dn = np.kron(c, eye2), np.kron(eye2, c)
    n_up = c_up.conj().T @ c_up
    n_dn = c_dn.conj().T @ c_dn
    d = 4
    h = np.zeros((d**L, d**L), dtype=complex)
    for i in range(L):
        h += u * embed(n_up @ n_dn, i, L, d)
    for i in range(L - 1):
        for op in (c_up, c_dn):
            ops = [np.eye(d)] * L
            ops[i], ops[i + 1] = op.conj().T, op
            h += -t * kron_chain(ops)
            ops[i], ops[i + 1] = op, op.conj().T
            h += -t * kron_chain(ops)
    np.testing.assert_allclose(mpo.to_matrix(), h, atol=1e-12)


def test_fermi_hubbard_cross_representation_onsite():
    """Composite and Jordan-Wigner onsite (t=0) operators agree
    (reference test_mpo.py:636-648)."""
    u = 0.5
    for length in (1, 2, 3):
        h_ferm = MPO.fermi_hubbard_1d(length, 0.0, u).to_matrix()
        h_jw = MPO.fermi_hubbard_1d(2 * length, 0.0, u, jordan_wigner=True).to_matrix()
        np.testing.assert_allclose(h_ferm, h_jw, atol=1e-10)


def test_fermi_hubbard_jw_hopping_spectrum():
    """JW hopping spectrum matches the composite fermionic chain's (the
    representations are related by an orbital permutation + JW unitary, so
    eigenvalues agree even though matrices differ)."""
    t, u = 0.6, 0.9
    for num_sites in (2, 3):
        ev_f = np.linalg.eigvalsh(MPO.fermi_hubbard_1d(num_sites, t, u).to_matrix())
        ev_jw = np.linalg.eigvalsh(
            MPO.fermi_hubbard_1d(2 * num_sites, t, u, jordan_wigner=True).to_matrix()
        )
        np.testing.assert_allclose(np.sort(ev_f), np.sort(ev_jw), atol=1e-10)


# -- from_matrix / rotate / multiply -------------------------------------------------


def test_from_matrix_roundtrip_random_hermitian():
    rng = np.random.default_rng(5)
    L, d = 3, 2
    dim = d**L
    m = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    m = m + m.conj().T
    mpo = MPO.from_matrix(m, L, d)
    np.testing.assert_allclose(mpo.to_matrix(), m, atol=1e-10)


def test_from_matrix_qutrit_roundtrip():
    rng = np.random.default_rng(6)
    L, d = 2, 3
    dim = d**L
    m = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    mpo = MPO.from_matrix(m, L, d)
    np.testing.assert_allclose(mpo.to_matrix(), m, atol=1e-10)


def test_rotate_is_adjoint():
    mpo = MPO.ising(3, 1.0, 0.4)
    rng = np.random.default_rng(0)
    m = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    non_herm = MPO.from_matrix(m, 3)
    np.testing.assert_allclose(
        non_herm.rotate().to_matrix(), m.conj().T, atol=1e-10
    )
    np.testing.assert_allclose(mpo.rotate().to_matrix(), mpo.to_matrix(), atol=1e-10)


def test_multiply_mpo_matches_dense_product():
    a = MPO.ising(3, 1.0, 0.3)
    b = MPO.heisenberg(3, 0.2, 0.4, 0.6, 0.1)
    prod = a.multiply(b)
    np.testing.assert_allclose(
        prod.to_matrix(), a.to_matrix() @ b.to_matrix(), atol=1e-10
    )


def test_multiply_mps_identity_preserves_state():
    mps = MPS(3, state="y+")
    out = MPO.identity(3).multiply(mps)
    psi_in, psi_out = mps.to_vec(), out.to_vec()
    phase = np.vdot(psi_in, psi_out)
    np.testing.assert_allclose(psi_out, psi_in * phase / abs(phase), atol=1e-10)


# -- identity checks ----------------------------------------------------------------


def test_check_if_identity_threshold():
    ident = MPO.identity(4)
    assert ident.check_if_identity(0.999)
    assert not MPO.ising(4, 1.0, 0.7).check_if_identity(0.999)


def test_check_if_identity_non_qubit_dimension():
    ident = MPO.identity(3, d=3)
    assert ident.check_if_identity(0.999)
    np.testing.assert_allclose(ident.compute_identity_fidelity(), 1.0, atol=1e-10)


# -- pauli factory -------------------------------------------------------------------


def test_pauli_factory_matches_dense():
    L = 4
    mpo = MPO.pauli(
        L, two_body=[(0.5, "X", "X"), (-0.25, "Z", "Z")], one_body=[(0.3, "Y")]
    )
    h = np.zeros((2**L, 2**L), dtype=complex)
    for i in range(L - 1):
        h += 0.5 * embed(PAULI["X"], i, L) @ embed(PAULI["X"], i + 1, L)
        h += -0.25 * embed(PAULI["Z"], i, L) @ embed(PAULI["Z"], i + 1, L)
    for i in range(L):
        h += 0.3 * embed(PAULI["Y"], i, L)
    np.testing.assert_allclose(mpo.to_matrix(), h, atol=1e-12)


def test_pauli_factory_periodic_adds_wrap_bond():
    L = 4
    mpo = MPO.pauli(L, two_body=[(1.0, "Z", "Z")], bc="periodic")
    h = np.zeros((2**L, 2**L), dtype=complex)
    for i in range(L):
        j = (i + 1) % L
        h += embed(PAULI["Z"], i, L) @ embed(PAULI["Z"], j, L)
    np.testing.assert_allclose(mpo.to_matrix(), h, atol=1e-12)


def test_pauli_factory_normalizes_case():
    a = MPO.pauli(3, one_body=[(1.0, "x")])
    b = MPO.pauli(3, one_body=[(1.0, "X")])
    np.testing.assert_allclose(a.to_matrix(), b.to_matrix(), atol=1e-14)


def test_pauli_factory_validation():
    with pytest.raises(ValueError, match="positive"):
        MPO.pauli(0, one_body=[(1.0, "X")])
    with pytest.raises(ValueError, match="bc"):
        MPO.pauli(3, one_body=[(1.0, "X")], bc="twisted")
    with pytest.raises(ValueError, match="Invalid operator"):
        MPO.pauli(3, one_body=[(1.0, "Q")])
    with pytest.raises(ValueError, match="Invalid operator"):
        MPO.pauli(3, two_body=[(1.0, "Q", "X")])
    with pytest.raises(ValueError, match="Invalid operator"):
        MPO.pauli(3, two_body=[(1.0, "X", "Q")])


# -- Schmidt / partial trace ---------------------------------------------------------


def test_schmidt_spectrum_reference_cut_contract():
    """Boundary cuts return [Frobenius norm] with zero entropy; internal cuts
    of a product operator return one value = the Frobenius norm; invalid cuts
    raise (reference test_mpo.py:844-877)."""
    mpo = MPO.ising(4, 1.0, 0.7)
    fro = np.linalg.norm(mpo.to_matrix(), ord="fro")
    np.testing.assert_allclose(mpo.compute_schmidt_spectrum(0), [fro], atol=1e-8)
    np.testing.assert_allclose(
        mpo.compute_schmidt_spectrum(mpo.length), [fro], atol=1e-8
    )
    assert mpo.compute_entanglement_entropy(0) == pytest.approx(0.0, abs=1e-12)
    assert mpo.compute_entanglement_entropy(mpo.length) == pytest.approx(
        0.0, abs=1e-12
    )
    # internal cut: unnormalized values square-sum to the Frobenius norm
    s = mpo.compute_schmidt_spectrum(2)
    np.testing.assert_allclose(np.sqrt(np.sum(s**2)), fro, atol=1e-6)

    prod = MPO.from_terms([(2.0, [(0, PAULI["X"]), (1, PAULI["Z"])])], 3)
    for cut in (1, 2):
        s = prod.compute_schmidt_spectrum(cut)
        s = s[s > 1e-12 * s[0]]
        assert s.size == 1
        np.testing.assert_allclose(
            s[0], np.linalg.norm(prod.to_matrix(), ord="fro"), atol=1e-8
        )
        assert prod.compute_entanglement_entropy(cut) == pytest.approx(0.0, abs=1e-10)

    for bad, exc in ((True, TypeError), ("left", TypeError), (-1, ValueError), (5, ValueError)):
        with pytest.raises(exc):
            mpo.compute_schmidt_spectrum(bad)
    for bad_base in (0.0, 1.0, -2.0, float("nan")):
        with pytest.raises(ValueError, match="base"):
            mpo.compute_entanglement_entropy(1, base=bad_base)


def test_partial_trace_sites_two_site_operator():
    mpo = MPO.heisenberg(4, 0.3, 0.5, 0.9, 0.2)
    dense = mpo.to_matrix()
    reduced = mpo.partial_trace_sites([1, 2])
    # oracle: trace out sites 0 and 3 of the dense operator
    t = dense.reshape([2] * 8)
    # axis order from kron (site 0 least significant): rows (s3,s2,s1,s0)
    red = np.einsum("aijbaklb->ijkl", t.reshape(2, 2, 2, 2, 2, 2, 2, 2))
    red_m = red.reshape(4, 4)
    got = reduced.to_matrix() if hasattr(reduced, "to_matrix") else np.asarray(reduced)
    np.testing.assert_allclose(got, red_m, atol=1e-10)
