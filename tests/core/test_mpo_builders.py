"""MPO FSM builder validated against dense Hamiltonian construction."""

from __future__ import annotations

import numpy as np

from yaqs_tpu.core.mpo_builders import (
    heisenberg_mpo,
    identity_mpo,
    ising_mpo,
    mpo_from_pauli_sum,
    mpo_from_terms,
    mpo_to_matrix,
)
from yaqs_tpu.models.operators import PAULI


def dense_pauli_string(term, length):
    """Dense operator for [(site, label)] with site 0 least significant."""
    m = np.array([[1.0 + 0j]])
    op_at = dict(term)
    for i in range(length):
        o = PAULI[op_at[i]] if i in op_at else np.eye(2)
        m = np.kron(o, m)
    return m


def dense_sum(terms, length):
    h = np.zeros((2**length, 2**length), dtype=complex)
    for coeff, ops in terms:
        h += coeff * dense_pauli_string(ops, length)
    return h


def test_ising_dense_parity():
    L, J, g = 5, 1.0, 0.7
    w = ising_mpo(L, J, g)
    terms = [(-J, [(i, "Z"), (i + 1, "Z")]) for i in range(L - 1)]
    terms += [(-g, [(i, "X")]) for i in range(L)]
    np.testing.assert_allclose(mpo_to_matrix(w), dense_sum(terms, L), atol=1e-12)
    assert w.shape[3] == 3  # optimal TFIM bond dimension


def test_heisenberg_dense_parity():
    L = 4
    w = heisenberg_mpo(L, 0.3, 0.5, 0.9, h=0.2)
    terms = []
    for c, p in ((-0.3, "X"), (-0.5, "Y"), (-0.9, "Z")):
        terms += [(c, [(i, p), (i + 1, p)]) for i in range(L - 1)]
    terms += [(-0.2, [(i, "Z")]) for i in range(L)]
    np.testing.assert_allclose(mpo_to_matrix(w), dense_sum(terms, L), atol=1e-12)
    assert w.shape[3] == 5  # optimal Heisenberg bond dimension


def test_long_range_and_suffix_sharing():
    L = 6
    # Two long-range terms sharing the suffix Z5 -> automaton must share a state
    terms = [(0.5, [(0, "X"), (5, "Z")]), (0.25, [(1, "Y"), (5, "Z")]), (1.0, [(2, "Z")])]
    w = mpo_from_terms(terms, L)
    np.testing.assert_allclose(mpo_to_matrix(w), dense_sum(terms, L), atol=1e-12)


def test_pauli_string_format():
    L = 3
    w = mpo_from_pauli_sum([(0.5, "X0 Z2"), (-1.0, "Y1")], L)
    terms = [(0.5, [(0, "X"), (2, "Z")]), (-1.0, [(1, "Y")])]
    np.testing.assert_allclose(mpo_to_matrix(w), dense_sum(terms, L), atol=1e-12)


def test_constant_term():
    L = 3
    w = mpo_from_terms([(2.5, []), (1.0, [(1, "Z")])], L)
    expected = 2.5 * np.eye(8) + dense_sum([(1.0, [(1, "Z")])], L)
    np.testing.assert_allclose(mpo_to_matrix(w), expected, atol=1e-12)


def test_identity_mpo():
    w = identity_mpo(4)
    np.testing.assert_allclose(mpo_to_matrix(w), np.eye(16), atol=1e-14)


def test_single_site_chain():
    w = mpo_from_terms([(0.5, [(0, "X")]), (1.0, [(0, "Z")])], 1)
    np.testing.assert_allclose(
        mpo_to_matrix(w), 0.5 * PAULI["X"] + PAULI["Z"], atol=1e-14
    )


def test_gap_identity_in_string():
    L = 4
    terms = [(1.3, [(0, "X"), (3, "X")])]
    w = mpo_from_terms(terms, L)
    np.testing.assert_allclose(mpo_to_matrix(w), dense_sum(terms, L), atol=1e-12)
