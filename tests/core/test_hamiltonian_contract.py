"""Hamiltonian data-structure contract tests.

Port of the reference behaviors in
/root/reference/tests/core/data_structures/test_hamiltonian.py: encoding
conversions (MPO <-> dense <-> sparse) with caching, validation, and the
simulator accepting every source representation.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.sparse as sp

from yaqs_tpu.core.hamiltonian import Hamiltonian
from yaqs_tpu.core.mpo_builders import mpo_to_matrix
from yaqs_tpu.models.operators import PAULI


def dense_ising(length: int, j: float, g: float) -> np.ndarray:
    def emb(ops):
        m = np.eye(1, dtype=complex)
        for i in range(length):
            m = np.kron(ops.get(i, np.eye(2)), m)
        return m

    h = np.zeros((2**length, 2**length), dtype=complex)
    for i in range(length - 1):
        h += -j * emb({i: PAULI["Z"], i + 1: PAULI["Z"]})
    for i in range(length):
        h += -g * emb({i: PAULI["X"]})
    return h


def test_requires_some_source():
    with pytest.raises(ValueError, match="requires"):
        Hamiltonian()


def test_rejects_nonsquare_matrix():
    with pytest.raises(ValueError, match="square"):
        Hamiltonian(matrix=np.ones((4, 8)))


def test_rejects_nonpositive_physical_dimension():
    with pytest.raises(ValueError, match="positive"):
        Hamiltonian(matrix=np.eye(4), d=0)


def test_rejects_inconsistent_length():
    with pytest.raises(ValueError, match="not d\\*\\*length"):
        Hamiltonian(matrix=np.eye(8), length=2)


def test_matrix_infers_length():
    h = Hamiltonian(matrix=np.eye(16))
    assert h.length == 4
    assert h.d == 2


def test_matrix_explicit_length_nonqubit():
    h = Hamiltonian(matrix=np.eye(9), length=2, d=3)
    assert h.length == 2
    assert h.d == 3


def test_sparse_init_and_conversions():
    dense = dense_ising(3, 1.0, 0.5)
    h = Hamiltonian(matrix=sp.csr_matrix(dense))
    assert h.length == 3
    np.testing.assert_allclose(h.ensure_matrix(), dense, atol=1e-12)
    # sparse is kept, not rebuilt
    assert sp.issparse(h.ensure_sparse())
    np.testing.assert_allclose(h.ensure_sparse().toarray(), dense, atol=1e-12)


def test_sparse_coo_converted_to_csr():
    dense = dense_ising(2, 1.0, 0.5)
    h = Hamiltonian(matrix=sp.coo_matrix(dense))
    assert h.ensure_sparse().format == "csr"


def test_ensure_mpo_from_dense():
    dense = dense_ising(3, 1.0, 0.7)
    h = Hamiltonian(matrix=dense)
    w = h.ensure_mpo()
    np.testing.assert_allclose(mpo_to_matrix(w), dense, atol=1e-10)


def test_ensure_mpo_from_sparse():
    dense = dense_ising(3, 0.8, 0.3)
    h = Hamiltonian(matrix=sp.csr_matrix(dense))
    w = h.ensure_mpo()
    np.testing.assert_allclose(mpo_to_matrix(w), dense, atol=1e-10)


def test_ensure_mpo_cached():
    h = Hamiltonian(matrix=dense_ising(2, 1.0, 0.5))
    w1 = h.ensure_mpo()
    w2 = h.ensure_mpo()
    assert w1 is w2


def test_ensure_sparse_from_mpo_cached():
    h = Hamiltonian.ising(4, 1.0, 0.5)
    s1 = h.ensure_sparse()
    s2 = h.ensure_sparse()
    assert s1 is s2
    np.testing.assert_allclose(s1.toarray(), dense_ising(4, 1.0, 0.5), atol=1e-12)


def test_cached_forms_survive_conversions():
    dense = dense_ising(3, 1.0, 0.5)
    h = Hamiltonian(matrix=dense)
    h.ensure_sparse()
    h.ensure_mpo()
    np.testing.assert_allclose(h.ensure_matrix(), dense, atol=1e-12)
    np.testing.assert_allclose(h.ensure_sparse().toarray(), dense, atol=1e-12)
    np.testing.assert_allclose(mpo_to_matrix(h.ensure_mpo()), dense, atol=1e-10)


def test_large_dense_factorization_warns(monkeypatch):
    import yaqs_tpu.core.hamiltonian as hmod

    monkeypatch.setattr(hmod, "_LARGE_DENSE_DIM", 4)
    h = Hamiltonian(matrix=dense_ising(3, 1.0, 0.5))
    with pytest.warns(RuntimeWarning, match="exponential"):
        h.ensure_mpo()


def test_large_sparse_densification_warns(monkeypatch):
    import yaqs_tpu.core.hamiltonian as hmod

    monkeypatch.setattr(hmod, "_LARGE_DENSE_DIM", 4)
    h = Hamiltonian(matrix=sp.csr_matrix(dense_ising(3, 1.0, 0.5)))
    with pytest.warns(RuntimeWarning, match="Densifying"):
        h.ensure_matrix()


def test_pauli_factory_validation():
    with pytest.raises(ValueError, match="positive"):
        Hamiltonian.pauli(0, one_body=[(1.0, "X")])
    with pytest.raises(ValueError, match="bc"):
        Hamiltonian.pauli(3, one_body=[(1.0, "X")], bc="twisted")


def test_pauli_factory_periodic_dense():
    L = 4
    h = Hamiltonian.pauli(L, two_body=[(-1.0, "Z", "Z")], bc="periodic")

    def emb(ops):
        m = np.eye(1, dtype=complex)
        for i in range(L):
            m = np.kron(ops.get(i, np.eye(2)), m)
        return m

    expect = np.zeros((16, 16), dtype=complex)
    for i in range(L):
        expect += -1.0 * emb({i: PAULI["Z"], (i + 1) % L: PAULI["Z"]})
    np.testing.assert_allclose(h.ensure_matrix(), expect, atol=1e-12)


def test_run_accepts_dense_hamiltonian_with_mps_state():
    # dense source + MPS representation: ensure_mpo conversion feeds the
    # TJM engine; compare to an analytic single-qubit-pair rotation via the
    # exact dense propagator oracle
    from yaqs_tpu import AnalogSimParams, Observable, Simulator
    from yaqs_tpu.core.state import State

    L = 3
    dense = dense_ising(L, 1.0, 0.5)
    ham = Hamiltonian(matrix=dense)
    params = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=0.4,
        dt=0.1,
        num_traj=1,
        max_bond_dim=8,
        sample_timesteps=True,
    )
    state = State(L, representation="mps")
    res = Simulator(parallel=False).run(state, ham, params, None)

    # dense oracle
    import scipy.linalg

    psi = np.zeros(2**L, dtype=complex)
    psi[0] = 1.0
    u = scipy.linalg.expm(-1j * dense * 0.1)
    zs = []
    for _ in range(5):
        zcol = []
        for i in range(L):
            zop = np.eye(1, dtype=complex)
            for k in range(L):
                zcol_op = PAULI["Z"] if k == i else np.eye(2)
                zop = np.kron(zcol_op, zop)
            zcol.append(np.real(np.vdot(psi, zop @ psi)))
        zs.append(zcol)
        psi = u @ psi
    oracle = np.asarray(zs).T  # (L, 5)
    got = np.stack([res.observable(i) for i in range(L)])
    np.testing.assert_allclose(got, oracle, atol=2e-3)
