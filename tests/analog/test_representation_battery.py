"""Cross-representation agreement battery.

Mirrors the reference's representation-ordering suite
(/root/reference/tests/analog/test_representation_ordering.py and
test_lindblad.py:288-467): the same physics must come out of the ``mps``
(TJM), ``vector`` (MCWF), and ``density_matrix`` (Lindblad) backends, for
every way of supplying the Hamiltonian, with the dense Lindblad/expm
propagator as the oracle.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.linalg

from yaqs_tpu import (
    AnalogSimParams,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)

LENGTH = 3
T, DT = 0.4, 0.1


def _zobs(n: int = LENGTH) -> list[Observable]:
    return [Observable("z", i) for i in range(n)]


def _params(num_traj: int = 1, **kw) -> AnalogSimParams:
    kw.setdefault("sample_timesteps", True)
    return AnalogSimParams(
        observables=_zobs(),
        elapsed_time=T,
        dt=DT,
        num_traj=num_traj,
        max_bond_dim=8,
        svd_threshold=1e-14,
        **kw,
    )


def _psi0(n: int = LENGTH) -> np.ndarray:
    plus = np.full(2, 1 / np.sqrt(2))
    psi = plus
    for _ in range(n - 1):
        psi = np.kron(psi, plus)
    return psi


def _z_diag(site: int, n: int = LENGTH) -> np.ndarray:
    # little-endian (site 0 = LSB), the package's ensure_matrix convention
    z = np.array([1.0, -1.0])
    diag = np.ones(1)
    for q in range(n):
        diag = np.kron(z if q == site else np.ones(2), diag)
    return diag


def _dense_zs_unitary(h: np.ndarray, t: float) -> np.ndarray:
    psi = scipy.linalg.expm(-1j * t * h) @ _psi0()
    return np.array(
        [np.real(np.vdot(psi, _z_diag(i) * psi)) for i in range(LENGTH)]
    )


def _dense_lindblad_zs(h: np.ndarray, procs, t: float) -> np.ndarray:
    """Exact Lindblad evolution of |+..+><+..+| -> <Z_i>(t)."""
    dim = h.shape[0]
    eye = np.eye(dim)
    lv = -1j * (np.kron(eye, h) - np.kron(h.T, eye))
    for op, gamma in procs:
        lv += gamma * (
            np.kron(op.conj(), op)
            - 0.5 * np.kron(eye, op.conj().T @ op)
            - 0.5 * np.kron((op.conj().T @ op).T, eye)
        )
    psi = _psi0()
    rho = np.outer(psi, psi.conj()).reshape(-1, order="F")
    rho = scipy.linalg.expm(t * lv) @ rho
    rho = rho.reshape(dim, dim, order="F")
    return np.array([np.real(np.trace(np.diag(_z_diag(i)) @ rho)) for i in range(LENGTH)])


def _embed(op: np.ndarray, site: int, n: int = LENGTH) -> np.ndarray:
    out = np.ones((1, 1), dtype=complex)
    for q in range(n):
        out = np.kron(op if q == site else np.eye(2), out)
    return out


# ---------------------------------------------------------------------------
# Noiseless: all three representations agree with the unitary oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rep", ["mps", "vector", "density_matrix"])
def test_noiseless_agreement_across_representations(rep):
    ham = Hamiltonian.ising(LENGTH, 1.0, 0.5)
    res = Simulator().run(State(LENGTH, state="x+", representation=rep), ham, _params(), None)
    want = _dense_zs_unitary(ham.ensure_matrix(), T)
    np.testing.assert_allclose(
        np.real(np.asarray(res.expectation_values)[:, -1]), want, atol=2e-6,
        err_msg=rep,
    )


@pytest.mark.parametrize("rep", ["mps", "vector", "density_matrix"])
def test_heisenberg_noiseless_agreement(rep):
    ham = Hamiltonian.heisenberg(LENGTH, 1.0, 1.0, 0.6, 0.3)
    res = Simulator().run(State(LENGTH, state="wall", representation=rep), ham, _params(), None)
    h = ham.ensure_matrix()
    # wall state: |110> little-endian ordering per the engine's conventions —
    # oracle from the engine's OWN t=0 column (self-consistency) plus dense
    # evolution from the matching basis vector
    t0 = np.real(np.asarray(res.expectation_values)[:, 0])
    idx = 0
    for i in range(LENGTH):
        if t0[i] < 0:  # <Z_i> = -1 -> bit set at site i
            idx |= 1 << i
    psi = np.zeros(2**LENGTH, dtype=complex)
    psi[idx] = 1.0
    psi = scipy.linalg.expm(-1j * T * h) @ psi
    want = np.array([np.real(np.vdot(psi, _z_diag(i) * psi)) for i in range(LENGTH)])
    np.testing.assert_allclose(
        np.real(np.asarray(res.expectation_values)[:, -1]), want, atol=2e-6,
        err_msg=rep,
    )


# ---------------------------------------------------------------------------
# Hamiltonian source: MPO-built vs dense-matrix-built must agree everywhere
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rep", ["mps", "vector", "density_matrix"])
def test_hamiltonian_source_invariance(rep):
    ham_mpo = Hamiltonian.ising(LENGTH, 1.0, 0.5)
    ham_mat = Hamiltonian.from_matrix(ham_mpo.ensure_matrix(), length=LENGTH)
    out = []
    for ham in (ham_mpo, ham_mat):
        res = Simulator().run(
            State(LENGTH, state="x+", representation=rep), ham, _params(), None
        )
        out.append(np.real(np.asarray(res.expectation_values)))
    np.testing.assert_allclose(out[0], out[1], atol=2e-6, err_msg=rep)


# ---------------------------------------------------------------------------
# Noisy: density_matrix is exact; mps (TJM) and vector (MCWF) ensembles
# converge to it (paired tolerance ~ 1/sqrt(num_traj))
# ---------------------------------------------------------------------------


def test_density_matrix_matches_dense_lindblad_all_timesteps():
    gamma = 0.3
    ham = Hamiltonian.ising(LENGTH, 1.0, 0.5)
    noise = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": gamma} for i in range(LENGTH)]
    )
    res = Simulator().run(
        State(LENGTH, state="x+", representation="density_matrix"),
        ham, _params(), noise,
    )
    h = ham.ensure_matrix()
    low = np.array([[0, 1], [0, 0]], dtype=complex)
    procs = [(_embed(low, i), gamma) for i in range(LENGTH)]
    vals = np.real(np.asarray(res.expectation_values))
    steps = vals.shape[1]
    for col in range(steps):
        want = _dense_lindblad_zs(h, procs, T * col / (steps - 1))
        np.testing.assert_allclose(vals[:, col], want, atol=5e-4, err_msg=f"col {col}")


@pytest.mark.parametrize("rep", ["mps", "vector"])
def test_noisy_trajectory_mean_converges_to_lindblad(rep):
    gamma = 0.25
    ham = Hamiltonian.ising(LENGTH, 1.0, 0.5)
    noise = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": gamma} for i in range(LENGTH)]
    )
    res = Simulator().run(
        State(LENGTH, state="x+", representation=rep),
        ham, _params(num_traj=256, random_seed=7), noise,
    )
    h = ham.ensure_matrix()
    low = np.array([[0, 1], [0, 0]], dtype=complex)
    procs = [(_embed(low, i), gamma) for i in range(LENGTH)]
    want = _dense_lindblad_zs(h, procs, T)
    got = np.real(np.asarray(res.expectation_values)[:, -1])
    # MC error ~ 1/sqrt(256) ~ 0.06 on a [-1,1] observable; the first-order
    # stroboscopic bias of TJM/MCWF at gamma dt = 0.025 is well below that
    np.testing.assert_allclose(got, want, atol=0.12, err_msg=rep)


def test_dephasing_preserves_z_all_representations():
    # Z-dephasing commutes with Z: <Z_i>(t) must match the NOISELESS unitary
    # value in mean, exactly for density_matrix, for every representation
    gamma = 0.4
    ham = Hamiltonian.ising(LENGTH, 1.0, 0.0)  # field off: H commutes with Z
    noise = NoiseModel(
        [{"name": "pauli_z", "sites": [i], "strength": gamma} for i in range(LENGTH)]
    )
    want = _dense_zs_unitary(ham.ensure_matrix(), T)  # all zeros from |+..+>
    for rep, traj, tol in (
        ("density_matrix", 1, 1e-6),
        ("mps", 64, 1e-6),     # Z-jumps flip no Z expectation: exact per traj
        ("vector", 64, 1e-6),
    ):
        res = Simulator().run(
            State(LENGTH, state="x+", representation=rep),
            ham, _params(num_traj=traj, random_seed=3), noise,
        )
        got = np.real(np.asarray(res.expectation_values)[:, -1])
        np.testing.assert_allclose(got, want, atol=tol, err_msg=rep)
