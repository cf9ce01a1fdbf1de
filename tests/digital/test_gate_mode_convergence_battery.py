"""Approximate gate-route convergence battery (tdvp / full-tdvp windows).

Mirrors the reference's hybrid/sweeps/fidelity-cap coverage
(/root/reference/tests/digital/test_digital_tjm.py:721-1330): the window-
2TDVP routes are APPROXIMATE at gate times (dt=1) — the reference's own
production trade-off, fidelity ~0.9777 at one sweep for a long-range RZZ —
and converge with `tdvp_sweeps` substeps.  swaps/mpo stay exact.  Oracles:
dense statevectors (run_dense) and state fidelities via MPS.to_vec().
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

from yaqs_tpu import DigitalSimParams, Observable, Simulator, State
from yaqs_tpu.core.mps import MPS
from yaqs_tpu.digital.circuit import Circuit

sys.path.insert(0, str(Path(__file__).parent))
from test_engine import run_dense  # noqa: E402


def _run(c, length, mode, chi=16, sweeps=1):
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        max_bond_dim=chi,
        svd_threshold=1e-12,
        random_seed=3,
        gate_mode=mode,
        tdvp_sweeps=sweeps,
        get_state=True,
    )
    return Simulator().run(State(length), c, params, None)


def _fidelity(res, c, length):
    psi = MPS(tensors=np.asarray(res.output_state.tensors)).to_vec()
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    ref = run_dense(c, psi0)
    return abs(np.vdot(ref, psi))


def _lr_rzz_circuit(length, theta=0.8):
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.append("rzz", (0, length - 1), params=(theta,))
    return c


# ------------------------------------------------------------- fidelity caps
@pytest.mark.parametrize("mode", ["swaps", "mpo"])
def test_exact_routes_full_fidelity(mode):
    length = 6
    c = _lr_rzz_circuit(length)
    assert _fidelity(_run(c, length, mode), c, length) > 1 - 1e-8


@pytest.mark.parametrize("mode", ["tdvp", "full-tdvp"])
def test_window_routes_meet_measured_fidelity_floor(mode):
    """Generator-window 2TDVP at gate times is approximate by design (the
    reference's production trade-off; its own long-range-RZZ floor is
    ~0.9777 on its shape).  Measured here (L=6, theta=0.8): 0.92106 at one
    sweep, 0.97834 at two — pinned with margin."""
    length = 6
    c = _lr_rzz_circuit(length)
    assert _fidelity(_run(c, length, mode), c, length) > 0.92
    assert _fidelity(_run(c, length, mode, sweeps=2), c, length) > 0.975


def test_tdvp_sweeps_converge_monotonically():
    """Substepping (1/sweeps per sweep) drives the window route toward the
    dense result (reference tdvp_sweeps contract, tdvp.py:24-67)."""
    length = 6
    c = _lr_rzz_circuit(length, theta=1.1)
    errs = []
    for sweeps in (1, 2, 4):
        fid = _fidelity(_run(c, length, "tdvp", sweeps=sweeps), c, length)
        errs.append(1.0 - fid)
    # measured (theta=1.1): 0.147 -> 0.061 -> 0.0153 — ~second order in
    # 1/sweeps; pin monotone decrease and a >=4x total reduction
    assert errs[2] < errs[1] < errs[0], errs
    assert errs[2] < 0.3 * errs[0], errs
    assert errs[2] < 2e-2, errs


def test_full_tdvp_sweeps_converge_nearest_neighbor():
    """full-tdvp windows even NEAREST-neighbor gates; sweeps converge them."""
    length = 4
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.append("rzz", (1, 2), params=(0.9,))
    errs = []
    for sweeps in (1, 4):
        fid = _fidelity(_run(c, length, "full-tdvp", sweeps=sweeps), c, length)
        errs.append(1.0 - fid)
    assert errs[1] <= errs[0] + 1e-12
    assert errs[1] < 5e-3, errs


def test_tdvp_mode_nearest_neighbor_stays_exact():
    """tdvp mode routes NEAREST neighbors through TEBD (exact), not the
    window (reference hybrid-nn-unchanged contract)."""
    length = 5
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.append("rzz", (2, 3), params=(0.7,))
    assert _fidelity(_run(c, length, "tdvp"), c, length) > 1 - 1e-8


# ------------------------------------------------------ qubit-order routing
@pytest.mark.parametrize("mode", ["swaps", "mpo", "tdvp"])
def test_descending_long_range_cx(mode):
    """cx(hi, lo) long-range: control above target, every mode."""
    length = 6
    c = Circuit(length)
    c.h(5)
    c.cx(5, 0)
    res = _run(c, length, mode, chi=16)
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    ref = run_dense(c, psi0)
    zref = []
    for i in range(length):
        m = np.ones(1)
        for s in range(length):
            m = np.kron(m, [1, -1] if s == i else [1, 1])
        zref.append(np.real(np.vdot(ref, m * ref)))
    tol = 1e-7 if mode in ("swaps", "mpo") else 2e-2
    np.testing.assert_allclose(res.expectation_values[:, -1], zref, atol=tol)


@pytest.mark.parametrize("mode", ["swaps", "mpo"])
def test_asymmetric_gate_descending_order_exact_modes(mode):
    """cp(j, i) with j > i — phase gates are symmetric but cu1 params break
    ties; use a haar unitary to pin the significance convention."""
    length = 5
    rng = np.random.default_rng(21)
    z = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    q, r = np.linalg.qr(z)
    u = q * (np.diag(r) / np.abs(np.diag(r)))
    c = Circuit(length)
    for s in range(length):
        c.h(s)
    c.append("unitary", (4, 1), matrix=u)
    assert _fidelity(_run(c, length, mode, chi=16), c, length) > 1 - 1e-7


# ------------------------------------------------------------ 3-qubit windows
def test_ccx_generator_window_tdvp_converges():
    """3-qubit gates in tdvp mode use the generator window when available,
    else the MPO route — either way the result must converge to dense."""
    length = 5
    c = Circuit(length)
    c.h(0)
    c.h(1)
    c.append("ccx", (0, 1, 3))
    fid = _fidelity(_run(c, length, "tdvp", chi=16, sweeps=4), c, length)
    assert fid > 0.99, fid


def test_ccx_mpo_route_exact():
    length = 5
    c = Circuit(length)
    c.h(0)
    c.h(1)
    c.append("ccx", (0, 1, 4))
    assert _fidelity(_run(c, length, "mpo", chi=16), c, length) > 1 - 1e-7


# --------------------------------------------------------- capped-chi ladders
@pytest.mark.parametrize("mode", ["swaps", "mpo"])
def test_rzz_ladder_capped_chi_stays_physical(mode):
    """A ladder of long-range RZZ gates at a tight chi cap: norm 1, physical
    observables, no NaN (reference ladder-fchi battery)."""
    length = 8
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for (i, j) in [(0, 7), (1, 6), (2, 5), (3, 4), (0, 4), (3, 7)]:
        c.append("rzz", (i, j), params=(0.6,))
    res = _run(c, length, mode, chi=4)
    vals = np.asarray(res.expectation_values)
    assert np.isfinite(vals).all()
    assert np.all(np.abs(vals) <= 1 + 1e-8)
    psi = MPS(tensors=np.asarray(res.output_state.tensors))
    np.testing.assert_allclose(psi.norm(), 1.0, atol=1e-6)


def test_diagonal_ladder_capped_chi_exact_on_zeros():
    """Diagonal gates on |0...0>: chi=1 content — capped runs stay exact."""
    length = 8
    c = Circuit(length)
    for (i, j) in [(0, 7), (2, 5), (1, 6)]:
        c.append("rzz", (i, j), params=(1.0,))
    for mode in ("swaps", "mpo"):
        res = _run(c, length, mode, chi=2)
        np.testing.assert_allclose(
            res.expectation_values[:, -1], 1.0, atol=1e-9, err_msg=mode
        )
