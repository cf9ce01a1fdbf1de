"""Fixed-χ long-range gate battery vs dense statevector oracles.

Mirrors the reference's fixed-χ / ladder regression block
(/root/reference/tests/digital/test_digital_tjm.py:900-1360) under this
package's padded-shape semantics:

- every bond is padded to at least 2 (boundary-index-0 convention), so the
  enforceable cap is ``max(chi, 2)`` of EFFECTIVE Schmidt rank, not array
  shape;
- in "swaps"/"mpo" modes long-range gates route through compiled swap
  walks / zip-up MPO application, which are exact whenever the cap admits
  the true Schmidt rank — a χ=2 RZZ on |+>^L is exact here where the
  reference's single-sweep 2TDVP stalls at cos^2(θ/2);
- the "tdvp"/"full-tdvp" modes are the reference's variational projector
  splitting and share its fixed-point stall on symmetric product states
  (asserted below as a parity contract).

Oracle: own dense statevector evolution (tests/digital/test_engine.run_dense).
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from yaqs_tpu import DigitalSimParams, Observable, Simulator, State
from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.mps import MPS
from yaqs_tpu.digital.circuit import Circuit

sys.path.insert(0, str(Path(__file__).parent))
from test_engine import run_dense  # noqa: E402

RZZ_ANGLE = 0.3


def run_engine(c, length, *, chi, mode="swaps", sweeps=1, seed=3):
    params = DigitalSimParams(
        observables=[Observable("z", 0)],
        max_bond_dim=chi,
        svd_threshold=1e-12,
        random_seed=seed,
        gate_mode=mode,
        tdvp_sweeps=sweeps,
        get_state=True,
    )
    res = Simulator().run(State(length), c, params, None)
    return np.asarray(res.output_state.tensors)


def out_vec(tensors) -> np.ndarray:
    return MPS(tensors=tensors).to_vec()


def dense_vec(c, length) -> np.ndarray:
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    return run_dense(c, psi0)


def fidelity(a, b) -> float:
    return abs(np.vdot(a, b)) ** 2 / (np.linalg.norm(a) ** 2 * np.linalg.norm(b) ** 2)


def effective_ranks(tensors, tol=1e-7):
    spectra, _ = jax.jit(mps_ops.bond_spectra)(np.asarray(tensors))
    s = np.asarray(spectra)
    return (s > tol * s.max()).sum(axis=1)


def ladder_pairs(length):
    return [(i, length - 1 - i) for i in range(length // 2) if i < length - 1 - i]


def ladder_circuit(length, num_gates=None, plus=True):
    c = Circuit(length)
    if plus:
        for q in range(length):
            c.h(q)
    pairs = ladder_pairs(length)
    if num_gates is not None:
        pairs = pairs[:num_gates]
    for a, b in pairs:
        c.append("rzz", (a, b), params=(RZZ_ANGLE,))
    return c


# -- cap sweep: effective rank never exceeds max(chi, 2), norm stays 1 --------


@pytest.mark.parametrize("mode", ["swaps", "tdvp"])
@pytest.mark.parametrize("gate", ["rzz", "rxx"])
@pytest.mark.parametrize("initial", ["zeros", "plus"])
@pytest.mark.parametrize("chi", [2, 8])
def test_lr_cap_sweep(chi, initial, gate, mode):
    length = 8
    c = Circuit(length)
    if initial == "plus":
        for q in range(length):
            c.h(q)
    c.append(gate, (0, length - 1), params=(RZZ_ANGLE,))
    tensors = run_engine(c, length, chi=chi, mode=mode)
    ranks = effective_ranks(tensors)
    assert ranks.max() <= max(chi, 2), (ranks, chi, initial, gate, mode)
    psi = out_vec(tensors)
    np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-8)
    if mode == "swaps":
        # a single LR Pauli rotation has Schmidt rank <= 2 across every
        # bond, so every cap >= 2 admits the exact state on the swap walk
        # ("tdvp" is variational — see the fixed-point tests below)
        np.testing.assert_allclose(
            fidelity(psi, dense_vec(c, length)), 1.0, atol=1e-8
        )


def test_zeros_rzz_capped_stays_product():
    # RZZ is diagonal: |0...0> is an eigenstate, every <Z> stays exactly 1
    length = 8
    c = Circuit(length)
    c.append("rzz", (0, length - 1), params=(RZZ_ANGLE,))
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        max_bond_dim=2,
        svd_threshold=1e-12,
        random_seed=0,
        gate_mode="tdvp",
        get_state=True,
    )
    res = Simulator().run(State(length), c, params, None)
    np.testing.assert_allclose(res.expectation_values[:, -1], 1.0, atol=1e-10)
    assert effective_ranks(np.asarray(res.output_state.tensors)).max() <= 2


def test_plus_rzz_swaps_chi2_exact_beats_reference_constant():
    # χ=2 admits the exact rank-2 state and the swap-walk routing reaches it
    # exactly; the reference's single-sweep variational 2TDVP stalls at
    # global fidelity cos^2(θ/2) ~ 0.9777 here (test_digital_tjm.py:976-987)
    length = 7
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.append("rzz", (0, length - 1), params=(RZZ_ANGLE,))
    psi = out_vec(run_engine(c, length, chi=2, mode="swaps"))
    np.testing.assert_allclose(fidelity(psi, dense_vec(c, length)), 1.0, atol=1e-8)


def test_plus_rzz_window_tdvp_stalls_at_reference_constant():
    # |+>^L is an UNSTABLE FIXED POINT of the projector-splitting window
    # sweep for a ZZ generator: every effective Hamiltonian carries an
    # environment factor <+|Z|+> = 0, so one (x64) sweep is a no-op and the
    # global fidelity sits at |<+^L|e^{-i θ/2 Z_a Z_b}|+^L>|^2 = cos^2(θ/2)
    # — bit-matching the reference's PLUS_LR_RZZ_GLOBAL_FID contract for its
    # own single-sweep 2TDVP routing (test_digital_tjm.py:976-1001).
    length = 7
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.append("rzz", (0, length - 1), params=(RZZ_ANGLE,))
    psi = out_vec(run_engine(c, length, chi=8, mode="tdvp"))
    stall_fid = np.cos(RZZ_ANGLE / 2.0) ** 2
    np.testing.assert_allclose(
        fidelity(psi, dense_vec(c, length)), stall_fid, atol=1e-6
    )


def test_window_sweep_substeps_converge_off_fixed_point():
    # off the fixed point (rx-prepared state with <Z> != 0 environments)
    # the window sweep converges toward the exact gate as substeps grow
    length = 6
    fids = {}
    for sweeps in (1, 8):
        c = Circuit(length)
        for q in range(length):
            c.append("rx", (q,), params=(0.4,))
        c.append("rzz", (0, length - 1), params=(RZZ_ANGLE,))
        psi = out_vec(run_engine(c, length, chi=8, mode="tdvp", sweeps=sweeps))
        fids[sweeps] = fidelity(psi, dense_vec(c, length))
    assert fids[8] >= fids[1] - 1e-12
    assert fids[8] > 0.999, fids


# -- mirrored-ladder regressions ----------------------------------------------


def test_ladder_prefix_matches_dense():
    # per-gate prefixes of the mirrored ladder all match the dense oracle
    length = 8
    for k in range(1, len(ladder_pairs(length)) + 1):
        c = ladder_circuit(length, num_gates=k)
        psi = out_vec(run_engine(c, length, chi=32))
        np.testing.assert_allclose(
            fidelity(psi, dense_vec(c, length)), 1.0, atol=1e-8, err_msg=f"prefix {k}"
        )


def test_ladder_capped_vs_uncapped_agree_below_cap():
    # L=10 plus ladder: middle cut is spanned by all 5 diagonal pairs, so the
    # exact Schmidt rank is 2^5 = 32; χ=32 and χ=64 must agree to roundoff
    length = 10
    c = ladder_circuit(length)
    lo = out_vec(run_engine(c, length, chi=32))
    hi = out_vec(run_engine(c, length, chi=64))
    np.testing.assert_allclose(fidelity(lo, hi), 1.0, atol=1e-9)
    np.testing.assert_allclose(fidelity(hi, dense_vec(c, length)), 1.0, atol=1e-8)


def test_ladder_enforces_cap():
    # when the cap binds (χ=2 << rank 32) evolution differs, stays capped,
    # and remains normalized
    length = 10
    c = ladder_circuit(length)
    capped = run_engine(c, length, chi=2)
    uncapped = run_engine(c, length, chi=64)
    assert effective_ranks(capped).max() <= 2
    assert effective_ranks(uncapped).max() > 2
    psi_c, psi_u = out_vec(capped), out_vec(uncapped)
    np.testing.assert_allclose(np.linalg.norm(psi_c), 1.0, atol=1e-8)
    assert fidelity(psi_c, psi_u) < 0.99


def test_ladder_zeros_any_cap_exact():
    # on |0...0> the whole diagonal ladder is a global phase at every cap
    length = 10
    c = ladder_circuit(length, plus=False)
    for chi in (2, 8):
        params = DigitalSimParams(
            observables=[Observable("z", i) for i in range(length)],
            max_bond_dim=chi,
            svd_threshold=1e-12,
            random_seed=0,
            get_state=True,
        )
        res = Simulator().run(State(length), c, params, None)
        np.testing.assert_allclose(res.expectation_values[:, -1], 1.0, atol=1e-10)
        assert effective_ranks(np.asarray(res.output_state.tensors)).max() <= 2


# -- mixed NN + LR circuits through every gate mode ----------------------------


def mixed_small_circuit(length):
    c = Circuit(length)
    c.h(0)
    c.cx(0, 1)
    c.cx(0, length - 1)
    c.append("rzz", (0, length - 1), params=(RZZ_ANGLE,))
    return c


@pytest.mark.parametrize("mode", ["swaps", "tdvp", "full-tdvp", "mpo"])
def test_mixed_small_circuit_every_mode(mode):
    length = 8
    c = mixed_small_circuit(length)
    tensors = run_engine(c, length, chi=16, mode=mode)
    psi = out_vec(tensors)
    np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-7)
    assert effective_ranks(tensors).max() <= 16
    if mode in ("swaps", "mpo"):
        # swap walks / zip-up MPO application are exact at sufficient χ;
        # the (full-)tdvp modes are variational single-sweep projections
        # whose CX-generator windows are approximate by design (the
        # reference's mixed fixed-χ test also asserts invariants only,
        # test_digital_tjm.py:1071-1080)
        np.testing.assert_allclose(
            fidelity(psi, dense_vec(c, length)), 1.0, atol=1e-7, err_msg=mode
        )


@pytest.mark.parametrize("mode", ["swaps", "mpo"])
def test_mixed_circuit_respects_tight_cap(mode):
    length = 8
    c = mixed_small_circuit(length)
    tensors = run_engine(c, length, chi=4, mode=mode)
    assert effective_ranks(tensors).max() <= 4
    np.testing.assert_allclose(np.linalg.norm(out_vec(tensors)), 1.0, atol=1e-7)


# -- 2D grid RZZ snake --------------------------------------------------------


def test_grid_rzz_snake_matches_dense():
    # 3x3 grid: row + column RZZ couplings on the snake-ordered chain
    # (reference grid regression, test_digital_tjm.py:505-525)
    nrow = ncol = 3
    length = nrow * ncol

    def gidx(r, col):
        return r * ncol + (col if r % 2 == 0 else ncol - 1 - col)

    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for r in range(nrow):
        for col in range(ncol - 1):
            c.append("rzz", (gidx(r, col), gidx(r, col + 1)), params=(RZZ_ANGLE,))
    for r in range(nrow - 1):
        for col in range(ncol):
            c.append("rzz", (gidx(r, col), gidx(r + 1, col)), params=(RZZ_ANGLE,))
    psi = out_vec(run_engine(c, length, chi=32))
    np.testing.assert_allclose(fidelity(psi, dense_vec(c, length)), 1.0, atol=1e-8)
