"""Long-range gate physics regressions vs dense statevector oracles.

Port of the reference's long-range RZZ / haar-random / bond-cap battery
(/root/reference/tests/digital/test_digital_tjm.py:666-1560) onto the padded
fixed-shape engine: endpoint/internal/spectator observables at several chain
lengths, inverse-gate roundtrips, norm stability on haar-random circuits,
effective-bond-rank invariants, and truncation caps.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import DigitalSimParams, Observable, Simulator, State
from yaqs_tpu.digital.circuit import Circuit

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from test_engine import run_dense, zexp  # noqa: E402


def run_engine(c, length, mode="swaps", chi=16, get_state=False, seed=3):
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        max_bond_dim=chi,
        svd_threshold=1e-12,
        random_seed=seed,
        gate_mode=mode,
        get_state=get_state,
    )
    res = Simulator().run(State(length), c, params, None)
    return res


def dense_z(c, length):
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    psi = run_dense(c, psi0)
    return np.asarray([zexp(psi, i, length) for i in range(length)])


def effective_bond_ranks(tensors, tol=1e-8):
    from yaqs_tpu.core import mps_ops
    import jax

    spectra, _ = jax.jit(mps_ops.bond_spectra)(tensors)
    s = np.asarray(spectra)
    return (s > tol * s.max()).sum(axis=1)


# -- endpoint / internal / spectator observables at several lengths -----------


@pytest.mark.parametrize("length", [5, 7, 10])
def test_lr_rzz_endpoint_z_obs(length):
    c = Circuit(length)
    c.h(0)
    c.h(length - 1)
    c.append("rzz", (0, length - 1), params=(0.8,))
    res = run_engine(c, length)
    np.testing.assert_allclose(
        res.expectation_values[:, -1], dense_z(c, length), atol=1e-8
    )


def test_lr_rzz_internal_z_obs():
    length = 8
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.append("rzz", (2, 6), params=(1.1,))
    c.append("rzz", (1, 5), params=(-0.4,))
    res = run_engine(c, length)
    np.testing.assert_allclose(
        res.expectation_values[:, -1], dense_z(c, length), atol=1e-8
    )


@pytest.mark.parametrize("length", [6, 9])
def test_lr_rzz_spectator_z_untouched(length):
    # sites outside the gate's span keep their prepared <Z> exactly
    c = Circuit(length)
    c.x(1)  # <Z_1> = -1, spectator
    c.h(2)
    c.h(length - 1)
    c.append("rzz", (2, length - 1), params=(0.9,))
    res = run_engine(c, length)
    vals = res.expectation_values[:, -1]
    np.testing.assert_allclose(vals[0], 1.0, atol=1e-10)
    np.testing.assert_allclose(vals[1], -1.0, atol=1e-10)


@pytest.mark.parametrize("length", [5, 8])
def test_lr_rzz_zeros_state_exact(length):
    # RZZ is diagonal: on |0...0> every <Z> stays exactly 1
    c = Circuit(length)
    c.append("rzz", (0, length - 1), params=(1.3,))
    res = run_engine(c, length)
    np.testing.assert_allclose(res.expectation_values[:, -1], 1.0, atol=1e-10)


# -- roundtrips ----------------------------------------------------------------


@pytest.mark.parametrize("length", [5, 7])
def test_lr_rzz_roundtrip_inverse_gate(length):
    # U(theta) then U(-theta) must restore |+>^L: all <Z> = 0 and <X> = 1
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.append("rzz", (0, length - 1), params=(0.7,))
    c.append("rzz", (0, length - 1), params=(-0.7,))
    params = DigitalSimParams(
        observables=[Observable("x", i) for i in range(length)],
        max_bond_dim=16,
        svd_threshold=1e-12,
        random_seed=3,
        gate_mode="swaps",
    )
    res = Simulator().run(State(length), c, params, None)
    np.testing.assert_allclose(res.expectation_values[:, -1], 1.0, atol=1e-8)


def test_lr_cx_roundtrip_plus_state():
    length = 6
    c = Circuit(length)
    c.h(0)
    c.cx(0, 5)
    c.cx(0, 5)
    c.h(0)
    res = run_engine(c, length)
    np.testing.assert_allclose(res.expectation_values[:, -1], 1.0, atol=1e-8)


# -- haar-random stability -------------------------------------------------------


def haar_unitary(dim, rng):
    z = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    q, r = np.linalg.qr(z)
    return q * (np.diag(r) / np.abs(np.diag(r)))


@pytest.mark.parametrize("mode", ["swaps", "mpo"])
def test_lr_haar_gates_vs_dense(mode):
    # random long-range two-qubit unitaries: engine matches dense statevector
    length = 6
    rng = np.random.default_rng(12)
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for (i, j) in [(0, 4), (5, 1), (2, 5)]:
        u = haar_unitary(4, rng)
        c.append("unitary", (i, j), matrix=u)
    res = run_engine(c, length, mode=mode, chi=32)
    np.testing.assert_allclose(
        res.expectation_values[:, -1], dense_z(c, length), atol=1e-7, err_msg=mode
    )


def test_haar_state_norm_stable():
    # noiseless unitary circuit: the output MPS must stay normalized
    length = 6
    rng = np.random.default_rng(5)
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for (i, j) in [(0, 3), (2, 5), (4, 1)]:
        c.append("unitary", (i, j), matrix=haar_unitary(4, rng))
    res = run_engine(c, length, chi=32, get_state=True)
    from yaqs_tpu.core.mps import MPS

    psi = MPS(tensors=np.asarray(res.output_state.tensors))
    np.testing.assert_allclose(psi.norm(), 1.0, atol=1e-8)


# -- bond invariants --------------------------------------------------------------


def test_lr_rzz_bond_not_inflated():
    # a single diagonal long-range gate on a product state yields Schmidt
    # rank <= 2 across every bond it spans
    length = 8
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.append("rzz", (1, 6), params=(0.9,))
    res = run_engine(c, length, chi=16, get_state=True)
    ranks = effective_bond_ranks(np.asarray(res.output_state.tensors))
    assert ranks.max() <= 2, ranks


def test_truncation_respects_max_bond_dim():
    # chi-capped run stays within the padded shape and remains a valid state
    length = 6
    rng = np.random.default_rng(9)
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for layer in range(3):
        for q in range(layer % 2, length - 1, 2):
            c.append("unitary", (q, q + 1), matrix=haar_unitary(4, rng))
    res = run_engine(c, length, chi=4, get_state=True)
    tensors = np.asarray(res.output_state.tensors)
    assert tensors.shape[2] == 4
    from yaqs_tpu.core.mps import MPS

    psi = MPS(tensors=tensors)
    np.testing.assert_allclose(psi.norm(), 1.0, atol=1e-6)
    # and every sampled <Z> stays physical
    assert np.all(np.abs(res.expectation_values) <= 1 + 1e-9)


def test_chi1_product_circuit_exact():
    # chi=1 suffices for a product-state circuit: all single-qubit gates
    length = 5
    c = Circuit(length)
    for q in range(length):
        c.h(q)
        c.append("rz", (q,), params=(0.3 * (q + 1),))
        c.h(q)
    res = run_engine(c, length, chi=2)
    np.testing.assert_allclose(
        res.expectation_values[:, -1], dense_z(c, length), atol=1e-9
    )


# -- mixed long-range + brickwork regression ---------------------------------------


@pytest.mark.parametrize("mode", ["swaps", "mpo"])
def test_mixed_circuit_regression(mode):
    length = 7
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for q in range(0, length - 1, 2):
        c.cx(q, q + 1)
    c.append("rzz", (0, 6), params=(0.45,))
    for q in range(1, length - 1, 2):
        c.append("rzz", (q, q + 1), params=(-0.3,))
    c.append("cp", (6, 2), params=(0.8,))
    for q in range(length):
        c.append("rx", (q,), params=(0.2,))
    res = run_engine(c, length, mode=mode, chi=32)
    np.testing.assert_allclose(
        res.expectation_values[:, -1], dense_z(c, length), atol=1e-7, err_msg=mode
    )
