"""Wide-chain digital regressions (L = 18..32) with deterministic oracles.

The reference exercises its long-range gate plumbing at n=18 and n=32
(/root/reference/tests/digital/test_mps_utils.py:179-199) where statevector
references are impossible; outcomes are pinned through deterministic basis
states, parity correlators, and norm invariants instead.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import DigitalSimParams, NoiseModel, Observable, Simulator, State
from yaqs_tpu.digital.circuit import Circuit


def run(c, length, obs, *, chi=8, mode="mpo", shots=0, seed=7, noise=None):
    params = DigitalSimParams(
        observables=obs,
        max_bond_dim=chi,
        svd_threshold=1e-12,
        random_seed=seed,
        gate_mode=mode,
        shots=shots,
    )
    return Simulator().run(State(length), c, params, noise)


@pytest.mark.parametrize("length", [18, 32])
@pytest.mark.parametrize("mode", ["mpo", "swaps"])
def test_wide_long_range_cx_control_zero_is_identity(length, mode):
    c = Circuit(length)
    c.cx(0, length - 1)
    res = run(c, length, [Observable("z", i) for i in range(length)], mode=mode)
    np.testing.assert_allclose(res.expectation_values[:, -1], 1.0, atol=1e-9)


@pytest.mark.parametrize("length", [18, 32])
@pytest.mark.parametrize("mode", ["mpo", "swaps"])
def test_wide_long_range_cx_control_one_flips_target(length, mode):
    c = Circuit(length)
    c.x(0)
    c.cx(0, length - 1)
    res = run(c, length, [Observable("z", i) for i in range(length)], mode=mode)
    vals = res.expectation_values[:, -1]
    expected = np.ones(length)
    expected[0] = -1.0  # control
    expected[length - 1] = -1.0  # flipped target
    np.testing.assert_allclose(vals, expected, atol=1e-9)


@pytest.mark.parametrize("length", [24])
def test_wide_directional_cx_reversed_control(length):
    # cx(hi, lo): control is the HIGH site — the low target flips only when
    # the high site is |1>
    c = Circuit(length)
    c.x(length - 1)
    c.cx(length - 1, 3)
    res = run(c, length, [Observable("z", i) for i in range(length)])
    vals = res.expectation_values[:, -1]
    assert vals[length - 1] == pytest.approx(-1.0, abs=1e-9)
    assert vals[3] == pytest.approx(-1.0, abs=1e-9)
    assert vals[1] == pytest.approx(1.0, abs=1e-9)


def test_wide_ghz_parity_correlators():
    length = 32
    c = Circuit(length)
    c.h(0)
    for q in range(length - 1):
        c.cx(q, q + 1)
    obs = [Observable("z", 0)] + [
        Observable("zz", [0, i]) for i in (1, length // 2, length - 1)
    ]
    res = run(c, length, obs, chi=4)
    vals = res.expectation_values[:, -1]
    assert vals[0] == pytest.approx(0.0, abs=1e-9)  # <Z_0> of GHZ
    np.testing.assert_allclose(vals[1:], 1.0, atol=1e-8)  # perfect ZZ parity


def test_wide_ghz_shot_sampling_two_branches():
    length, shots = 24, 128
    c = Circuit(length)
    c.h(0)
    for q in range(length - 1):
        c.cx(q, q + 1)
    res = run(c, length, [], chi=4, shots=shots, seed=11)
    assert set(res.counts) <= {0, 2**length - 1}
    assert sum(res.counts.values()) == shots
    assert len(res.counts) == 2


def test_wide_brickwork_norm_and_physical_bounds():
    # deep capped brickwork at L=20: state stays normalized, observables
    # stay in [-1, 1]
    length = 20
    rng = np.random.default_rng(3)
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for layer in range(4):
        for q in range(layer % 2, length - 1, 2):
            c.append("rzz", (q, q + 1), params=(float(rng.uniform(0.2, 1.0)),))
        for q in range(length):
            c.append("rx", (q,), params=(float(rng.uniform(0.1, 0.5)),))
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        max_bond_dim=8,
        svd_threshold=1e-10,
        random_seed=5,
        get_state=True,
    )
    res = Simulator().run(State(length), c, params, None)
    from yaqs_tpu.core.mps import MPS

    psi = MPS(tensors=np.asarray(res.output_state.tensors))
    np.testing.assert_allclose(psi.norm(), 1.0, atol=1e-7)
    assert np.all(np.abs(res.expectation_values) <= 1 + 1e-9)


def test_wide_noisy_smoke_stays_physical():
    length = 18
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    for q in range(0, length - 1, 2):
        c.cx(q, q + 1)
    noise = NoiseModel(
        [{"name": "dephasing", "sites": [i], "strength": 0.02} for i in range(length)]
    )
    res = run(c, length, [Observable("z", i) for i in range(length)], seed=9, noise=noise)
    assert np.all(np.abs(res.expectation_values) <= 1 + 1e-9)
    assert np.all(np.isfinite(res.expectation_values))
