"""Unitary-ensemble (list-of-State) input contracts and remaining edges.

Mirrors the reference's ensemble input-validation tests
(/root/reference/tests/analog/test_ensemble.py:188-309: non-mps members,
empty list, length mismatch, get_state rejection, noise rejection) plus the
member-weighting edge (the ensemble mean is the plain average over members,
including duplicated members) — each behavioral case oracle-backed by a
dense expm propagation.
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
from yaqs_tpu.analog.embedding import embed_one_site
from yaqs_tpu.models.operators import pauli_z

LENGTH = 3


def _ham() -> Hamiltonian:
    return Hamiltonian.ising(LENGTH, 0.7, 0.4)


def _params(**kw) -> AnalogSimParams:
    base = dict(
        observables=[Observable("z", i) for i in range(LENGTH)],
        elapsed_time=0.3,
        dt=0.1,
        sample_timesteps=False,
        max_bond_dim=8,
    )
    base.update(kw)
    return AnalogSimParams(**base)


# ---------------------------------------------------------------------------
# Input validation
# ---------------------------------------------------------------------------


def test_rejects_non_state_member():
    with pytest.raises(TypeError, match="only State objects"):
        Simulator().run([State(LENGTH), np.zeros(8)], _ham(), _params(), None)


def test_rejects_empty_state_list():
    with pytest.raises(ValueError, match="at least one State"):
        Simulator().run([], _ham(), _params(), None)


def test_rejects_state_length_mismatch():
    states = [State(LENGTH), State(LENGTH + 1)]
    with pytest.raises(ValueError, match="share one length"):
        Simulator().run(states, _ham(), _params(), None)


def test_rejects_non_mps_representation_member():
    vec = np.zeros(2**LENGTH, dtype=complex)
    vec[0] = 1.0
    bad = State(LENGTH, state=vec, representation="vector")
    with pytest.raises(ValueError, match="'mps' representation"):
        Simulator().run([State(LENGTH), bad], _ham(), _params(), None)


def test_rejects_get_state():
    with pytest.raises(ValueError, match="get_state"):
        Simulator().run([State(LENGTH)], _ham(), _params(get_state=True), None)


def test_rejects_positive_strength_noise():
    nm = NoiseModel([{"name": "lowering", "sites": [0], "strength": 0.1}])
    with pytest.raises(ValueError, match="noiseless"):
        Simulator().run([State(LENGTH)], _ham(), _params(), nm)


def test_rejects_scheduled_jumps():
    nm = NoiseModel(
        [{"name": "lowering", "sites": [0], "strength": 0.0}],
        scheduled_jumps=[{"name": "x", "sites": [0], "time": 0.1}],
    )
    with pytest.raises(ValueError, match="scheduled_jumps"):
        Simulator().run([State(LENGTH)], _ham(), _params(), nm)


def test_zero_strength_noise_tolerated_and_matches_noiseless():
    nm = NoiseModel([{"name": "lowering", "sites": [0], "strength": 0.0}])
    states = [State(LENGTH, state="x+")]
    res_noise = Simulator().run(states, _ham(), _params(), nm)
    res_clean = Simulator().run(states, _ham(), _params(), None)
    np.testing.assert_allclose(
        res_noise.expectation_values, res_clean.expectation_values, atol=1e-12
    )


def test_digital_params_with_state_list_rejected():
    from yaqs_tpu import DigitalSimParams
    from yaqs_tpu.digital.circuit import Circuit

    c = Circuit(LENGTH)
    c.h(0)
    params = DigitalSimParams(observables=[Observable("z", 0)])
    with pytest.raises(TypeError, match="single State"):
        Simulator().run([State(LENGTH)], c, params, None)


# ---------------------------------------------------------------------------
# Behavior: ensemble mean is the plain member average (dense expm oracle)
# ---------------------------------------------------------------------------


def _dense_zs(psi0: np.ndarray, t: float) -> np.ndarray:
    h = _ham().ensure_matrix()
    psi = scipy.linalg.expm(-1j * t * h) @ psi0
    return np.array(
        [
            np.real(psi.conj() @ embed_one_site(pauli_z, i, LENGTH) @ psi)
            for i in range(LENGTH)
        ]
    )


def _basis_vec(bits: str) -> np.ndarray:
    v = np.zeros(2**LENGTH, dtype=complex)
    # site 0 most significant in the dense kron embedding
    v[int(bits, 2)] = 1.0
    return v


def test_two_member_mean_matches_dense_average():
    t = 0.3
    states = [State(LENGTH, state="zeros"), State(LENGTH, state="ones")]
    res = Simulator().run(states, _ham(), _params(), None)
    expected = 0.5 * (_dense_zs(_basis_vec("000"), t) + _dense_zs(_basis_vec("111"), t))
    np.testing.assert_allclose(res.expectation_values[:, -1], expected, atol=1e-6)


def test_duplicated_member_reweights_the_mean():
    t = 0.3
    states = [
        State(LENGTH, state="zeros"),
        State(LENGTH, state="zeros"),
        State(LENGTH, state="ones"),
    ]
    res = Simulator().run(states, _ham(), _params(), None)
    expected = (
        2.0 * _dense_zs(_basis_vec("000"), t) + _dense_zs(_basis_vec("111"), t)
    ) / 3.0
    np.testing.assert_allclose(res.expectation_values[:, -1], expected, atol=1e-6)


def test_single_member_equals_noiseless_single_trajectory():
    t = 0.3
    params = _params(sample_timesteps=True)
    res = Simulator().run([State(LENGTH, state="x+")], _ham(), params, None)
    plus = np.full(2, 1 / np.sqrt(2), dtype=complex)
    psi0 = plus
    for _ in range(LENGTH - 1):
        psi0 = np.kron(psi0, plus)
    np.testing.assert_allclose(
        res.expectation_values[:, -1], _dense_zs(psi0, t), atol=1e-6
    )
    # sampled columns: one per step plus t=0
    assert res.expectation_values.shape[1] == int(round(t / 0.1)) + 1


def test_final_timestep_only_when_not_sampling():
    res = Simulator().run([State(LENGTH)], _ham(), _params(sample_timesteps=False), None)
    assert res.expectation_values.shape[1] == 1


def test_mixed_basis_members_against_dense():
    t = 0.3
    states = [State(LENGTH, state="zeros"), State(LENGTH, state="basis", basis_string="010")]
    res = Simulator().run(states, _ham(), _params(), None)
    expected = 0.5 * (_dense_zs(_basis_vec("000"), t) + _dense_zs(_basis_vec("010"), t))
    np.testing.assert_allclose(res.expectation_values[:, -1], expected, atol=1e-6)
