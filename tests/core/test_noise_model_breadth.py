"""NoiseModel breadth battery — reference behaviors not pinned elsewhere.

Mirrors the remaining contracts of the reference's
tests/core/data_structures/test_noise_model.py (907 LoC): per-run
single-sampling visible through Result, independent per-site draws, type
guards on malformed containers, is_pauli structure branches, and
truncated-normal edge semantics.  tests/core/test_noise_model.py carries the
construction/validation/crosstalk depth; this file fills the by-name gaps
the round-4 review listed.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import (
    AnalogSimParams,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)
from yaqs_tpu.core.noise_model import is_pauli
from yaqs_tpu.models.operators import PAULI


# ------------------------------------------------------------ run integration
def test_distribution_sampled_once_per_run_and_stored_in_result():
    """A distributed noise model is realized ONCE per Simulator.run — all
    trajectories share the draw — and the sampled model (float strengths) is
    stored on the result (reference test_noise_distribution_integration)."""
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    nm = NoiseModel([
        {"name": "x", "sites": [0],
         "strength": {"distribution": "normal", "mean": 0.1, "std": 0.01}},
    ])
    p = AnalogSimParams(observables=[Observable("z", 0)], dt=0.1,
                        elapsed_time=0.2, num_traj=4, max_bond_dim=4,
                        sample_timesteps=False, random_seed=42)
    res = Simulator().run(State(2), ham, p, nm)
    assert res.noise_model is not None
    assert len(res.noise_model.processes) == 1
    assert isinstance(res.noise_model.processes[0]["strength"], float)
    # the original user model is untouched (still a distribution spec)
    assert isinstance(nm.processes[0]["strength"], dict)


def test_same_seed_same_sampled_model():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    nm = NoiseModel([
        {"name": "x", "sites": [0],
         "strength": {"distribution": "lognormal", "mean": -2.0, "std": 0.3}},
    ])

    def run():
        p = AnalogSimParams(observables=[Observable("z", 0)], dt=0.1,
                            elapsed_time=0.1, num_traj=2, max_bond_dim=4,
                            sample_timesteps=False, random_seed=7)
        return Simulator().run(State(2), ham, p, nm).noise_model.processes[0]["strength"]

    assert run() == run()


def test_independent_site_sampling():
    """Ten sites with identical distribution params draw independently
    (reference test_independent_site_sampling)."""
    nm = NoiseModel([
        {"name": "x", "sites": [i],
         "strength": {"distribution": "lognormal", "mean": 0.0, "std": 0.1}}
        for i in range(10)
    ])
    out = nm.sample(rng=np.random.default_rng(42))
    strengths = [p["strength"] for p in out.processes]
    assert len(strengths) == 10
    assert all(isinstance(s, float) and s > 0 for s in strengths)
    assert len(set(strengths)) > 1


def test_static_strength_preserved_through_sample():
    nm = NoiseModel([{"name": "x", "sites": [0], "strength": 0.5}])
    assert nm.sample(rng=np.random.default_rng(42)).processes[0]["strength"] == pytest.approx(0.5)


def test_truncated_normal_negative_mean_zero_std_returns_zero():
    nm = NoiseModel([
        {"name": "x", "sites": [0],
         "strength": {"distribution": "truncated_normal", "mean": -0.5, "std": 0.0}},
    ])
    assert nm.sample(0).processes[0]["strength"] == pytest.approx(0.0, abs=1e-12)


def test_truncated_normal_samples_nonnegative_and_vary():
    nm = NoiseModel([
        {"name": "x", "sites": [0],
         "strength": {"distribution": "truncated_normal", "mean": 0.0, "std": 1.0}},
    ])
    rng = np.random.default_rng(42)
    vals = [nm.sample(rng).processes[0]["strength"] for _ in range(50)]
    assert all(v >= 0 for v in vals)
    assert len(set(vals)) > 1


# ------------------------------------------------------------------ type guards
def test_non_dict_process_entry_rejected():
    with pytest.raises(TypeError, match="dict"):
        NoiseModel(["not-a-dict"])


def test_processes_must_be_sequence():
    with pytest.raises(TypeError, match="list or tuple"):
        NoiseModel({"name": "x", "sites": [0], "strength": 0.1})


def test_scheduled_jumps_must_be_sequence():
    with pytest.raises(TypeError, match="list or tuple"):
        NoiseModel(scheduled_jumps={"time": 0.0, "sites": [0], "name": "x"})


def test_name_type_and_value_guards():
    with pytest.raises(TypeError, match="str"):
        NoiseModel([{"name": 1, "sites": [0], "strength": 0.1}])
    with pytest.raises(ValueError):
        NoiseModel([{"name": "", "sites": [0], "strength": 0.1}])


def test_sites_type_and_value_guards():
    with pytest.raises(TypeError):
        NoiseModel([{"name": "x", "sites": 0, "strength": 0.1}])
    with pytest.raises(ValueError):
        NoiseModel([{"name": "x", "sites": [-1], "strength": 0.1}])


def test_one_site_factors_rejected():
    with pytest.raises(ValueError, match="factors"):
        NoiseModel([
            {"name": "custom", "sites": [0], "strength": 0.1,
             "factors": (PAULI["X"], PAULI["Y"])},
        ])


def test_adjacent_two_site_factors_rejected():
    with pytest.raises(ValueError, match="'matrix', not 'factors'"):
        NoiseModel([
            {"name": "custom", "sites": [0, 1], "strength": 0.1,
             "factors": (PAULI["X"], PAULI["Y"])},
        ])


# ---------------------------------------------------------------- is_pauli
def test_is_pauli_structure_branches():
    """Missing matrices, arity mismatches, factor pairs, and unit-phase
    scaling (reference test_is_pauli_structure_branches)."""
    # named Pauli with no explicit matrix: library lookup applies
    nm = NoiseModel([{"name": "x", "sites": [0], "strength": 0.1}])
    assert is_pauli(nm.processes[0]) is True
    # 3-site process: never the Pauli shortcut
    assert is_pauli({"sites": [0, 1, 2], "name": "x", "strength": 0.1}) is False
    # unit-phase scaled Pauli counts; magnitude-scaled does not
    phased = np.exp(1j * 0.3) * PAULI["X"]
    assert is_pauli({"sites": [0], "name": "x", "strength": 0.1, "matrix": phased}) is True
    assert is_pauli({"sites": [0], "name": "x", "strength": 0.1,
                     "matrix": 2 * PAULI["X"]}) is False
    # wrong-dimension matrix
    assert is_pauli({"sites": [0], "name": "q", "strength": 0.1,
                     "matrix": np.eye(3, dtype=complex)}) is False
    # adjacent two-site Pauli kron
    kron = np.kron(PAULI["X"], PAULI["Z"])
    assert is_pauli({"sites": [0, 1], "name": "xz", "strength": 0.1,
                     "matrix": kron}) is True


def test_is_pauli_longrange_crosstalk():
    lr = NoiseModel([
        {"name": "longrange_crosstalk_xy", "sites": [0, 2], "strength": 0.1},
    ]).processes[0]
    assert is_pauli(lr) is True


def test_is_pauli_small_perturbation_not_shortcut():
    perturbed = PAULI["X"].astype(complex).copy()
    perturbed[0, 1] += 5e-6
    proc = NoiseModel([
        {"name": "almost_x", "sites": [0], "strength": 0.1, "matrix": perturbed},
    ]).processes[0]
    assert is_pauli(proc) is False


def test_get_operator_returns_copy():
    """Mutating a returned operator must not corrupt the model."""
    nm = NoiseModel([{"name": "x", "sites": [0], "strength": 0.1}])
    m1 = nm.processes[0].get("matrix")
    if m1 is None:
        pytest.skip("model stores named operators lazily")
    m1[0, 0] = 99.0
    nm2 = NoiseModel([{"name": "x", "sites": [0], "strength": 0.1}])
    assert nm2.processes[0]["matrix"][0, 0] != 99.0
