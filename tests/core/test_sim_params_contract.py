"""SimParams / Observable contract tests.

Behavioral parity with the reference suite
(/root/reference/tests/core/data_structures/test_simulation_parameters.py):
observable construction + validation, time-grid handling, presets and
overrides, constructor guards, digital output requirements, and observable
ordering.  The adaptive ``krylov_tol`` is replaced by the static
``krylov_dim`` in this build (documented deviation).
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import AnalogSimParams, DigitalSimParams, Observable
from yaqs_tpu.core.sim_params import SIMULATION_PRESETS, EvolutionMode


# ---------------------------------------------------------------------------
# Observable
# ---------------------------------------------------------------------------


def test_observable_creation_valid() -> None:
    obs = Observable("z", 3)
    assert obs.name == "z"
    assert obs.sites == 3
    assert obs.site_list == [3]
    np.testing.assert_allclose(obs.matrix, np.diag([1.0, -1.0]))


def test_observable_accepts_custom_local_matrix() -> None:
    mat = np.array([[0.0, 1.0], [1.0, 0.0]])
    obs = Observable(mat, 0)
    assert obs.name == "local"
    np.testing.assert_allclose(obs.matrix, mat)


def test_observable_accepts_named_position_operator() -> None:
    obs = Observable("position", 0, positions=np.linspace(-1, 1, 4))
    assert obs.name == "position"
    np.testing.assert_allclose(np.diag(obs.matrix).real, np.linspace(-1, 1, 4))


def test_position_observable_requires_positions() -> None:
    with pytest.raises(ValueError, match="positions"):
        Observable("position", 0)


@pytest.mark.parametrize(
    "positions",
    [np.ones((2, 2)), np.array([]), np.array([1.0, np.nan])],
)
def test_position_observable_rejects_invalid_positions(positions) -> None:
    with pytest.raises(ValueError, match="positions"):
        Observable("position", 0, positions=positions)


def test_named_observable_rejects_unexpected_parameters() -> None:
    with pytest.raises(ValueError, match="does not accept parameters"):
        Observable("z", 0, positions=np.ones(3))


def test_matrix_observable_rejects_named_parameters() -> None:
    with pytest.raises(ValueError, match="named parameters"):
        Observable(np.eye(2), 0, positions=np.ones(3))


@pytest.mark.parametrize(
    "matrix", [np.ones((2, 3)), np.array([[np.inf, 0], [0, 0]])]
)
def test_observable_rejects_invalid_custom_local_matrix(matrix) -> None:
    with pytest.raises(ValueError):
        Observable(matrix, 0)


def test_observable_unknown_name() -> None:
    with pytest.raises(ValueError, match="Unknown observable"):
        Observable("not_a_gate", 0)


def test_observable_requires_sites() -> None:
    with pytest.raises(ValueError, match="sites"):
        Observable("z")


def test_observable_bitstring_pvm() -> None:
    obs = Observable("0110")
    assert obs.name == "pvm"
    assert obs.bitstring == "0110"


def test_observable_entropy_and_spectrum() -> None:
    for name in ("entropy", "schmidt_spectrum"):
        obs = Observable(name, [2, 3])
        assert obs.name == name
        assert obs.matrix is None
        assert obs.site_list == [2, 3]


# ---------------------------------------------------------------------------
# AnalogSimParams: time grid
# ---------------------------------------------------------------------------


def test_analog_simparams_basic() -> None:
    p = AnalogSimParams([Observable("z", 0)], elapsed_time=1.0, dt=0.1)
    assert p.num_steps == 10
    assert len(p.times) == 11
    np.testing.assert_allclose(p.times, np.arange(11) * 0.1)


def test_times_no_float_overshoot() -> None:
    # 0.3 / 0.1 is 2.9999... in floats; rounding must still give 3 steps
    p = AnalogSimParams([], elapsed_time=0.3, dt=0.1)
    assert p.num_steps == 3
    assert p.times[-1] == pytest.approx(0.3)


def test_zero_elapsed_time() -> None:
    p = AnalogSimParams([], elapsed_time=0.0, dt=0.1)
    assert p.num_steps == 0
    np.testing.assert_allclose(p.times, [0.0])


@pytest.mark.parametrize(
    ("elapsed_time", "dt"),
    [(1.0000000000001, 0.1), (0.7, 0.1)],
)
def test_accepts_float64_rounding_dust(elapsed_time: float, dt: float) -> None:
    p = AnalogSimParams([], elapsed_time=elapsed_time, dt=dt)
    assert p.num_steps == round(elapsed_time / dt)


def test_rejects_nonintegral_duration() -> None:
    with pytest.raises(ValueError, match="integer multiple"):
        AnalogSimParams([], elapsed_time=1.05, dt=0.1)


@pytest.mark.parametrize(
    ("elapsed_time", "dt", "match"),
    [
        (-1.0, 0.1, "nonnegative"),
        (1.0, 0.0, "positive"),
        (1.0, -0.1, "positive"),
        (float("inf"), 0.1, "nonnegative|finite"),
        (1.0, float("nan"), "positive|finite"),
    ],
)
def test_rejects_invalid_time_parameters(elapsed_time, dt, match) -> None:
    with pytest.raises(ValueError, match=match):
        AnalogSimParams([], elapsed_time=elapsed_time, dt=dt)


@pytest.mark.parametrize(
    ("elapsed_time", "dt"), [("1.0", 0.1), (1.0, "0.1"), (True, 0.1), (1.0, None)]
)
def test_rejects_non_numeric_time_parameters(elapsed_time, dt) -> None:
    with pytest.raises(TypeError):
        AnalogSimParams([], elapsed_time=elapsed_time, dt=dt)


# ---------------------------------------------------------------------------
# Presets and overrides
# ---------------------------------------------------------------------------


def test_analog_defaults_use_balanced() -> None:
    p = AnalogSimParams([])
    bal = SIMULATION_PRESETS["balanced"]
    assert p.preset == "balanced"
    assert p.num_traj == bal["num_traj"]
    assert p.max_bond_dim == bal["max_bond_dim"]
    assert p.svd_threshold == bal["svd_threshold"]
    assert p.krylov_dim == bal["krylov_dim"]
    assert p.order == 1
    assert p.sample_timesteps is True
    assert p.evolution_mode == EvolutionMode.TDVP


@pytest.mark.parametrize("preset", sorted(SIMULATION_PRESETS))
def test_analog_presets(preset: str) -> None:
    p = AnalogSimParams([], preset=preset)
    expected = SIMULATION_PRESETS[preset]
    assert p.num_traj == expected["num_traj"]
    assert p.max_bond_dim == expected["max_bond_dim"]
    assert p.svd_threshold == expected["svd_threshold"]


@pytest.mark.parametrize("preset", sorted(SIMULATION_PRESETS))
def test_digital_presets(preset: str) -> None:
    p = DigitalSimParams([Observable("z", 0)], preset=preset)
    expected = SIMULATION_PRESETS[preset]
    assert p.num_traj == expected["num_traj"]
    assert p.max_bond_dim == expected["max_bond_dim"]


def test_preset_explicit_overrides() -> None:
    p = AnalogSimParams([], preset="fast", num_traj=7, max_bond_dim=3, svd_threshold=0.5)
    assert p.num_traj == 7
    assert p.max_bond_dim == 3
    assert p.svd_threshold == 0.5
    # krylov_dim still from preset
    assert p.krylov_dim == SIMULATION_PRESETS["fast"]["krylov_dim"]


def test_max_bond_dim_none_overrides_preset() -> None:
    p = AnalogSimParams([], preset="fast", max_bond_dim=None)
    assert p.max_bond_dim is None


def test_invalid_preset_rejected() -> None:
    with pytest.raises(ValueError, match="preset"):
        AnalogSimParams([], preset="turbo")
    with pytest.raises(ValueError, match="preset"):
        DigitalSimParams([Observable("z", 0)], preset=None)


# ---------------------------------------------------------------------------
# Constructor guards
# ---------------------------------------------------------------------------


def test_order_validation() -> None:
    with pytest.raises(ValueError, match="order"):
        AnalogSimParams([], order=3)


def test_evolution_mode_validation() -> None:
    AnalogSimParams([], evolution_mode="bug")
    with pytest.raises(ValueError, match="evolution_mode"):
        AnalogSimParams([], evolution_mode="rk4")


def test_tdvp_mode_validation() -> None:
    for mode in ("1site", "2site", "dynamic"):
        assert AnalogSimParams([], tdvp_mode=mode).tdvp_mode == mode
    with pytest.raises(ValueError, match="tdvp_mode"):
        AnalogSimParams([], tdvp_mode="3site")


@pytest.mark.parametrize("invalid", [0, -1, 1.5, "2", True])
def test_tdvp_sweeps_validation(invalid) -> None:
    with pytest.raises(ValueError, match="tdvp_sweeps"):
        AnalogSimParams([], tdvp_sweeps=invalid)


def test_gate_mode_validation() -> None:
    for mode in ("swaps", "tdvp", "full-tdvp", "mpo"):
        assert DigitalSimParams([Observable("z", 0)], gate_mode=mode).gate_mode == mode
    with pytest.raises(ValueError, match="gate_mode"):
        DigitalSimParams([Observable("z", 0)], gate_mode="magic")


@pytest.mark.parametrize("bad", ["3", 3.5, True, None])
def test_random_seed_rejects_invalid_type(bad) -> None:
    if bad is None:
        assert AnalogSimParams([], random_seed=None).random_seed is None
    else:
        with pytest.raises(TypeError, match="random_seed"):
            AnalogSimParams([], random_seed=bad)


def test_random_seed_rejects_negative() -> None:
    with pytest.raises(ValueError, match="nonnegative"):
        DigitalSimParams([Observable("z", 0)], random_seed=-1)


def test_digital_requires_output() -> None:
    with pytest.raises(ValueError, match="output"):
        DigitalSimParams([])
    # each output channel alone is fine
    DigitalSimParams([Observable("z", 0)])
    DigitalSimParams([], shots=16)
    DigitalSimParams([], get_state=True)


def test_digital_sample_layers_requires_observables() -> None:
    with pytest.raises(ValueError, match="sample_layers"):
        DigitalSimParams([], shots=16, sample_layers=True)


@pytest.mark.parametrize("bad", [-1, 2.5, "4", True])
def test_digital_rejects_invalid_shots(bad) -> None:
    with pytest.raises(ValueError, match="shots"):
        DigitalSimParams([Observable("z", 0)], shots=bad)


def test_digital_rejects_mixed_pvm_with_non_pvm() -> None:
    with pytest.raises(ValueError, match="pvm"):
        DigitalSimParams([Observable("0101"), Observable("z", 0)])
    # all-pvm and all-regular are both accepted
    DigitalSimParams([Observable("0101"), Observable("1010")])
    DigitalSimParams([Observable("z", 0), Observable("x", 1)])


def test_digital_rejects_positional_fast_path_args() -> None:
    # gate_mode and later are keyword-only
    with pytest.raises(TypeError):
        DigitalSimParams([Observable("z", 0)], 8, 0, 16, "discarded_weight", 1e-6, 6, "mpo")


# ---------------------------------------------------------------------------
# Observable ordering
# ---------------------------------------------------------------------------


def test_sorted_observables_site_ascending_stable() -> None:
    obs = [Observable("z", 3), Observable("x", 1), Observable("y", 3), Observable("z", 0)]
    p = AnalogSimParams(obs)
    ordered = p.sorted_observables
    assert [o.site_list[0] for o in ordered] == [0, 1, 3, 3]
    # stable: first 3-site observable is the z (user index 0)
    assert ordered[2].name == "z"
    assert ordered[3].name == "y"
    # user -> sorted index map round-trips
    idx = p.observable_sorted_indices
    for user_i, row in enumerate(idx):
        assert ordered[row] is obs[user_i]


def test_sorted_observables_pvm_last() -> None:
    obs = [Observable("0000"), Observable("z", 2)]
    p = AnalogSimParams(obs)
    ordered = p.sorted_observables
    assert ordered[0].name == "z"
    assert ordered[1].name == "pvm"


def test_entropy_sites_len_flexible() -> None:
    """A single index means the bond (i, i+1) (reference gate_library
    entropy/schmidt_spectrum set_sites flexibility)."""
    for name in ("entropy", "schmidt_spectrum"):
        assert Observable(name, 4).site_list == [4, 5]
        assert Observable(name, [7]).site_list == [7, 8]
        assert Observable(name, [2, 3]).site_list == [2, 3]
