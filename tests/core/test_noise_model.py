"""NoiseModel contract tests.

Behavioral parity with the reference suite
(/root/reference/tests/core/data_structures/test_noise_model.py): process
normalization (matrix vs factors, site ordering, crosstalk names),
construction-time validation, distribution strengths + static-disorder
sampling, scheduled-jump normalization, is_pauli structure detection, and
run-context validation.
"""

from __future__ import annotations

import logging

import numpy as np
import pytest

from yaqs_tpu import NoiseModel
from yaqs_tpu.core.noise_model import (
    compile_noise,
    is_pauli,
    validate_noise_model_for_run,
)
from yaqs_tpu.models.operators import lowering, pauli_x, pauli_y, pauli_z, raising


# ---------------------------------------------------------------------------
# Construction and normalization
# ---------------------------------------------------------------------------


def test_noise_model_creation() -> None:
    nm = NoiseModel(
        [
            {"name": "lowering", "sites": [0], "strength": 0.1},
            {"name": "z", "sites": [1], "strength": 0.2},
        ]
    )
    assert len(nm) == 2
    assert nm.processes[0]["sites"] == [0]
    np.testing.assert_allclose(nm.processes[0]["matrix"], lowering)
    np.testing.assert_allclose(nm.processes[1]["matrix"], pauli_z)


def test_noise_model_empty_and_none() -> None:
    assert len(NoiseModel([])) == 0
    assert len(NoiseModel()) == 0
    assert NoiseModel().processes == []
    assert NoiseModel().scheduled_jumps == []


@pytest.mark.parametrize("key", ["name", "sites", "strength"])
def test_missing_required_key(key: str) -> None:
    proc = {"name": "z", "sites": [0], "strength": 0.1}
    del proc[key]
    with pytest.raises(ValueError, match=f"'{key}'"):
        NoiseModel([proc])


def test_processes_must_be_sequence_of_dicts() -> None:
    with pytest.raises(TypeError, match="list or tuple"):
        NoiseModel({"name": "z", "sites": [0], "strength": 0.1})
    with pytest.raises(TypeError, match="dictionary"):
        NoiseModel(["z"])


def test_name_type_and_empty() -> None:
    with pytest.raises(TypeError, match="must be a string"):
        NoiseModel([{"name": 3, "sites": [0], "strength": 0.1}])
    with pytest.raises(ValueError, match="nonempty"):
        NoiseModel([{"name": "", "sites": [0], "strength": 0.1}])


def test_one_site_matrix_explicit() -> None:
    mat = np.array([[0.0, 2.0], [0.0, 0.0]])
    nm = NoiseModel([{"name": "custom", "sites": [0], "strength": 0.5, "matrix": mat}])
    np.testing.assert_allclose(nm.processes[0]["matrix"], mat)
    # stored as a fresh complex copy
    assert nm.processes[0]["matrix"].dtype == np.complex128


def test_one_site_matrix_auto() -> None:
    nm = NoiseModel([{"name": "raising", "sites": [2], "strength": 0.5}])
    np.testing.assert_allclose(nm.processes[0]["matrix"], raising)


def test_one_site_factors_rejected() -> None:
    with pytest.raises(ValueError, match="do not accept 'factors'"):
        NoiseModel(
            [{"name": "z", "sites": [0], "strength": 0.1, "factors": (pauli_z, pauli_z)}]
        )


def test_adjacent_two_site_matrix_auto() -> None:
    nm = NoiseModel([{"name": "crosstalk_xy", "sites": [1, 2], "strength": 0.3}])
    proc = nm.processes[0]
    assert proc["sites"] == [1, 2]
    assert "factors" not in proc
    np.testing.assert_allclose(proc["matrix"], np.kron(pauli_x, pauli_y))


def test_adjacent_two_site_descending_crosstalk_swaps_letters() -> None:
    nm = NoiseModel([{"name": "crosstalk_xy", "sites": [2, 1], "strength": 0.3}])
    proc = nm.processes[0]
    assert proc["sites"] == [1, 2]
    # caller said X on site 2, Y on site 1 -> ascending order swaps letters
    np.testing.assert_allclose(proc["matrix"], np.kron(pauli_y, pauli_x))


def test_adjacent_factors_rejected() -> None:
    with pytest.raises(ValueError, match="use 'matrix', not 'factors'"):
        NoiseModel(
            [
                {
                    "name": "custom",
                    "sites": [0, 1],
                    "strength": 0.1,
                    "factors": (pauli_x, pauli_x),
                }
            ]
        )


def test_adjacent_library_two_site() -> None:
    nm = NoiseModel([{"name": "lowering_two", "sites": [0, 1], "strength": 0.1}])
    np.testing.assert_allclose(nm.processes[0]["matrix"], np.kron(lowering, lowering))
    nm = NoiseModel([{"name": "raising_two", "sites": [0, 1], "strength": 0.1}])
    np.testing.assert_allclose(nm.processes[0]["matrix"], np.kron(raising, raising))


def test_longrange_two_site_factors_auto() -> None:
    nm = NoiseModel([{"name": "longrange_crosstalk_zx", "sites": [0, 3], "strength": 0.2}])
    proc = nm.processes[0]
    assert "matrix" not in proc
    f0, f1 = proc["factors"]
    np.testing.assert_allclose(f0, pauli_z)
    np.testing.assert_allclose(f1, pauli_x)


def test_longrange_descending_sites_swap_factors() -> None:
    nm = NoiseModel([{"name": "crosstalk_zx", "sites": [3, 0], "strength": 0.2}])
    f0, f1 = nm.processes[0]["factors"]
    # Z was requested on site 3, X on site 0 -> ascending order = (X, Z)
    np.testing.assert_allclose(f0, pauli_x)
    np.testing.assert_allclose(f1, pauli_z)
    assert nm.processes[0]["sites"] == [0, 3]


def test_longrange_two_site_factors_explicit() -> None:
    a = np.array([[0, 1], [1, 0]], dtype=complex)
    b = np.array([[1, 0], [0, -1]], dtype=complex)
    nm = NoiseModel(
        [{"name": "custom", "sites": [4, 1], "strength": 0.2, "factors": (a, b)}]
    )
    f0, f1 = nm.processes[0]["factors"]
    np.testing.assert_allclose(f0, b)  # swapped to ascending order
    np.testing.assert_allclose(f1, a)


def test_longrange_unknown_label_without_factors_raises() -> None:
    with pytest.raises(ValueError, match="must specify 'factors'"):
        NoiseModel([{"name": "mystery", "sites": [0, 2], "strength": 0.1}])


def test_longrange_full_matrix_rejected() -> None:
    with pytest.raises(ValueError, match="require 'factors'"):
        NoiseModel(
            [
                {
                    "name": "custom",
                    "sites": [0, 2],
                    "strength": 0.1,
                    "matrix": np.eye(4),
                }
            ]
        )


def test_matrix_and_factors_together_rejected() -> None:
    with pytest.raises(ValueError, match="both 'matrix' and 'factors'"):
        NoiseModel(
            [
                {
                    "name": "custom",
                    "sites": [0, 2],
                    "strength": 0.1,
                    "matrix": np.eye(4),
                    "factors": (pauli_x, pauli_x),
                }
            ]
        )


def test_factors_none_rejected() -> None:
    with pytest.raises(ValueError, match="not None"):
        NoiseModel([{"name": "custom", "sites": [0, 2], "strength": 0.1, "factors": None}])


def test_factors_wrong_arity_rejected() -> None:
    with pytest.raises(ValueError, match="exactly two"):
        NoiseModel(
            [{"name": "c", "sites": [0, 2], "strength": 0.1, "factors": (pauli_x,)}]
        )
    with pytest.raises(ValueError, match="exactly two"):
        NoiseModel(
            [
                {
                    "name": "c",
                    "sites": [0, 2],
                    "strength": 0.1,
                    "factors": (pauli_x, pauli_x, pauli_x),
                }
            ]
        )


def test_reversed_custom_matrix_rejected() -> None:
    with pytest.raises(ValueError, match="ascending"):
        NoiseModel(
            [{"name": "c", "sites": [1, 0], "strength": 0.1, "matrix": np.eye(4)}]
        )


def test_unknown_operator_name_raises() -> None:
    with pytest.raises(ValueError, match="Unknown noise operator"):
        NoiseModel([{"name": "not_an_operator", "sites": [0], "strength": 0.1}])


def test_tuple_sites_normalized() -> None:
    nm = NoiseModel([{"name": "z", "sites": (1,), "strength": 0.1}])
    assert nm.processes[0]["sites"] == [1]


def test_sites_type_guards() -> None:
    with pytest.raises(TypeError, match="list or tuple"):
        NoiseModel([{"name": "z", "sites": 0, "strength": 0.1}])
    with pytest.raises(TypeError, match="booleans"):
        NoiseModel([{"name": "z", "sites": [True], "strength": 0.1}])
    with pytest.raises(ValueError, match="nonnegative"):
        NoiseModel([{"name": "z", "sites": [-1], "strength": 0.1}])


def test_duplicate_and_empty_sites_rejected() -> None:
    with pytest.raises(ValueError, match="distinct"):
        NoiseModel([{"name": "crosstalk_zz", "sites": [1, 1], "strength": 0.1}])
    with pytest.raises(ValueError, match="exactly 1 or 2"):
        NoiseModel([{"name": "z", "sites": [], "strength": 0.1}])
    with pytest.raises(ValueError, match="exactly 1 or 2"):
        NoiseModel([{"name": "z", "sites": [0, 1, 2], "strength": 0.1}])


def test_negative_strength_rejected() -> None:
    with pytest.raises(ValueError, match="nonnegative"):
        NoiseModel([{"name": "z", "sites": [0], "strength": -0.1}])


@pytest.mark.parametrize("bad", [float("nan"), float("inf"), -float("inf")])
def test_nonfinite_strength_rejected(bad: float) -> None:
    with pytest.raises(ValueError, match="finite"):
        NoiseModel([{"name": "z", "sites": [0], "strength": bad}])


def test_bool_strength_rejected() -> None:
    with pytest.raises(TypeError, match="booleans"):
        NoiseModel([{"name": "z", "sites": [0], "strength": True}])


def test_matrix_validation_errors() -> None:
    with pytest.raises(ValueError, match="square"):
        NoiseModel(
            [{"name": "c", "sites": [0], "strength": 0.1, "matrix": np.ones((2, 3))}]
        )
    with pytest.raises(TypeError, match="numeric"):
        NoiseModel(
            [{"name": "c", "sites": [0], "strength": 0.1, "matrix": [["a", "b"]]}]
        )
    with pytest.raises(ValueError, match="finite"):
        NoiseModel(
            [
                {
                    "name": "c",
                    "sites": [0],
                    "strength": 0.1,
                    "matrix": np.array([[np.inf, 0], [0, 0]]),
                }
            ]
        )


def test_explicit_crosstalk_matrix_not_overwritten() -> None:
    mat = np.diag([1.0, 2.0, 3.0, 4.0])
    nm = NoiseModel(
        [{"name": "crosstalk_xx", "sites": [0, 1], "strength": 0.1, "matrix": mat}]
    )
    np.testing.assert_allclose(nm.processes[0]["matrix"], mat)


def test_get_operator_returns_copy() -> None:
    a = NoiseModel.get_operator("z")
    a[0, 0] = 99.0
    b = NoiseModel.get_operator("z")
    np.testing.assert_allclose(b, pauli_z)


def test_get_operator_crosstalk() -> None:
    np.testing.assert_allclose(
        NoiseModel.get_operator("crosstalk_yz"), np.kron(pauli_y, pauli_z)
    )
    with pytest.raises(ValueError, match="Unknown noise operator"):
        NoiseModel.get_operator("crosstalk_ab")


# ---------------------------------------------------------------------------
# Distribution strengths + static disorder sampling
# ---------------------------------------------------------------------------


def test_static_noise_strength_passthrough() -> None:
    nm = NoiseModel([{"name": "z", "sites": [0], "strength": 0.25}])
    assert not nm.has_distributions
    assert nm.sample(0).processes[0]["strength"] == 0.25


def test_normal_distribution_sampling() -> None:
    nm = NoiseModel(
        [
            {
                "name": "z",
                "sites": [0],
                "strength": {"distribution": "normal", "mean": 0.5, "std": 0.01},
            }
        ]
    )
    assert nm.has_distributions
    rng = np.random.default_rng(0)
    vals = [nm.sample(rng).processes[0]["strength"] for _ in range(200)]
    assert all(isinstance(v, float) and v >= 0 for v in vals)
    assert abs(np.mean(vals) - 0.5) < 0.01
    assert 0.005 < np.std(vals) < 0.02


def test_normal_clamping_warning(caplog: pytest.LogCaptureFixture) -> None:
    nm = NoiseModel(
        [
            {
                "name": "z",
                "sites": [0],
                "strength": {"distribution": "normal", "mean": -5.0, "std": 0.1},
            }
        ]
    )
    with caplog.at_level(logging.WARNING):
        out = nm.sample(3)
    assert out.processes[0]["strength"] == 0.0
    assert "clamped" in caplog.text


def test_lognormal_distribution_sampling() -> None:
    nm = NoiseModel(
        [
            {
                "name": "z",
                "sites": [0],
                "strength": {"distribution": "lognormal", "mean": -2.0, "std": 0.3},
            }
        ]
    )
    rng = np.random.default_rng(1)
    vals = np.array([nm.sample(rng).processes[0]["strength"] for _ in range(500)])
    assert np.all(vals > 0)
    # lognormal median = exp(mean)
    assert abs(np.median(vals) - np.exp(-2.0)) < 0.02


def test_truncated_normal_sampling_nonnegative() -> None:
    nm = NoiseModel(
        [
            {
                "name": "z",
                "sites": [0],
                "strength": {
                    "distribution": "truncated_normal",
                    "mean": 0.05,
                    "std": 0.1,
                },
            }
        ]
    )
    rng = np.random.default_rng(2)
    vals = np.array([nm.sample(rng).processes[0]["strength"] for _ in range(300)])
    assert np.all(vals >= 0)
    # truncation shifts the mean above the raw 0.05
    assert np.mean(vals) > 0.05


def test_truncated_normal_zero_std() -> None:
    for mean, expected in [(0.7, 0.7), (-0.3, 0.0)]:
        nm = NoiseModel(
            [
                {
                    "name": "z",
                    "sites": [0],
                    "strength": {
                        "distribution": "truncated_normal",
                        "mean": mean,
                        "std": 0.0,
                    },
                }
            ]
        )
        assert nm.sample(0).processes[0]["strength"] == expected


def test_mixed_static_and_distribution() -> None:
    nm = NoiseModel(
        [
            {"name": "z", "sites": [0], "strength": 0.1},
            {
                "name": "x",
                "sites": [1],
                "strength": {"distribution": "normal", "mean": 0.2, "std": 0.0},
            },
        ]
    )
    out = nm.sample(0)
    assert out.processes[0]["strength"] == 0.1
    assert abs(out.processes[1]["strength"] - 0.2) < 1e-12


def test_independent_process_sampling() -> None:
    nm = NoiseModel(
        [
            {
                "name": "z",
                "sites": [i],
                "strength": {"distribution": "normal", "mean": 0.5, "std": 0.1},
            }
            for i in range(4)
        ]
    )
    out = nm.sample(0)
    strengths = [p["strength"] for p in out.processes]
    assert len(set(strengths)) == 4  # independent draws per process


def test_sample_does_not_mutate_original() -> None:
    nm = NoiseModel(
        [
            {
                "name": "z",
                "sites": [0],
                "strength": {"distribution": "normal", "mean": 0.5, "std": 0.1},
            }
        ]
    )
    nm.sample(0)
    assert isinstance(nm.processes[0]["strength"], dict)


def test_invalid_distribution_type() -> None:
    with pytest.raises(ValueError, match="Unsupported distribution"):
        NoiseModel(
            [
                {
                    "name": "z",
                    "sites": [0],
                    "strength": {"distribution": "uniform", "mean": 0.1},
                }
            ]
        )


def test_missing_distribution_key() -> None:
    with pytest.raises(ValueError, match="'distribution' key"):
        NoiseModel([{"name": "z", "sites": [0], "strength": {"mean": 0.1, "std": 0.1}}])


def test_unknown_distribution_key_rejected() -> None:
    with pytest.raises(ValueError, match="Unknown distribution keys"):
        NoiseModel(
            [
                {
                    "name": "z",
                    "sites": [0],
                    "strength": {
                        "distribution": "normal",
                        "mean": 0.1,
                        "std": 0.1,
                        "lower": 0.0,
                    },
                }
            ]
        )


def test_negative_distribution_std_rejected() -> None:
    with pytest.raises(ValueError, match="std must be nonnegative"):
        NoiseModel(
            [
                {
                    "name": "z",
                    "sites": [0],
                    "strength": {"distribution": "normal", "mean": 0.1, "std": -0.1},
                }
            ]
        )


def test_distribution_mean_std_type_guards() -> None:
    with pytest.raises(TypeError, match="real number"):
        NoiseModel(
            [
                {
                    "name": "z",
                    "sites": [0],
                    "strength": {"distribution": "normal", "mean": "a", "std": 0.1},
                }
            ]
        )
    with pytest.raises(ValueError, match="finite"):
        NoiseModel(
            [
                {
                    "name": "z",
                    "sites": [0],
                    "strength": {
                        "distribution": "normal",
                        "mean": 0.0,
                        "std": float("inf"),
                    },
                }
            ]
        )


# ---------------------------------------------------------------------------
# Scheduled jumps
# ---------------------------------------------------------------------------


def test_scheduled_jump_construction_paths() -> None:
    nm = NoiseModel(
        processes=[],
        scheduled_jumps=[
            {"time": 0.5, "sites": [0], "name": "x"},
            {"time": 0.7, "sites": [1, 2], "name": "crosstalk_zz"},
            {"time": 0.9, "sites": [3], "name": "custom", "matrix": np.eye(2)},
        ],
    )
    j0, j1, j2 = nm.scheduled_jumps
    np.testing.assert_allclose(j0["matrix"], pauli_x)
    np.testing.assert_allclose(j1["matrix"], np.kron(pauli_z, pauli_z))
    np.testing.assert_allclose(j2["matrix"], np.eye(2))


def test_scheduled_jump_missing_key() -> None:
    with pytest.raises(ValueError, match="'time'"):
        NoiseModel(scheduled_jumps=[{"sites": [0], "name": "x"}])


def test_scheduled_jump_non_adjacent_rejected() -> None:
    with pytest.raises(ValueError, match="non-adjacent"):
        NoiseModel(scheduled_jumps=[{"time": 0.1, "sites": [0, 2], "name": "crosstalk_zz"}])


def test_scheduled_jump_bool_time_rejected() -> None:
    with pytest.raises(TypeError, match="booleans"):
        NoiseModel(scheduled_jumps=[{"time": True, "sites": [0], "name": "x"}])


def test_scheduled_jump_factors_rejected() -> None:
    with pytest.raises(ValueError, match="do not accept 'factors'"):
        NoiseModel(
            scheduled_jumps=[
                {"time": 0.1, "sites": [0, 1], "name": "c", "factors": (pauli_x, pauli_x)}
            ]
        )


def test_scheduled_jump_descending_crosstalk() -> None:
    nm = NoiseModel(scheduled_jumps=[{"time": 0.1, "sites": [2, 1], "name": "crosstalk_xy"}])
    jump = nm.scheduled_jumps[0]
    assert jump["sites"] == [1, 2]
    np.testing.assert_allclose(jump["matrix"], np.kron(pauli_y, pauli_x))


def test_scheduled_jump_descending_custom_matrix_rejected() -> None:
    with pytest.raises(ValueError, match="ascending"):
        NoiseModel(
            scheduled_jumps=[{"time": 0.1, "sites": [2, 1], "name": "c", "matrix": np.eye(4)}]
        )


# ---------------------------------------------------------------------------
# is_pauli structure detection
# ---------------------------------------------------------------------------


def test_is_pauli_one_site() -> None:
    for name in ("x", "y", "z"):
        nm = NoiseModel([{"name": name, "sites": [0], "strength": 0.1}])
        assert is_pauli(nm.processes[0])
    nm = NoiseModel([{"name": "lowering", "sites": [0], "strength": 0.1}])
    assert not is_pauli(nm.processes[0])


def test_is_pauli_unit_phase_only() -> None:
    # exp(i phi) X is Pauli; 2 X is not (breaks L^dag L = I)
    nm = NoiseModel(
        [{"name": "c", "sites": [0], "strength": 0.1, "matrix": np.exp(0.3j) * pauli_x}]
    )
    assert is_pauli(nm.processes[0])
    nm = NoiseModel([{"name": "c", "sites": [0], "strength": 0.1, "matrix": 2 * pauli_x}])
    assert not is_pauli(nm.processes[0])


def test_is_pauli_identity_not_shortcut() -> None:
    nm = NoiseModel([{"name": "c", "sites": [0], "strength": 0.1, "matrix": np.eye(2)}])
    assert not is_pauli(nm.processes[0])


def test_is_pauli_adjacent_kron() -> None:
    nm = NoiseModel([{"name": "crosstalk_xz", "sites": [0, 1], "strength": 0.1}])
    assert is_pauli(nm.processes[0])
    nm = NoiseModel([{"name": "lowering_two", "sites": [0, 1], "strength": 0.1}])
    assert not is_pauli(nm.processes[0])


def test_is_pauli_perturbation_not_shortcut() -> None:
    m = np.kron(pauli_x, pauli_x) + 1e-3 * np.eye(4)
    nm = NoiseModel([{"name": "c", "sites": [0, 1], "strength": 0.1, "matrix": m}])
    assert not is_pauli(nm.processes[0])


def test_is_pauli_longrange_factors() -> None:
    nm = NoiseModel([{"name": "longrange_crosstalk_yy", "sites": [0, 3], "strength": 0.1}])
    assert is_pauli(nm.processes[0])
    nm = NoiseModel(
        [
            {
                "name": "c",
                "sites": [0, 3],
                "strength": 0.1,
                "factors": (pauli_x, lowering),
            }
        ]
    )
    assert not is_pauli(nm.processes[0])


# ---------------------------------------------------------------------------
# Run-context validation + compile
# ---------------------------------------------------------------------------


def test_validate_for_run_site_range() -> None:
    nm = NoiseModel([{"name": "z", "sites": [7], "strength": 0.1}])
    with pytest.raises(ValueError, match="outside"):
        validate_noise_model_for_run(nm, length=4)
    validate_noise_model_for_run(nm, length=8)  # in range: fine
    validate_noise_model_for_run(None, length=4)  # no model: fine


def test_validate_for_run_matrix_shape() -> None:
    nm = NoiseModel([{"name": "c", "sites": [0], "strength": 0.1, "matrix": np.eye(3)}])
    with pytest.raises(ValueError, match="expected"):
        validate_noise_model_for_run(nm, length=4)


def test_compile_requires_sampled_model() -> None:
    nm = NoiseModel(
        [
            {
                "name": "z",
                "sites": [0],
                "strength": {"distribution": "normal", "mean": 0.1, "std": 0.0},
            }
        ]
    )
    with pytest.raises(ValueError, match="sample"):
        compile_noise(nm, length=2)
    assert compile_noise(nm.sample(0), length=2) is not None


def test_compile_empty_and_zero_models() -> None:
    assert compile_noise(NoiseModel([]), length=2) is None
    nm = NoiseModel([{"name": "z", "sites": [0], "strength": 0.0}])
    assert nm.all_zero()
    assert compile_noise(nm, length=2) is None


def test_compile_adjacent_crosstalk_factored_channel() -> None:
    nm = NoiseModel([{"name": "crosstalk_xy", "sites": [0, 1], "strength": 0.3}])
    cn = compile_noise(nm, length=3)
    assert cn.num_channels == 1
    assert cn.num_channels2 == 0
    np.testing.assert_allclose(np.asarray(cn.ch_op1[0]), pauli_x)
    np.testing.assert_allclose(np.asarray(cn.ch_op2[0]), pauli_y)
    # Pauli pair: scalar dissipator rides the right site
    np.testing.assert_allclose(np.asarray(cn.diss_evals)[1], [0.3, 0.3])


def test_compile_adjacent_general_matrix_channel() -> None:
    nm = NoiseModel([{"name": "lowering_two", "sites": [1, 2], "strength": 0.2}])
    cn = compile_noise(nm, length=4)
    assert cn.num_channels == 0
    assert cn.num_channels2 == 1
    m = np.kron(lowering, lowering)
    np.testing.assert_allclose(np.asarray(cn.ch2_op[0]), m)
    np.testing.assert_allclose(np.asarray(cn.ch2_weight_op[0]), m.conj().T @ m)
