"""Frozen public-API contract (reference tests/test_public_api.py:27-52).

The top-level facade is pinned to the reference's 17 exported names; adding
or removing a name is a deliberate API change that must update this test.
"""

from __future__ import annotations

import yaqs_tpu

EXPECTED_PUBLIC_API = frozenset({
    "MPO",
    "MPS",
    "SIMULATION_PRESETS",
    "AnalogSimParams",
    "DigitalSimParams",
    "EquivalenceChecker",
    "Hamiltonian",
    "MemoryCharacterizer",
    "NoiseCharacterizer",
    "NoiseModel",
    "Observable",
    "Result",
    "Simulator",
    "State",
    "__version__",
    "simulator",
    "version_info",
})


def test_public_api_all_matches_documented_surface() -> None:
    assert frozenset(yaqs_tpu.__all__) == EXPECTED_PUBLIC_API


def test_all_names_importable() -> None:
    for name in yaqs_tpu.__all__:
        assert getattr(yaqs_tpu, name, None) is not None, name


def test_characterization_result_not_top_level() -> None:
    """CharacterizationResult is returned by MemoryCharacterizer, not a
    top-level export (reference test_public_api.py:50-52)."""
    assert "CharacterizationResult" not in yaqs_tpu.__all__
