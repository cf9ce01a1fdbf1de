"""NoiseCharacterizer: fit Lindblad jump rates by CMA-ES trajectory matching.

Reference API parity: mqt-yaqs noise_characterizer.py — ``characterize``
accepts exactly one of a reference NoiseModel (benchmark shortcut) or
experimental expectation trajectories, with automatic forward-model
representation cutover (Lindblad <= 8 qubits, MCWF <= 10, then TJM).
"""

from __future__ import annotations

import numpy as np

from .characterization.noise.optimization import (
    DEFAULT_LINDBLAD_MAX_QUBITS,
    DEFAULT_VECTOR_MAX_QUBITS,
    NoiseCharacterizationResult,
    run_optimization_characterization,
)
from .parallel.runtime import ExecutionConfig

__all__ = ["NoiseCharacterizer"]


class NoiseCharacterizer:
    """Markovian noise characterization via CMA-ES rate fitting."""

    def __init__(
        self,
        *,
        parallel: bool = True,
        batch_size: int | None = None,
        show_progress: bool = False,
        representation: str = "auto",
        lindblad_max_qubits: int = DEFAULT_LINDBLAD_MAX_QUBITS,
        vector_max_qubits: int = DEFAULT_VECTOR_MAX_QUBITS,
        max_workers: int | None = None,  # reference API parity
    ) -> None:
        del max_workers
        self._execution = ExecutionConfig(
            parallel=parallel, batch_size=batch_size, show_progress=show_progress
        )
        self.representation = representation
        self.lindblad_max_qubits = int(lindblad_max_qubits)
        self.vector_max_qubits = int(vector_max_qubits)
        self.result: NoiseCharacterizationResult | None = None

    def characterize(
        self,
        hamiltonian,
        sim_params,
        *,
        init_state,
        init_guess,
        observables,
        x_low: np.ndarray,
        x_up: np.ndarray,
        reference_model=None,
        ref_expectations=None,
        representation: str | None = None,
        **optimizer_kwargs,
    ) -> NoiseCharacterizationResult:
        """Fit noise strengths; see module docstring.

        ``representation=`` overrides the constructor's choice for this call
        (previously it collided with the forwarded constructor kwarg and
        raised TypeError)."""
        self.result = run_optimization_characterization(
            hamiltonian=hamiltonian,
            sim_params=sim_params,
            init_state=init_state,
            init_guess=init_guess,
            observables=observables,
            x_low=x_low,
            x_up=x_up,
            reference_model=reference_model,
            ref_expectations=ref_expectations,
            execution=self._execution,
            representation=(
                self.representation if representation is None else representation
            ),
            lindblad_max_qubits=self.lindblad_max_qubits,
            vector_max_qubits=self.vector_max_qubits,
            **optimizer_kwargs,
        )
        return self.result
