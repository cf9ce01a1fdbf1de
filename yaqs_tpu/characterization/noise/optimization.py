"""Noise-rate optimization: forward model + trajectory loss + CMA loop.

Reference: mqt-yaqs characterization/noise/optimization/{run,trajectories,
loss}.py — resolve the forward-model representation (Lindblad for small
chains, then MCWF, then TJM), simulate or accept reference expectation
trajectories, and fit the per-process Lindblad rates by CMA-ES on the
mean-squared trajectory mismatch.
"""

from __future__ import annotations

import copy
import dataclasses

import numpy as np

from ...core.noise_model import NoiseModel
from ...core.state import State
from ...simulator import Simulator
from .cma import CMAResult, cma_opt

__all__ = [
    "DEFAULT_LINDBLAD_MAX_QUBITS",
    "DEFAULT_VECTOR_MAX_QUBITS",
    "NoiseCharacterizationResult",
    "resolve_noise_representation",
    "run_optimization_characterization",
]

DEFAULT_LINDBLAD_MAX_QUBITS = 8
DEFAULT_VECTOR_MAX_QUBITS = 10


@dataclasses.dataclass
class NoiseCharacterizationResult:
    strengths: np.ndarray
    noise_model: NoiseModel
    loss: float
    representation: str
    ref_expectations: np.ndarray
    fitted_expectations: np.ndarray
    optimizer: CMAResult


def resolve_noise_representation(
    length: int,
    representation: str = "auto",
    lindblad_max_qubits: int = DEFAULT_LINDBLAD_MAX_QUBITS,
    vector_max_qubits: int = DEFAULT_VECTOR_MAX_QUBITS,
) -> str:
    """Auto cutover: Lindblad for small chains, then MCWF, then TJM
    (reference shared/representation.py:25-66)."""
    if representation != "auto":
        return representation
    if length <= lindblad_max_qubits:
        return "density_matrix"
    if length <= vector_max_qubits:
        return "vector"
    return "mps"


def _with_strengths(model: NoiseModel, strengths: np.ndarray) -> NoiseModel:
    out = NoiseModel.__new__(NoiseModel)
    out.processes = [
        {**proc, "strength": float(max(s, 0.0))}
        for proc, s in zip(model.processes, strengths)
    ]
    out.scheduled_jumps = list(model.scheduled_jumps)
    return out


def run_optimization_characterization(
    *,
    hamiltonian,
    sim_params,
    init_state: State,
    init_guess: NoiseModel,
    observables,
    x_low: np.ndarray,
    x_up: np.ndarray,
    reference_model: NoiseModel | None = None,
    ref_expectations: np.ndarray | None = None,
    execution=None,
    representation: str = "auto",
    lindblad_max_qubits: int = DEFAULT_LINDBLAD_MAX_QUBITS,
    vector_max_qubits: int = DEFAULT_VECTOR_MAX_QUBITS,
    sigma0: float | None = None,
    popsize: int | None = None,
    max_iter: int = 60,
    seed: int | None = 0,
) -> NoiseCharacterizationResult:
    if (reference_model is None) == (ref_expectations is None):
        msg = "Specify exactly one of reference_model= or ref_expectations=."
        raise ValueError(msg)
    observables = list(observables)
    if not observables:
        msg = "observables must be a non-empty list (the loss is their mean-squared trajectory mismatch)."
        raise ValueError(msg)
    n_proc = len(init_guess.processes)
    if len(np.atleast_1d(x_low)) != n_proc or len(np.atleast_1d(x_up)) != n_proc:
        msg = (
            f"x_low/x_up must provide one bound per noise process: expected "
            f"{n_proc}, got {len(np.atleast_1d(x_low))}/{len(np.atleast_1d(x_up))}."
        )
        raise ValueError(msg)

    rep = resolve_noise_representation(
        init_state.length, representation, lindblad_max_qubits, vector_max_qubits
    )
    sim = Simulator(
        parallel=getattr(execution, "parallel", True) if execution else True,
        batch_size=getattr(execution, "batch_size", None) if execution else None,
    )

    params = copy.deepcopy(sim_params)
    params.observables = list(observables)
    params.sample_timesteps = True

    def forward(model: NoiseModel) -> np.ndarray:
        state = State(
            init_state.length,
            state=init_state.state,
            representation=rep,
            tensors=init_state.tensors,
            vector=init_state.vector,
            physical_dimensions=init_state.d,
        )
        res = sim.run(state, hamiltonian, params, model)
        return res.expectation_values

    if ref_expectations is None:
        ref_expectations = forward(reference_model)
    ref_expectations = np.asarray(ref_expectations, dtype=float)
    expected_rows = len(observables)
    if ref_expectations.ndim != 2 or ref_expectations.shape[0] != expected_rows:
        # a mis-shaped reference would silently BROADCAST inside the loss
        # (reference trajectories.py validates the same contract)
        msg = (
            "ref_expectations must be a (num_observables, num_timesteps) "
            f"array with {expected_rows} rows, got shape {ref_expectations.shape}."
        )
        raise ValueError(msg)

    x0 = np.asarray([float(p["strength"]) for p in init_guess.processes])
    x_low = np.asarray(x_low, dtype=float)
    x_up = np.asarray(x_up, dtype=float)
    if sigma0 is None:
        sigma0 = float(np.max(x_up - x_low) / 4)

    def loss(x: np.ndarray) -> float:
        vals = forward(_with_strengths(init_guess, x))
        return float(np.mean((vals - ref_expectations) ** 2))

    opt = cma_opt(
        loss,
        x0,
        sigma0,
        x_low=x_low,
        x_up=x_up,
        popsize=popsize,
        max_iter=max_iter,
        seed=seed,
    )
    fitted_model = _with_strengths(init_guess, opt.x_best)
    fitted = forward(fitted_model)
    return NoiseCharacterizationResult(
        strengths=opt.x_best,
        noise_model=fitted_model,
        loss=opt.f_best,
        representation=rep,
        ref_expectations=ref_expectations,
        fitted_expectations=fitted,
        optimizer=opt,
    )
