"""MemoryCharacterizer: non-Markovian memory workflows.

Reference API parity: mqt-yaqs memory_characterizer.py —

- ``build_process_tensor``: multi-time Choi tensor by exhaustive tomography;
- ``characterize``: split-cut operational memory (response-matrix entropy and
  mode count) on a Hamiltonian (exact backend) or a process tensor;
- ``compute_qmi`` / ``compute_cmi``: information measures on the process
  tensor's Choi state;
- ``sample`` / ``train`` / ``predict``: flax Transformer surrogate workflows.

Presets (quick/balanced/accurate) set the past/future probe grid, matching
the reference's characterization presets (memory_characterizer.py:66).
"""

from __future__ import annotations

import numpy as np

from .characterization.memory.exact import ExactBackend
from .characterization.memory.operational import (
    ProbeSet,
    characterize_cuts,
)
from .characterization.memory.process_tensor import DenseProcessTensor, build_process_tensor
from .characterization.memory.results import CharacterizationResult
from .core.hamiltonian import Hamiltonian

__all__ = ["MemoryCharacterizer"]

_CHARACTERIZATION_PRESETS = {
    "quick": (8, 8),
    "balanced": (32, 32),
    "accurate": (128, 128),
}


def _coerce_probe_set(probe_set):
    """Normalize ``probe_set=``: None, a ProbeSet, or a prior single-cut
    CharacterizationResult carrying stored probes (reference
    memory_characterizer.py:101-127)."""
    if probe_set is None:
        return None
    if isinstance(probe_set, CharacterizationResult):
        if len(probe_set.by_cut) != 1:
            msg = "probe_set from a prior characterize() result requires exactly one cut"
            raise ValueError(msg)
        entry = next(iter(probe_set.by_cut.values()))
        if entry.probe_set is None:
            msg = "prior result does not carry a stored probe set"
            raise ValueError(msg)
        return entry.probe_set
    if isinstance(probe_set, ProbeSet):
        return probe_set
    msg = (
        "probe_set must be None, CharacterizationResult, or ProbeSet, "
        f"got {type(probe_set).__name__}"
    )
    raise TypeError(msg)


class MemoryCharacterizer:
    """Entry point for memory characterization workflows."""

    def __init__(
        self,
        *,
        preset: str = "balanced",
        n_pasts: int | None = None,
        n_futures: int | None = None,
        intervention_style: str = "haar",
        parallel: bool = True,
        show_progress: bool = False,
    ) -> None:
        if preset not in _CHARACTERIZATION_PRESETS:
            msg = f"preset must be one of {sorted(_CHARACTERIZATION_PRESETS)}"
            raise ValueError(msg)
        dflt = _CHARACTERIZATION_PRESETS[preset]
        self.n_pasts = int(dflt[0] if n_pasts is None else n_pasts)
        self.n_futures = int(dflt[1] if n_futures is None else n_futures)
        self.intervention_style = intervention_style
        self.parallel = parallel
        self.show_progress = show_progress
        self.result: CharacterizationResult | None = None
        self.surrogate = None

    # ------------------------------------------------------------------
    def build_process_tensor(
        self,
        hamiltonian: Hamiltonian,
        *,
        num_interventions: int | None = None,
        tau: float | None = None,
        noise_model=None,
        method: str = "dense",
        timesteps: list[float] | None = None,
        max_bond_dim: int | None = 64,
        basis: str = "tetrahedral",
        basis_seed: int | None = None,
    ):
        """Multi-time process tensor.

        ``method="dense"``: exhaustive 16^k Choi tomography (small k).
        ``method="mpo"``: leg-by-leg tensor-train construction — 16*chi
        simulations per leg (reference build_process_tensor_direct,
        direct.py:297), scaling to many interventions; supports an optional
        non-uniform ``timesteps`` schedule and noisy (Lindblad) legs.
        """
        if method == "mpo":
            from .characterization.memory.mpo_process_tensor import (
                build_process_tensor_mpo,
            )

            return build_process_tensor_mpo(
                hamiltonian,
                num_interventions=num_interventions,
                tau=tau,
                timesteps=timesteps,
                noise_model=noise_model,
                max_bond_dim=max_bond_dim,
                basis=basis,
                basis_seed=basis_seed,
            )
        if method != "dense":
            msg = f"method must be 'dense' or 'mpo', got {method!r}"
            raise ValueError(msg)
        if num_interventions is None or tau is None:
            msg = "dense construction requires num_interventions= and tau="
            raise ValueError(msg)
        return build_process_tensor(
            hamiltonian,
            num_interventions=num_interventions,
            tau=tau,
            noise_model=noise_model,
        )

    # ------------------------------------------------------------------
    def characterize(
        self,
        target,
        *,
        num_interventions: int | None = None,
        tau: float | None = None,
        cut: int | None = None,
        cuts: list[int] | None = None,
        noise_model=None,
        probe_set: ProbeSet | None = None,
        seed: int | None = None,
        delay: int = 0,
        backend: str = "exact",
        backend_options: dict | None = None,
        initial_state=None,
        initial_psi=None,
    ) -> CharacterizationResult:
        """Operational split-cut memory characterization.

        ``target`` is a Hamiltonian (``backend="exact"`` dense simulator for
        short chains or ``backend="mps"`` TDVP sequence simulator for long
        chains; both require ``tau``) or a :class:`DenseProcessTensor` /
        surrogate exposing ``evaluate_probes``.  ``backend_options`` forwards
        kwargs (``chi``, ``dt``, ``num_traj``, ...) to the MPS backend.
        ``initial_state`` (a chain state vector or density matrix) replaces
        the default |0...0> start for the exact backend; ``initial_psi`` is
        accepted as a drop-in alias for reference call sites (reference
        ``initial_psi``, memory_characterizer.py:516).
        """
        # validation contracts (reference memory_characterizer.py:586-640)
        if initial_psi is not None:
            if initial_state is not None:
                msg = "pass either initial_state= or initial_psi=, not both"
                raise ValueError(msg)
            initial_state = initial_psi
        if cut is not None and cuts is not None:
            msg = "pass either cut= or cuts=, not both"
            raise ValueError(msg)
        if cuts is not None and len(cuts) == 0:
            msg = "cuts= must be a nonempty list"
            raise ValueError(msg)
        if delay < 0:
            msg = f"delay must be >= 0, got {delay}"
            raise ValueError(msg)
        if delay > 0 and not isinstance(target, Hamiltonian):
            msg = "delay > 0 is supported for Hamiltonian characterize() only"
            raise ValueError(msg)
        if initial_state is not None and not isinstance(target, Hamiltonian):
            msg = "initial_state is supported for Hamiltonian characterize() only"
            raise ValueError(msg)
        probe_set = _coerce_probe_set(probe_set)
        if probe_set is not None and cuts is not None and len(cuts) > 1:
            msg = (
                "probe_set cannot be reused across multiple cuts; omit "
                "probe_set for multi-cut characterize()"
            )
            raise ValueError(msg)

        if isinstance(target, Hamiltonian):
            if tau is None:
                msg = "characterize(Hamiltonian, ...) requires tau="
                raise ValueError(msg)
            if num_interventions is None:
                msg = "characterize(Hamiltonian, ...) requires num_interventions="
                raise ValueError(msg)
            if backend == "mps":
                if initial_state is not None:
                    msg = "initial_state is supported for the exact backend only"
                    raise ValueError(msg)
                from .characterization.memory.mps_backend import MPSBackend

                backend = MPSBackend(
                    target, tau, noise_model, **(backend_options or {})
                )
            elif backend == "exact":
                backend = ExactBackend(
                    target, tau, noise_model, initial_state=initial_state
                )
            else:
                msg = f"backend must be 'exact' or 'mps', got {backend!r}"
                raise ValueError(msg)
            k = int(num_interventions)
        elif isinstance(target, CharacterizationResult):
            msg = (
                "target must be a Hamiltonian, process tensor, or surrogate; "
                "pass a prior result via probe_set= to reuse its probes"
            )
            raise TypeError(msg)
        else:
            backend = target
            k = (
                int(num_interventions)
                if num_interventions is not None
                else int(target._num_interventions_for_probe())
            )

        rng = np.random.default_rng(seed)
        resolved_cuts = cuts if cuts is not None else [cut or (k + 1) // 2]
        self.result = characterize_cuts(
            backend=backend,
            num_interventions=k,
            cuts=[int(c) for c in resolved_cuts],
            n_pasts=self.n_pasts,
            n_futures=self.n_futures,
            rng=rng,
            probe_set=probe_set,
            intervention_style=self.intervention_style,
            delay=delay,
        )
        return self.result

    # ------------------------------------------------------------------
    def compute_qmi(self, process_tensor: DenseProcessTensor, cut: int | None = None) -> float:
        if not hasattr(process_tensor, "qmi"):
            msg = (
                "compute_qmi requires a process tensor "
                f"(got {type(process_tensor).__name__})"
            )
            raise TypeError(msg)
        k = process_tensor.k
        c = (k + 1) // 2 if cut is None else int(cut)
        return process_tensor.qmi(c)

    def compute_cmi(
        self, process_tensor: DenseProcessTensor, cut1: int, cut2: int
    ) -> float:
        if not hasattr(process_tensor, "cmi"):
            msg = (
                "compute_cmi requires a process tensor "
                f"(got {type(process_tensor).__name__})"
            )
            raise TypeError(msg)
        return process_tensor.cmi(cut1, cut2)

    # ------------------------------------------------------------------
    def sample(self, hamiltonian, *, num_interventions: int, tau: float,
               num_sequences: int = 256, noise_model=None, seed: int | None = 0):
        """Simulate random intervention sequences as surrogate training data."""
        from .characterization.memory.surrogate import sample_dataset

        return sample_dataset(
            hamiltonian,
            num_interventions=num_interventions,
            tau=tau,
            num_sequences=num_sequences,
            noise_model=noise_model,
            seed=seed,
            intervention_style=self.intervention_style,
        )

    def train(self, dataset, *, epochs: int = 200, seed: int = 0, **kwargs):
        """Train a Transformer surrogate on a sampled dataset."""
        from .characterization.memory.surrogate import train_surrogate

        self.surrogate = train_surrogate(dataset, epochs=epochs, seed=seed, **kwargs)
        return self.surrogate

    def predict(self, target, sequences):
        """Predict final system states for MP intervention sequences."""
        return target.evaluate_probes(sequences)
