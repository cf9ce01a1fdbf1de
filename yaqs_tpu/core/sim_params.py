"""Simulation parameters and observables (user-facing, host-side).

API parity with the reference's simulation_parameters module (mqt-yaqs
core/data_structures/simulation_parameters.py): ``SIMULATION_PRESETS``,
``Observable``, ``AnalogSimParams``, ``DigitalSimParams``, with the TPU build's
additions (``krylov_dim`` instead of only a tolerance — the Krylov dimension is
a static compile parameter on TPU).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..models.operators import PAULI, hadamard, identity, projector_0, projector_1

__all__ = [
    "SIMULATION_PRESETS",
    "EvolutionMode",
    "Observable",
    "AnalogSimParams",
    "DigitalSimParams",
]

SIMULATION_PRESETS: dict[str, dict[str, Any]] = {
    "fast": {"svd_threshold": 1e-3, "max_bond_dim": 16, "num_traj": 128, "krylov_dim": 8},
    "balanced": {"svd_threshold": 1e-6, "max_bond_dim": 128, "num_traj": 256, "krylov_dim": 12},
    "accurate": {"svd_threshold": 1e-9, "max_bond_dim": 4096, "num_traj": 1024, "krylov_dim": 20},
    "exact": {"svd_threshold": 1e-13, "max_bond_dim": None, "num_traj": 1024, "krylov_dim": 25},
}

_USE_PRESET = object()


class EvolutionMode:
    TDVP = "tdvp"
    BUG = "bug"


_NAMED_OBSERVABLES: dict[str, np.ndarray] = {
    "x": PAULI["X"],
    "y": PAULI["Y"],
    "z": PAULI["Z"],
    "id": identity,
    "h": hadamard,
    "p0": projector_0,
    "p1": projector_1,
    # two-site correlators
    "xx": np.kron(PAULI["X"], PAULI["X"]),
    "yy": np.kron(PAULI["Y"], PAULI["Y"]),
    "zz": np.kron(PAULI["Z"], PAULI["Z"]),
}


class Observable:
    """What to measure: a named one-site operator or raw matrix plus site(s).

    Reference parity: Observable(gate, sites) resolving named gates
    (simulation_parameters.py:299-356). Multi-site observables, ``pvm``
    projectors, and entropy/Schmidt pseudo-observables are resolved at the
    engine level; this class records the spec.
    """

    def __init__(self, gate, sites: int | list[int] | None = None, **gate_kwargs) -> None:
        self.kwargs = dict(gate_kwargs)
        if not isinstance(gate, str) and gate_kwargs:
            msg = (
                "Matrix observables do not accept named parameters "
                f"(got {sorted(gate_kwargs)})."
            )
            raise ValueError(msg)
        if isinstance(gate, str):
            name = gate.lower()
            if name in _NAMED_OBSERVABLES:
                if gate_kwargs:
                    msg = (
                        f"Observable {gate!r} does not accept parameters "
                        f"(got {sorted(gate_kwargs)})."
                    )
                    raise ValueError(msg)
                self.name = name
                self.matrix = _NAMED_OBSERVABLES[name].copy()
            elif name in {"entropy", "schmidt_spectrum"}:
                self.name = name
                self.matrix = None
                # reference set_sites flexibility (gate_library entropy /
                # schmidt_spectrum): a single index i means the bond (i, i+1)
                if isinstance(sites, int):
                    sites = [sites, sites + 1]
                elif isinstance(sites, (list, tuple)) and len(sites) == 1:
                    sites = [int(sites[0]), int(sites[0]) + 1]
            elif all(c in "01" for c in gate) and gate:
                # bitstring projector (PVM)
                self.name = "pvm"
                self.bitstring = gate
                self.matrix = None
            elif name == "pvm":
                self.name = "pvm"
                self.bitstring = gate_kwargs.get("bitstring")
                self.matrix = None
            elif name == "position":
                # grid-basis position operator diag(positions) (reference
                # Observable("position", site, positions=...) for the
                # trapped-ion grid Hamiltonians)
                positions = gate_kwargs.get("positions")
                if positions is None:
                    msg = "Observable('position', ...) requires positions="
                    raise ValueError(msg)
                positions = np.asarray(positions)
                if positions.ndim != 1 or positions.size == 0 or not np.all(
                    np.isfinite(positions)
                ):
                    msg = "Observable positions must be a nonempty finite 1-D array"
                    raise ValueError(msg)
                self.name = "position"
                self.matrix = np.diag(positions.astype(np.complex128))
            else:
                msg = f"Unknown observable {gate!r}"
                raise ValueError(msg)
        else:
            self.name = "local"
            self.matrix = np.asarray(gate, dtype=np.complex128)
            if self.matrix.ndim != 2 or self.matrix.shape[0] != self.matrix.shape[1]:
                msg = "local observable must be a square matrix"
                raise ValueError(msg)
            if not np.all(np.isfinite(self.matrix)):
                msg = "local observable entries must be finite"
                raise ValueError(msg)
        if self.name != "pvm" and sites is None:
            msg = "Observable requires sites"
            raise ValueError(msg)
        self.sites = sites

    @property
    def site_list(self) -> list[int]:
        if self.sites is None:
            return []
        return [self.sites] if isinstance(self.sites, int) else list(self.sites)

    def __repr__(self) -> str:
        return f"Observable({self.name!r}, sites={self.sites!r})"


def _sorted_observables(observables: list[Observable]) -> tuple[list[Observable], tuple[int, ...]]:
    """Stable site-ascending evaluation order + user->sorted index map
    (reference _prepare_observable_ordering, simulation_parameters.py:358-395).
    """
    if not observables:
        return [], ()
    indexed = list(enumerate(observables))
    sortable = [(i, o) for i, o in indexed if o.name != "pvm"]
    pvm = [(i, o) for i, o in indexed if o.name == "pvm"]
    sorted_pairs = sorted(sortable, key=lambda p: (p[1].site_list[0], p[0])) + pvm
    user_to_sorted = [0] * len(observables)
    for row, (user_i, _) in enumerate(sorted_pairs):
        user_to_sorted[user_i] = row
    return [o for _, o in sorted_pairs], tuple(user_to_sorted)


# Backend-resolved fast-path defaults. On TPU/complex64 the validated fast
# configuration (8.4e-5 observable deviation vs the x64 golden at PREC=high,
# docs/tpu_numerics.md) is the default — a default-config Simulator.run gets
# the fast path without knob-setting (~3-4x TPU throughput).  On CPU/x64 the
# exact linear algebra remains the default for 1e-8 reference parity.
_FAST_PATH_TPU = {
    "svd_method": "subspace",
    "subspace_iters": 1,
    "lanczos_reorth": False,
    "subspace_qr": "newton",
    "canon_method": "newton",
}
_FAST_PATH_EXACT = {
    "svd_method": "exact",
    "subspace_iters": 2,
    "lanczos_reorth": True,
    "subspace_qr": "householder",
    "canon_method": "qr",
}


def resolve_fast_path_defaults(backend: str | None = None) -> dict:
    """The auto-selected fast-path knob set for ``backend`` (default: the
    process's jax backend): validated-fast on TPU complex64, exact otherwise."""
    import jax

    if backend is None:
        backend = jax.default_backend()
    use_fast = backend == "tpu" and not jax.config.read("jax_enable_x64")
    return dict(_FAST_PATH_TPU if use_fast else _FAST_PATH_EXACT)


class _BaseSimParams:
    def _store_fast_path(
        self,
        svd_method: str | None = None,
        subspace_iters: int | None = None,
        lanczos_reorth: bool | None = None,
        subspace_qr: str | None = None,
        canon_method: str | None = None,
    ) -> None:
        """Store the TPU fast-path knobs (no reference counterpart).

        ``None`` (the default) means auto: resolved per backend at run time by
        :func:`resolve_fast_path_defaults` — the validated fast configuration
        (``svd_method="subspace"``, ``subspace_iters=1``,
        ``lanczos_reorth=False``, ``subspace_qr="newton"``,
        ``canon_method="newton"``) on TPU/complex64, exact linear algebra on
        CPU/x64.  Explicit values always win.
        """
        if svd_method is not None and svd_method not in {"exact", "subspace"}:
            msg = f"svd_method must be 'exact' or 'subspace', got {svd_method!r}"
            raise ValueError(msg)
        if subspace_qr is not None and subspace_qr not in {"householder", "cholesky", "newton"}:
            msg = f"subspace_qr must be householder/cholesky/newton, got {subspace_qr!r}"
            raise ValueError(msg)
        if canon_method is not None and canon_method not in {"qr", "newton"}:
            msg = f"canon_method must be 'qr' or 'newton', got {canon_method!r}"
            raise ValueError(msg)
        self.svd_method = svd_method
        self.subspace_iters = None if subspace_iters is None else int(subspace_iters)
        self.lanczos_reorth = None if lanczos_reorth is None else bool(lanczos_reorth)
        self.subspace_qr = subspace_qr
        self.canon_method = canon_method

    def fast_path_kwargs(self) -> dict:
        """TDVPConfig kwargs for the stored fast-path knobs; ``None`` entries
        resolve to the backend default (fast on TPU c64, exact otherwise)."""
        auto = resolve_fast_path_defaults()
        out = {}
        for key, auto_val in auto.items():
            user_val = getattr(self, key, None)
            out[key] = auto_val if user_val is None else user_val
        return out

    def _apply_preset(self, preset, num_traj, max_bond_dim, svd_threshold, krylov_dim):
        if preset not in SIMULATION_PRESETS:
            msg = f"Unknown preset {preset!r}; valid: {sorted(SIMULATION_PRESETS)}"
            raise ValueError(msg)
        p = SIMULATION_PRESETS[preset]
        self.preset = preset
        self.num_traj = p["num_traj"] if num_traj is None else int(num_traj)
        self.max_bond_dim = p["max_bond_dim"] if max_bond_dim is _USE_PRESET else max_bond_dim
        self.svd_threshold = p["svd_threshold"] if svd_threshold is None else float(svd_threshold)
        self.krylov_dim = p["krylov_dim"] if krylov_dim is None else int(krylov_dim)

    @staticmethod
    def _validate_random_seed(random_seed) -> int | None:
        """Reference semantics (simulation_parameters.py random_seed guards):
        None or a nonnegative int; booleans and other types rejected."""
        if random_seed is None:
            return None
        if isinstance(random_seed, bool) or not isinstance(random_seed, (int, np.integer)):
            msg = f"random_seed must be None or an int, got {random_seed!r}"
            raise TypeError(msg)
        if random_seed < 0:
            msg = f"random_seed must be nonnegative, got {random_seed}"
            raise ValueError(msg)
        return int(random_seed)

    @property
    def sorted_observables(self) -> list[Observable]:
        return _sorted_observables(self.observables)[0]

    @property
    def observable_sorted_indices(self) -> tuple[int, ...]:
        return _sorted_observables(self.observables)[1]


class AnalogSimParams(_BaseSimParams):
    """Parameters for analog (Hamiltonian) evolution.

    Reference-parity constructor (simulation_parameters.py:457-477); the
    adaptive ``krylov_tol`` is replaced by a static ``krylov_dim``.
    """

    def __init__(
        self,
        observables: list[Observable] | None = None,
        elapsed_time: float = 0.1,
        dt: float = 0.1,
        num_traj: int | None = None,
        max_bond_dim=_USE_PRESET,
        trunc_mode: str = "discarded_weight",
        svd_threshold: float | None = None,
        krylov_dim: int | None = None,
        order: int = 1,
        *,
        preset: str = "balanced",
        sample_timesteps: bool = True,
        evolution_mode: str = EvolutionMode.TDVP,
        get_state: bool = False,
        random_seed: int | None = None,
        multi_time_observables=None,
        tdvp_sweeps: int = 1,
        tdvp_mode: str = "2site",
        svd_method: str | None = None,
        subspace_iters: int | None = None,
        lanczos_reorth: bool | None = None,
        subspace_qr: str | None = None,
        canon_method: str | None = None,
    ) -> None:
        self.observables = list(observables or [])
        self._apply_preset(preset, num_traj, max_bond_dim, svd_threshold, krylov_dim)
        self._store_fast_path(svd_method, subspace_iters, lanczos_reorth, subspace_qr, canon_method)
        for label, value in (("dt", dt), ("elapsed_time", elapsed_time)):
            if isinstance(value, bool) or not isinstance(value, (int, float, np.floating, np.integer)):
                msg = f"{label} must be a real number, got {value!r}"
                raise TypeError(msg)
        if dt <= 0 or not np.isfinite(dt):
            msg = "dt must be positive and finite"
            raise ValueError(msg)
        if elapsed_time < 0 or not np.isfinite(elapsed_time):
            msg = "elapsed_time must be nonnegative and finite"
            raise ValueError(msg)
        n_steps = round(elapsed_time / dt)
        if abs(n_steps * dt - elapsed_time) > 1e-9 * max(1.0, abs(elapsed_time)):
            msg = f"elapsed_time ({elapsed_time}) must be an integer multiple of dt ({dt})"
            raise ValueError(msg)
        self.elapsed_time = float(elapsed_time)
        self.dt = float(dt)
        self.num_steps = int(n_steps)
        self.times = np.arange(n_steps + 1) * dt
        self.sample_timesteps = bool(sample_timesteps)
        self.trunc_mode = trunc_mode
        if order not in (1, 2):
            msg = f"order must be 1 or 2, got {order!r}"
            raise ValueError(msg)
        self.order = int(order)
        if evolution_mode not in (EvolutionMode.TDVP, EvolutionMode.BUG):
            msg = f"evolution_mode must be 'tdvp' or 'bug', got {evolution_mode!r}"
            raise ValueError(msg)
        self.evolution_mode = evolution_mode
        self.get_state = bool(get_state)
        self.random_seed = self._validate_random_seed(random_seed)
        self.multi_time_observables = multi_time_observables
        if not isinstance(tdvp_sweeps, int) or isinstance(tdvp_sweeps, bool) or tdvp_sweeps < 1:
            msg = f"tdvp_sweeps must be an int >= 1, got {tdvp_sweeps!r}"
            raise ValueError(msg)
        self.tdvp_sweeps = tdvp_sweeps
        if tdvp_mode not in {"1site", "2site", "dynamic"}:
            msg = f"tdvp_mode must be 1site/2site/dynamic, got {tdvp_mode!r}"
            raise ValueError(msg)
        self.tdvp_mode = tdvp_mode


class DigitalSimParams(_BaseSimParams):
    """Parameters for noisy digital circuit simulation.

    Reference parity (simulation_parameters.py:550-): ``num_traj`` vs
    ``shots`` semantics, gate application mode, mid-circuit sampling layers.
    """

    def __init__(
        self,
        observables: list[Observable] | None = None,
        num_traj: int | None = None,
        shots: int = 0,
        max_bond_dim=_USE_PRESET,
        trunc_mode: str = "discarded_weight",
        svd_threshold: float | None = None,
        krylov_dim: int | None = None,
        *,
        preset: str = "balanced",
        gate_mode: str = "mpo",
        tdvp_sweeps: int = 1,
        sample_layers: bool = False,
        num_mid_measurements: int = 0,
        get_state: bool = False,
        random_seed: int | None = None,
        svd_method: str | None = None,
        subspace_iters: int | None = None,
        lanczos_reorth: bool | None = None,
        subspace_qr: str | None = None,
        canon_method: str | None = None,
    ) -> None:
        self.observables = list(observables or [])
        self._apply_preset(preset, num_traj, max_bond_dim, svd_threshold, krylov_dim)
        self._store_fast_path(svd_method, subspace_iters, lanczos_reorth, subspace_qr, canon_method)
        if isinstance(shots, bool) or not isinstance(shots, (int, np.integer)) or shots < 0:
            msg = f"shots must be a nonnegative int, got {shots!r}"
            raise ValueError(msg)
        self.shots = int(shots)
        if not self.observables and self.shots == 0 and not get_state:
            msg = (
                "DigitalSimParams requires some output: observables, "
                "shots > 0, or get_state=True."
            )
            raise ValueError(msg)
        # PVM projector sampling shares the shot machinery; mixing it with
        # expectation-value observables would need two incompatible result
        # layouts per run (reference simulation_parameters.py pvm guard).
        pvm_flags = [o.name == "pvm" for o in self.observables]
        if any(pvm_flags) and not all(pvm_flags):
            msg = "Cannot mix 'pvm' observables with non-pvm observables."
            raise ValueError(msg)
        self.trunc_mode = trunc_mode
        if gate_mode not in {"swaps", "tdvp", "full-tdvp", "mpo"}:
            msg = f"gate_mode must be swaps/tdvp/full-tdvp/mpo, got {gate_mode!r}"
            raise ValueError(msg)
        self.gate_mode = gate_mode
        if not isinstance(tdvp_sweeps, int) or isinstance(tdvp_sweeps, bool) or tdvp_sweeps < 1:
            msg = f"tdvp_sweeps must be an int >= 1, got {tdvp_sweeps!r}"
            raise ValueError(msg)
        self.tdvp_sweeps = tdvp_sweeps
        if sample_layers and not self.observables:
            msg = "sample_layers=True requires observables to sample."
            raise ValueError(msg)
        self.sample_layers = bool(sample_layers)
        # Mid-circuit sampling columns: SAMPLE_OBSERVABLES barriers in the
        # circuit are the source of truth (reference auto-count,
        # simulator.py:892-899).  A nonzero count must agree with the
        # circuit's barriers at run time, or — when the circuit has none —
        # schedules that many evenly spaced sampling columns
        # (digital/engine._apply_mid_measurement_count).
        if isinstance(num_mid_measurements, bool) or int(num_mid_measurements) < 0:
            msg = f"num_mid_measurements must be a nonnegative int, got {num_mid_measurements!r}"
            raise ValueError(msg)
        if int(num_mid_measurements) and not self.sample_layers:
            msg = (
                "num_mid_measurements > 0 requires sample_layers=True "
                "(mid-circuit sampling columns only exist on the "
                "sample-layers path)"
            )
            raise ValueError(msg)
        self.num_mid_measurements = int(num_mid_measurements)
        self.get_state = bool(get_state)
        self.random_seed = self._validate_random_seed(random_seed)
        self.sample_timesteps = False
        self.dt = 1.0
