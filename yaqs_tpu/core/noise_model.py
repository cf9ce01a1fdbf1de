"""Noise model: user-facing process spec + compiled device representation.

The user-facing :class:`NoiseModel` mirrors the reference contract
(mqt-yaqs core/data_structures/noise_model.py): a list of process dicts
``{name, sites, strength, matrix|factors}`` with library lookup (including
``crosstalk_[xyz]{2}`` / ``longrange_crosstalk_[xyz]{2}`` names), strengths
as floats or distribution dicts (sampled once per run for static disorder),
and scheduled deterministic jumps.  Normalization and validation follow the
reference's rules (noise_model.py:93-523):

- one-site and *adjacent* two-site processes carry a full ``matrix``;
- *non-adjacent* two-site processes carry per-site ``factors``;
- descending site order is normalized (factors swapped; full matrices
  require ascending order);
- strengths, site lists, names, and distribution dicts are type- and
  value-checked at construction.

For the TPU kernels the model is *compiled* into :class:`CompiledNoise`, a
pytree of fixed-shape arrays:

- per-site dissipator generators ``sum_k gamma_k L_k^dag L_k`` stored as
  host-side eigendecompositions, so ``exp(-dt/2 G)`` is a cheap elementwise
  exponential inside jit with ``dt`` traced;
- a flat channel table for the stochastic jump sampler: every channel has two
  (site, operator) slots so one-site channels and factored two-site Pauli
  channels share a single application path (slot 2 is an identity for one-site
  channels).
"""

from __future__ import annotations

import copy
import dataclasses
import logging
import math
import re
from typing import Any, NoReturn

import jax
import numpy as np

from ..models.operators import (
    PAULI,
    lowering,
    pauli_x,
    pauli_y,
    pauli_z,
    raising,
)

__all__ = [
    "NoiseModel",
    "CompiledNoise",
    "compile_noise",
    "is_pauli",
    "validate_noise_model_for_run",
]

logger = logging.getLogger(__name__)

_CROSSTALK_RE = re.compile(r"^crosstalk_[xyz]{2}$")
_LONGRANGE_CROSSTALK_RE = re.compile(r"^longrange_crosstalk_[xyz]{2}$")
_SUPPORTED_DISTRIBUTIONS = frozenset({"normal", "lognormal", "truncated_normal"})
_DISTRIBUTION_KEYS = frozenset({"distribution", "mean", "std"})

_PAULI_MAP = {"x": pauli_x, "y": pauli_y, "z": pauli_z}

# Literal fixed library names (reference noise_model.py:44-64).
_FIXED_OPERATORS: dict[str, np.ndarray] = {
    "raising": raising,
    "lowering": lowering,
    "excitation": raising,
    "relaxation": lowering,
    "bitflip": pauli_x,
    "dephasing": pauli_z,
    "pauli_x": pauli_x,
    "pauli_y": pauli_y,
    "pauli_z": pauli_z,
    "x": pauli_x,
    "y": pauli_y,
    "z": pauli_z,
    "raising_two": np.kron(raising, raising),
    "lowering_two": np.kron(lowering, lowering),
}


# ---------------------------------------------------------------------------
# Input validation
#
# Error taxonomy follows the reference contract (noise_model.py:93-230 —
# TypeError for wrong Python types, ValueError for malformed content, with
# the keyword substrings the contract tests pin: "dictionary", "booleans",
# "nonnegative", "finite", "distinct", ...), expressed here as guard
# one-liners around a single scalar gate (`_as_real`).
# ---------------------------------------------------------------------------

_REAL_SCALARS = (int, float, np.integer, np.floating)


def _fail(exc: type[Exception], msg: str) -> NoReturn:
    raise exc(msg)


def _as_mapping(entry: object, kind: str) -> dict[str, Any]:
    return entry if isinstance(entry, dict) else _fail(
        TypeError, f"Each {kind} must be a dictionary."
    )


def _as_name(name: object, kind: str) -> str:
    if not isinstance(name, str):
        _fail(TypeError, f"{kind} 'name' must be a string.")
    return name if name else _fail(ValueError, f"{kind} 'name' must be a nonempty string.")


def _as_real(value: object, label: str, *, nonnegative: bool = False) -> float:
    """Scalar gate: bools / non-numbers -> TypeError; NaN, infinities and
    (when ``nonnegative``) negatives -> ValueError."""
    if isinstance(value, bool) or not isinstance(value, _REAL_SCALARS):
        _fail(TypeError, f"{label} must be a real number (booleans are not allowed).")
    x = float(value)
    if not math.isfinite(x):
        _fail(ValueError, f"{label} must be finite, got {x}.")
    if nonnegative and x < 0:
        _fail(
            ValueError,
            f"{label} must be nonnegative (got {x}): negative rates have no "
            "TJM/MCWF jump-probability interpretation.",
        )
    return x


def _as_sites(sites: object, kind: str) -> list[int]:
    if not isinstance(sites, (list, tuple)):
        _fail(TypeError, f"{kind} 'sites' must be a list or tuple of integers.")
    if not 1 <= len(sites) <= 2:
        _fail(ValueError, f"{kind} must have exactly 1 or 2 sites, got {len(sites)}.")
    if any(isinstance(s, bool) or not isinstance(s, (int, np.integer)) for s in sites):
        _fail(TypeError, f"{kind} site indices must be integers (booleans are not allowed).")
    out = [int(s) for s in sites]
    if min(out) < 0:
        _fail(ValueError, f"{kind} site indices must be nonnegative, got {min(out)}.")
    if len(out) == 2 and out[0] == out[1]:
        _fail(ValueError, f"{kind} two-site indices must be distinct, got {out}.")
    return out


def _as_strength(strength: object) -> float | dict[str, Any]:
    if not isinstance(strength, dict):
        return _as_real(strength, "process strength", nonnegative=True)
    extra = sorted(set(strength) - _DISTRIBUTION_KEYS)
    if extra:
        _fail(
            ValueError,
            f"Unknown distribution keys: {extra}. "
            f"Supported keys: {sorted(_DISTRIBUTION_KEYS)}.",
        )
    if "distribution" not in strength:
        _fail(ValueError, "Noise strength dict must contain 'distribution' key.")
    kind = strength["distribution"]
    if kind not in _SUPPORTED_DISTRIBUTIONS:
        _fail(
            ValueError,
            f"Unsupported distribution type: {kind}. "
            f"Supported: {sorted(_SUPPORTED_DISTRIBUTIONS)}.",
        )
    std = _as_real(strength.get("std", 0.0), "distribution std")
    if std < 0:
        _fail(ValueError, f"distribution std must be nonnegative, got {std}.")
    return {
        "distribution": kind,
        "mean": _as_real(strength.get("mean", 0.0), "distribution mean"),
        "std": std,
    }


def _as_square_matrix(value: object, label: str) -> np.ndarray:
    try:
        arr = np.array(value, dtype=np.complex128)
    except (TypeError, ValueError) as exc:
        raise TypeError(f"{label} must be a numeric array.") from exc
    if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
        _fail(ValueError, f"{label} must be a square 2-D array, got shape {arr.shape}.")
    if not np.isfinite(arr).all():
        _fail(ValueError, f"{label} entries must be finite.")
    return arr


def _crosstalk_suffix(name: str) -> str | None:
    """The two Pauli letters of a (longrange_)crosstalk_ab name, else None."""
    hit = _CROSSTALK_RE.fullmatch(name) or _LONGRANGE_CROSSTALK_RE.fullmatch(name)
    return name[-2:] if hit else None


def _supported_operator_message() -> str:
    return (
        "Supported fixed names: " + ", ".join(sorted(_FIXED_OPERATORS)) + ". "
        "Also accepted: names matching crosstalk_[xyz]{2} or "
        "longrange_crosstalk_[xyz]{2}."
    )


def _ordered_letters(suffix: str, *, swapped: bool) -> tuple[str, str]:
    """Pauli letters in ascending-site order (caller gave descending sites
    when ``swapped``)."""
    return (suffix[1], suffix[0]) if swapped else (suffix[0], suffix[1])


def _as_factor_pair(factors: object) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(factors, (list, tuple)) and len(factors) == 2:
        return (
            _as_square_matrix(factors[0], "Process factor[0]"),
            _as_square_matrix(factors[1], "Process factor[1]"),
        )
    _fail(ValueError, "Process 'factors' must be a sequence of exactly two square matrices.")


# ---------------------------------------------------------------------------
# is_pauli (reference noise_model.py:620-666 semantics: unit-phase Pauli)
# ---------------------------------------------------------------------------

_PAULI_1 = (pauli_x, pauli_y, pauli_z)
_PAULI_2 = tuple(np.kron(a, b) for a in _PAULI_1 for b in _PAULI_1)


def _unit_phase_match(mat: np.ndarray, target: np.ndarray) -> bool:
    """``mat == exp(i phi) * target`` for some real ``phi`` — a modulus-1
    phase, never a scale (``2 X`` must NOT match ``X``).  The phase is read
    off at the target's largest-modulus entry and then checked globally."""
    if mat.shape != target.shape:
        return False
    pivot = int(np.argmax(np.abs(target.ravel())))
    t, m = target.ravel()[pivot], mat.ravel()[pivot]
    if min(abs(t), abs(m)) < 1e-14:
        return bool(np.allclose(mat, target, rtol=0.0, atol=1e-10))
    phase = m / t
    return abs(abs(phase) - 1.0) <= 1e-10 and bool(
        np.allclose(mat, phase * target, rtol=0.0, atol=1e-10)
    )


def is_pauli(proc: dict[str, Any]) -> bool:
    """True when the process operators match Pauli structure up to unit phase.

    Recognizes one-site X/Y/Z, adjacent Kronecker products of Paulis, and
    long-range factor pairs that are each Pauli. Scaled operators such as
    ``2 X`` are NOT Pauli — TJM's scalar dissipator shortcut assumes
    ``L^dag L = I`` with the *unscaled* rate (reference noise_model.py:644).
    """
    sites = proc["sites"]
    if len(sites) == 1:
        if "matrix" not in proc:
            return False
        m = np.asarray(proc["matrix"], dtype=np.complex128)
        return any(_unit_phase_match(m, p) for p in _PAULI_1)
    if len(sites) != 2:
        return False
    if abs(sites[1] - sites[0]) == 1 and "matrix" in proc:
        m = np.asarray(proc["matrix"], dtype=np.complex128)
        return any(_unit_phase_match(m, p) for p in _PAULI_2)
    if abs(sites[1] - sites[0]) > 1 and "factors" in proc:
        return all(
            any(
                _unit_phase_match(np.asarray(f, dtype=np.complex128), p)
                for p in _PAULI_1
            )
            for f in proc["factors"]
        )
    return False


# ---------------------------------------------------------------------------
# NoiseModel
# ---------------------------------------------------------------------------


class NoiseModel:
    """List of Lindblad jump processes with optional static disorder.

    Each process dict carries ``name``, ``sites`` (1 or 2), ``strength``
    (nonnegative float or a distribution dict ``{"distribution": "normal" |
    "lognormal" | "truncated_normal", "mean": ..., "std": ...}``), and either
    ``matrix`` (1-site and adjacent 2-site) or ``factors`` (long-range
    2-site).  Call :meth:`sample` once per run to realize distribution
    strengths (static disorder, reference noise_model.py:503-560).
    """

    def __init__(
        self,
        processes: list[dict[str, Any]] | None = None,
        scheduled_jumps: list[dict[str, Any]] | None = None,
    ) -> None:
        def _normalized(entries, label, normalize):
            if entries is None:
                return []
            if not isinstance(entries, (list, tuple)):
                _fail(TypeError, f"{label} must be a list or tuple of dictionaries.")
            return [normalize(e) for e in entries]

        self.scheduled_jumps: list[dict[str, Any]] = _normalized(
            scheduled_jumps, "scheduled_jumps", self._normalize_scheduled_jump
        )
        self.processes: list[dict[str, Any]] = _normalized(
            processes, "processes", self._normalize_process
        )

    # -- normalization -----------------------------------------------------

    @staticmethod
    def _normalize_scheduled_jump(jump: object) -> dict[str, Any]:
        original = _as_mapping(jump, "scheduled jump")
        missing = [k for k in ("time", "sites", "name") if k not in original]
        if missing:
            _fail(ValueError, f"Each scheduled jump must have a {missing[0]!r} key.")
        jump_dict = dict(original)
        if "factors" in jump_dict:
            _fail(
                ValueError,
                "Scheduled jumps do not accept 'factors'; use 'matrix' for "
                "custom operators.",
            )
        jump_dict["name"] = _as_name(jump_dict["name"], "Scheduled jump")
        jump_dict["time"] = _as_real(jump_dict["time"], "Scheduled jump time")
        sites = _as_sites(jump_dict["sites"], "Scheduled jump")
        user_matrix = "matrix" in jump_dict
        swapped = False
        if len(sites) == 2:
            sorted_sites = sorted(sites)
            swapped = sorted_sites != sites
            if sorted_sites[1] - sorted_sites[0] != 1:
                msg = (
                    f"Scheduled jump acts on non-adjacent sites {sites}. "
                    "Only nearest-neighbor scheduled jumps are supported."
                )
                raise ValueError(msg)
            if swapped and user_matrix:
                msg = (
                    "Custom full scheduled-jump matrices require ascending "
                    f"site order; got sites {sites}."
                )
                raise ValueError(msg)
            jump_dict["sites"] = sorted_sites
        else:
            jump_dict["sites"] = sites

        if user_matrix:
            jump_dict["matrix"] = _as_square_matrix(
                jump_dict["matrix"], "Scheduled jump matrix"
            )
        else:
            suffix = _crosstalk_suffix(jump_dict["name"])
            if suffix is not None:
                a, b = _ordered_letters(suffix, swapped=swapped)
                jump_dict["matrix"] = np.kron(_PAULI_MAP[a], _PAULI_MAP[b]).astype(
                    np.complex128
                )
            else:
                jump_dict["matrix"] = NoiseModel.get_operator(jump_dict["name"])
        return jump_dict

    @staticmethod
    def _normalize_process(original: object) -> dict[str, Any]:
        source = _as_mapping(original, "noise process")
        for key in ("name", "sites", "strength"):
            if key not in source:
                msg = f"Each process must have a '{key}' key."
                raise ValueError(msg)
        proc = dict(source)
        name = _as_name(proc["name"], "Process")
        proc["name"] = name
        proc["strength"] = _as_strength(proc["strength"])
        sites = _as_sites(proc["sites"], "Process")
        user_matrix, factors_provided = "matrix" in source, "factors" in source
        user_factors = source.get("factors")
        if factors_provided and user_factors is None:
            _fail(
                ValueError,
                "Process 'factors' must be a sequence of exactly two square "
                "matrices, not None.",
            )
        if user_matrix and factors_provided:
            _fail(ValueError, "Process cannot specify both 'matrix' and 'factors'.")

        if len(sites) == 1:
            if factors_provided:
                _fail(ValueError, "One-site processes do not accept 'factors'.")
            proc["sites"] = sites
            proc["matrix"] = (
                _as_square_matrix(proc["matrix"], "Process matrix")
                if user_matrix
                else NoiseModel.get_operator(name)
            )
            return proc

        sorted_sites = sorted(sites)
        swapped = sorted_sites != sites
        if swapped and user_matrix:
            msg = (
                "Custom full two-site matrices require ascending site order; "
                f"got sites {sites}. Use ascending sites or supply 'factors'."
            )
            raise ValueError(msg)
        proc["sites"] = sorted_sites
        i, j = sorted_sites

        if j - i != 1:  # non-adjacent: factors only
            if user_matrix:
                msg = (
                    "Non-adjacent two-site processes require 'factors' "
                    "(a full 'matrix' embedding is not accepted here)."
                )
                raise ValueError(msg)
            suffix = _crosstalk_suffix(name)
            if user_factors is None:
                if suffix is None:
                    msg = (
                        "Non-adjacent 2-site processes must specify 'factors' "
                        "unless named crosstalk_[xyz]{2} or "
                        "longrange_crosstalk_[xyz]{2}."
                    )
                    raise ValueError(msg)
                a, b = _ordered_letters(suffix, swapped=swapped)
                proc["factors"] = (
                    _PAULI_MAP[a].astype(np.complex128).copy(),
                    _PAULI_MAP[b].astype(np.complex128).copy(),
                )
            else:
                left, right = _as_factor_pair(user_factors)
                proc["factors"] = (right, left) if swapped else (left, right)
            proc.pop("matrix", None)
            return proc

        # adjacent: full matrix only
        if factors_provided:
            _fail(ValueError, "Adjacent two-site processes use 'matrix', not 'factors'.")
        suffix = _crosstalk_suffix(name)
        if user_matrix:
            proc["matrix"] = _as_square_matrix(proc["matrix"], "Process matrix")
        elif suffix is not None:
            a, b = _ordered_letters(suffix, swapped=swapped)
            proc["matrix"] = np.kron(_PAULI_MAP[a], _PAULI_MAP[b]).astype(np.complex128)
        else:
            proc["matrix"] = NoiseModel.get_operator(name)
        proc.pop("factors", None)
        return proc

    # -- library lookup ----------------------------------------------------

    @staticmethod
    def get_operator(name: str) -> np.ndarray:
        """Operator matrix (a fresh copy) for a supported library name.

        Accepts fixed library names (``raising``, ``lowering``, ``pauli_x``,
        ..., ``raising_two``, ``lowering_two``), short Pauli names ``x/y/z``,
        and exact ``crosstalk_[xyz]{2}`` labels (reference
        noise_model.py:560-586).
        """
        if name in _FIXED_OPERATORS:
            return np.array(_FIXED_OPERATORS[name], dtype=np.complex128, copy=True)
        suffix = _crosstalk_suffix(name)
        if suffix is not None:
            return np.kron(_PAULI_MAP[suffix[0]], _PAULI_MAP[suffix[1]]).astype(
                np.complex128
            )
        msg = f"Unknown noise operator '{name}'. {_supported_operator_message()}"
        raise ValueError(msg)

    # -- container protocol ------------------------------------------------

    def __len__(self) -> int:
        return len(self.processes)

    @property
    def has_distributions(self) -> bool:
        return any(isinstance(p["strength"], dict) for p in self.processes)

    def sample(self, rng: np.random.Generator | int | None = None) -> NoiseModel:
        """Realize distribution strengths into floats (one draw per process).

        ``rng`` may be a Generator, an integer seed, or None (fresh
        generator). Negative ``normal`` draws are clamped to 0 with a
        warning; ``truncated_normal`` samples the normal truncated to
        ``[0, inf)`` (``max(0, mean)`` when std is ~0) — reference
        noise_model.py:503-560.
        """
        generator = rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        new_processes: list[dict[str, Any]] = []
        for proc in self.processes:
            new_proc = copy.deepcopy(proc)
            s = proc["strength"]
            if isinstance(s, dict):
                dist_type = s["distribution"]
                mean = s.get("mean", 0.0)
                std = s.get("std", 0.0)
                if dist_type == "normal":
                    val = float(generator.normal(loc=mean, scale=std))
                    if val < 0:
                        logger.warning(
                            "normal-distributed strength drew %.6g "
                            "(mean=%.6g, std=%.6g); negative draws are "
                            "clamped to 0.",
                            val, mean, std,
                        )
                    val = max(0.0, val)
                elif dist_type == "lognormal":
                    val = float(generator.lognormal(mean=mean, sigma=std))
                elif dist_type == "truncated_normal":
                    if math.isclose(std, 0.0, abs_tol=1e-8):
                        val = max(0.0, float(mean))
                    else:
                        # rejection-sample the normal truncated to [0, inf);
                        # equivalent to scipy truncnorm.rvs(a=-mean/std, b=inf)
                        while True:
                            val = float(generator.normal(loc=mean, scale=std))
                            if val >= 0.0:
                                break
                else:  # pragma: no cover - blocked at construction
                    msg = f"Unsupported distribution type: {dist_type}"
                    raise ValueError(msg)
                new_proc["strength"] = _as_real(val, "sampled process strength", nonnegative=True)
            else:
                new_proc["strength"] = _as_real(s, "process strength", nonnegative=True)
            new_processes.append(new_proc)
        out = NoiseModel.__new__(NoiseModel)
        out.processes = new_processes
        out.scheduled_jumps = copy.deepcopy(self.scheduled_jumps)
        return out

    def all_zero(self) -> bool:
        return all(
            not isinstance(p["strength"], dict) and p["strength"] == 0
            for p in self.processes
        )


def validate_noise_model_for_run(model: NoiseModel | None, length: int, d: int = 2) -> None:
    """Run-context validation (reference noise_model.py:668-773): site ranges,
    operator dimensions, finite nonnegative strengths."""
    if model is None:
        return
    for proc in model.processes:
        sites = proc["sites"]
        for s_ in sites:
            if not 0 <= s_ < length:
                msg = f"noise process {proc['name']!r} acts on site {s_} outside [0, {length})"
                raise ValueError(msg)
        strength = proc["strength"]
        if not isinstance(strength, dict):
            if not np.isfinite(strength):
                msg = f"noise strength for {proc['name']!r} must be finite"
                raise ValueError(msg)
            if strength < 0:
                msg = f"noise strength for {proc['name']!r} must be nonnegative"
                raise ValueError(msg)
        if "matrix" in proc:
            expected = d ** len(sites)
            if proc["matrix"].shape != (expected, expected):
                msg = (
                    f"noise operator for {proc['name']!r} has shape "
                    f"{proc['matrix'].shape}, expected ({expected}, {expected})"
                )
                raise ValueError(msg)
        if "factors" in proc:
            for f in proc["factors"]:
                if f.shape != (d, d):
                    msg = f"noise factors for {proc['name']!r} must be ({d}, {d})"
                    raise ValueError(msg)
    for jump in model.scheduled_jumps:
        sites = jump["sites"]
        sites = [sites] if isinstance(sites, int) else list(sites)
        for s_ in sites:
            if not 0 <= s_ < length:
                msg = f"scheduled jump acts on site {s_} outside [0, {length})"
                raise ValueError(msg)


# ---------------------------------------------------------------------------
# Device compilation
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompiledNoise:
    """Fixed-shape device representation of a sampled noise model.

    Attributes:
        diss_evals / diss_evecs: eigendecomposition of the per-site dissipator
            generator ``G_i = sum gamma L^dag L`` (``(L, d)`` / ``(L, d, d)``);
            the dissipative half-step operator is
            ``E_i(dt) = V exp(-dt/2 lam) V^dag``.
        ch_site1 / ch_site2: channel site slots ``(nc,)`` int32.
        ch_op1 / ch_op2: jump operator slots ``(nc, d, d)`` (slot 2 identity
            for one-site channels).
        ch_weight_op: ``L^dag L`` at ``site1`` for PDF weights ``(nc, d, d)``
            (identity for two-site Pauli channels, whose full weight is
            ``gamma dt <psi|psi>``).
        ch_gamma: rates ``(nc,)`` real.
    """

    diss_evals: jax.Array
    diss_evecs: jax.Array
    ch_site1: jax.Array
    ch_site2: jax.Array
    ch_op1: jax.Array
    ch_op2: jax.Array
    ch_weight_op: jax.Array
    ch_gamma: jax.Array
    # adjacent non-Pauli two-site processes (merged-pair machinery)
    diss2_evals: jax.Array  # (L-1, d^2) bond dissipator eigenvalues
    diss2_evecs: jax.Array  # (L-1, d^2, d^2)
    ch2_bond: jax.Array  # (nc2,)
    ch2_op: jax.Array  # (nc2, d^2, d^2) jump operators on the merged pair
    ch2_weight_op: jax.Array  # (nc2, d^2, d^2) L^dag L
    ch2_gamma: jax.Array  # (nc2,)

    @property
    def num_channels(self) -> int:
        return self.ch_gamma.shape[0]

    @property
    def num_channels2(self) -> int:
        return self.ch2_gamma.shape[0]

    @property
    def has_two_site(self) -> bool:
        return self.ch2_gamma.shape[0] > 0 or bool(np.any(self.diss2_evals))


def compile_noise(
    model: NoiseModel, length: int, d: int = 2, dtype=np.complex128
) -> CompiledNoise | None:
    """Compile a (sampled) NoiseModel into fixed-shape device arrays.

    Returns None for an empty/all-zero model. Channels are emitted in the
    reference's site-sweep order (site-major, matching
    create_probability_distribution, stochastic_process.py:87-188).

    Supported process classes (reference parity): one-site processes with
    arbitrary jump operators; long-range two-site factored processes with
    unitary-per-factor structure (``f^dag f = I``, which covers all Pauli
    crosstalk); adjacent two-site processes with arbitrary matrices (Pauli
    krons take the factored fast path, everything else the merged-pair
    machinery).
    """
    if model is None or not model.processes or model.all_zero():
        return None
    if model.has_distributions:
        msg = "compile_noise requires a sampled NoiseModel (call .sample() first)."
        raise ValueError(msg)
    for proc in model.processes:
        bad = [s for s in proc["sites"] if not 0 <= int(s) < length]
        if bad:
            msg = (
                f"Noise process {proc['name']!r} acts on site(s) {bad} outside "
                f"the {length}-site chain."
            )
            raise ValueError(msg)

    gens = np.zeros((length, d, d), dtype=dtype)
    gens2 = np.zeros((max(length - 1, 1), d * d, d * d), dtype=dtype)
    site1, site2, gammas = [], [], []
    op1, op2, wop = [], [], []
    ch2_bond, ch2_op, ch2_wop, ch2_gamma = [], [], [], []
    eye = np.eye(d, dtype=dtype)

    def emit(s1, s2, o1, o2, w, gamma):
        site1.append(s1)
        site2.append(s2)
        op1.append(np.asarray(o1, dtype=dtype))
        op2.append(np.asarray(o2, dtype=dtype))
        wop.append(np.asarray(w, dtype=dtype))
        gammas.append(float(gamma))

    # channels in site-sweep order: all 1-site at s, then 2-site starting at
    # s — TWO passes per site, exactly the reference's
    # create_probability_distribution grouping (stochastic_process.py:140-158),
    # so interleaving 1- and 2-site processes in the user's list cannot
    # reorder the channel table (tests/methods/test_stochastic_contracts.py)
    for site in range(length):
        for proc in model.processes:
            sites = proc["sites"]
            gamma = float(proc["strength"])
            if gamma == 0.0:
                continue
            if len(sites) == 1 and sites[0] == site:
                m = proc["matrix"]
                gens[site] += gamma * (m.conj().T @ m)
                emit(site, site, m, eye, m.conj().T @ m, gamma)
        for proc in model.processes:
            sites = proc["sites"]
            gamma = float(proc["strength"])
            if gamma == 0.0:
                continue
            if len(sites) == 2 and sites[0] == site:
                s0, s1 = sites
                if s1 - s0 > 1:
                    # long-range factored process: the factored jump path
                    # assumes the *pair* satisfies L^dag L = I (scalar
                    # dissipator on one site); reference supports Pauli
                    # crosstalk here, and any unitary factors qualify.
                    f0, f1 = proc["factors"]
                    if not (
                        np.allclose(f0.conj().T @ f0, eye, atol=1e-10)
                        and np.allclose(f1.conj().T @ f1, eye, atol=1e-10)
                    ):
                        msg = (
                            "Non-unitary long-range two-site noise factors are "
                            "not supported (reference parity: Pauli crosstalk)."
                        )
                        raise NotImplementedError(msg)
                    gens[s1] += gamma * eye
                    emit(s0, s1, f0, f1, eye, gamma)
                else:
                    m = proc["matrix"]
                    if m.shape != (d * d, d * d):
                        msg = f"adjacent two-site matrix must be ({d*d},{d*d})"
                        raise ValueError(msg)
                    f0f1 = _try_factor_pauli_kron(m, d)
                    if f0f1 is not None:
                        # Pauli kron: L^dag L = I x I — scalar dissipator on
                        # the right site; jump applies both factors.
                        gens[s1] += gamma * eye
                        emit(s0, s1, f0f1[0], f0f1[1], eye, gamma)
                    else:
                        # general adjacent process: merged-pair dissipator +
                        # merged-split jump application (reference
                        # dissipation.py:142-172, stochastic_process.py jumps)
                        gens2[s0] += gamma * (m.conj().T @ m)
                        ch2_bond.append(s0)
                        ch2_op.append(np.asarray(m, dtype=dtype))
                        ch2_wop.append(np.asarray(m.conj().T @ m, dtype=dtype))
                        ch2_gamma.append(gamma)

    if not gammas and not ch2_gamma:
        return None

    evals = np.zeros((length, d))
    evecs = np.zeros((length, d, d), dtype=dtype)
    for i in range(length):
        lam, v = np.linalg.eigh(gens[i])
        evals[i] = lam
        evecs[i] = v

    evals2 = np.zeros((max(length - 1, 1), d * d))
    evecs2 = np.tile(np.eye(d * d, dtype=dtype), (max(length - 1, 1), 1, 1))
    if ch2_gamma:
        for b in range(length - 1):
            lam2, v2 = np.linalg.eigh(gens2[b])
            evals2[b] = lam2
            evecs2[b] = v2

    def arr(x, dtype_, tail):
        return np.asarray(x, dtype=dtype_) if len(x) else np.zeros((0,) + tail, dtype=dtype_)

    # Leaves stay host-side numpy: complex device arrays cannot round-trip to
    # the host on the tunneled TPU platform, so they must enter jit as call
    # arguments or host constants (see yaqs_tpu.utils.host).
    return CompiledNoise(
        diss_evals=np.asarray(evals),
        diss_evecs=np.asarray(evecs),
        ch_site1=arr(site1, np.int32, ()),
        ch_site2=arr(site2, np.int32, ()),
        ch_op1=np.stack(op1) if op1 else np.zeros((0, d, d), dtype),
        ch_op2=np.stack(op2) if op2 else np.zeros((0, d, d), dtype),
        ch_weight_op=np.stack(wop) if wop else np.zeros((0, d, d), dtype),
        ch_gamma=arr(gammas, np.float64, ()),
        diss2_evals=evals2,
        diss2_evecs=evecs2,
        ch2_bond=arr(ch2_bond, np.int32, ()),
        ch2_op=np.stack(ch2_op) if ch2_op else np.zeros((0, d * d, d * d), dtype),
        ch2_weight_op=np.stack(ch2_wop) if ch2_wop else np.zeros((0, d * d, d * d), dtype),
        ch2_gamma=arr(ch2_gamma, np.float64, ()),
    )


def _try_factor_pauli_kron(m: np.ndarray | None, d: int):
    """Factor a d^2 x d^2 Pauli-kron matrix into its two Pauli factors."""
    if m is None or d != 2 or m.shape != (4, 4):
        return None
    for a in PAULI.values():
        for b in PAULI.values():
            k = np.kron(a, b)
            c = np.trace(m @ k.conj().T) / 4
            if abs(abs(c) - 1.0) < 1e-12 and np.allclose(m, c * k, atol=1e-12):
                return c * a, b
    return None
