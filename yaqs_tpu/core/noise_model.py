"""Noise model: user-facing process spec + compiled device representation.

The user-facing :class:`NoiseModel` mirrors the reference contract
(mqt-yaqs core/data_structures/noise_model.py:227-): a list of process dicts
``{name, sites, strength, matrix|factors}`` with library lookup (including
``crosstalk_[xyz]{2}`` names), strengths as floats or distribution dicts
(sampled once per run for static disorder), and scheduled deterministic jumps.

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

import dataclasses
import re
from typing import Any

import jax
import numpy as np

from ..models.operators import PAULI, is_pauli_matrix, noise_operator

__all__ = ["NoiseModel", "CompiledNoise", "compile_noise", "validate_noise_model_for_run"]

_CROSSTALK_RE = re.compile(r"^(longrange_)?crosstalk_([xyz])([xyz])$")


def _resolve_process(proc: dict[str, Any]) -> dict[str, Any]:
    """Normalize one process dict: resolve operators, sort sites, flag Pauli."""
    for key in ("name", "sites", "strength"):
        if key not in proc:
            msg = f"Each noise process must have a '{key}' key."
            raise ValueError(msg)
    out = dict(proc)
    name = str(out["name"])
    sites = out["sites"]
    if isinstance(sites, (int, np.integer)):
        sites = [int(sites)]
    sites = [int(s) for s in sites]
    if len(sites) not in (1, 2):
        msg = f"Noise processes act on 1 or 2 sites, got {sites}."
        raise ValueError(msg)

    if len(sites) == 2:
        sorted_sites = sorted(sites)
        swapped = sorted_sites != sites
        out["sites"] = sorted_sites
        if "factors" in out:
            f0, f1 = out["factors"]
            if swapped:
                f0, f1 = f1, f0
            out["factors"] = (
                np.asarray(f0, dtype=np.complex128),
                np.asarray(f1, dtype=np.complex128),
            )
        elif "matrix" in out:
            if swapped:
                msg = f"Custom two-site matrices require ascending site order; got {sites}."
                raise ValueError(msg)
            out["matrix"] = np.asarray(out["matrix"], dtype=np.complex128)
        else:
            m = _CROSSTALK_RE.match(name.lower())
            if m is None:
                msg = f"Unknown two-site noise process name: {name!r}"
                raise ValueError(msg)
            a, b = m.group(2).upper(), m.group(3).upper()
            if swapped:
                a, b = b, a
            out["factors"] = (PAULI[a].copy(), PAULI[b].copy())
    else:
        out["sites"] = sites
        if "matrix" in out:
            out["matrix"] = np.asarray(out["matrix"], dtype=np.complex128)
        else:
            try:
                out["matrix"] = noise_operator(name).copy()
            except KeyError as exc:
                msg = f"Unknown noise process name: {name!r}"
                raise ValueError(msg) from exc
    return out


def is_pauli(proc: dict[str, Any]) -> bool:
    """True when the process operator is Pauli up to unit phase (reference
    noise_model.is_pauli semantics: enables the scalar-dissipator shortcut)."""
    if "factors" in proc:
        return all(is_pauli_matrix(f) for f in proc["factors"])
    return is_pauli_matrix(proc["matrix"])


class NoiseModel:
    """List of Lindblad jump processes with optional static disorder.

    Strengths may be plain nonnegative floats or distribution dicts
    ``{"distribution": "normal"|"lognormal"|"truncated_normal", ...}``; call
    :meth:`sample` once per run to realize concrete rates (static disorder,
    reference noise_model.py:492-559).
    """

    def __init__(
        self,
        processes: list[dict[str, Any]] | None = None,
        scheduled_jumps: list[dict[str, Any]] | None = None,
    ) -> None:
        self.processes = [_resolve_process(p) for p in (processes or [])]
        self.scheduled_jumps = list(scheduled_jumps or [])
        for jump in self.scheduled_jumps:
            for key in ("time", "sites", "name"):
                if key not in jump:
                    msg = f"Each scheduled jump must have a '{key}' key."
                    raise ValueError(msg)

    def __len__(self) -> int:
        return len(self.processes)

    @property
    def has_distributions(self) -> bool:
        return any(isinstance(p["strength"], dict) for p in self.processes)

    def sample(self, rng: np.random.Generator | None = None) -> NoiseModel:
        """Realize distribution strengths into floats (one draw per process)."""
        if not self.has_distributions:
            return self
        rng = rng or np.random.default_rng()
        sampled = []
        for p in self.processes:
            q = dict(p)
            s = p["strength"]
            if isinstance(s, dict):
                kind = s.get("distribution")
                if kind == "normal":
                    val = rng.normal(s.get("mean", 0.0), s.get("std", 1.0))
                    if val < 0:
                        import logging

                        logging.getLogger(__name__).warning(
                            "Sampled noise strength %f ('normal', mean=%f, "
                            "std=%f) was negative and clamped to 0.0.",
                            val,
                            s.get("mean", 0.0),
                            s.get("std", 1.0),
                        )
                elif kind == "lognormal":
                    val = rng.lognormal(s.get("mean", 0.0), s.get("sigma", s.get("std", 1.0)))
                elif kind == "truncated_normal":
                    lo = s.get("lower", 0.0)
                    hi = s.get("upper", np.inf)
                    for _ in range(1000):
                        val = rng.normal(s.get("mean", 0.0), s.get("std", 1.0))
                        if lo <= val <= hi:
                            break
                    else:
                        val = np.clip(rng.normal(s.get("mean", 0.0), s.get("std", 1.0)), lo, hi)
                else:
                    msg = f"Unknown strength distribution: {kind!r}"
                    raise ValueError(msg)
                q["strength"] = float(max(val, 0.0))
            sampled.append(q)
        out = NoiseModel.__new__(NoiseModel)
        out.processes = sampled
        out.scheduled_jumps = list(self.scheduled_jumps)
        return out

    def all_zero(self) -> bool:
        return all(
            not isinstance(p["strength"], dict) and p["strength"] == 0 for p in self.processes
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

    Currently supported process classes (reference parity): one-site processes
    with arbitrary jump operators, and two-site *Pauli* processes (adjacent or
    long-range) via factored application. Adjacent non-Pauli two-site
    processes raise NotImplementedError for now.
    """
    if model is None or not model.processes or model.all_zero():
        return None
    if model.has_distributions:
        msg = "compile_noise requires a sampled NoiseModel (call .sample() first)."
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

    # channels in site-sweep order: all 1-site at s, then 2-site starting at s
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
            elif len(sites) == 2 and sites[0] == site:
                s0, s1 = sites
                if is_pauli(proc):
                    # L^dag L = I x I: dissipator is a scalar on the right
                    # site; jump applies both factors.
                    gens[s1] += gamma * eye
                    if "factors" in proc:
                        f0, f1 = proc["factors"]
                    else:
                        msg = (
                            "Adjacent two-site Pauli processes given as a full "
                            "matrix are not factored yet; provide 'factors'."
                        )
                        m = proc.get("matrix")
                        f0f1 = _try_factor_pauli_kron(m, d)
                        if f0f1 is None:
                            raise NotImplementedError(msg)
                        f0, f1 = f0f1
                    emit(s0, s1, f0, f1, eye, gamma)
                elif s1 - s0 == 1:
                    # adjacent non-Pauli process: merged-pair dissipator +
                    # merged-split jump application (reference
                    # dissipation.py:142-172, stochastic_process.py jumps)
                    m = proc["matrix"]
                    if m.shape != (d * d, d * d):
                        msg = f"adjacent two-site matrix must be ({d*d},{d*d})"
                        raise ValueError(msg)
                    gens2[s0] += gamma * (m.conj().T @ m)
                    ch2_bond.append(s0)
                    ch2_op.append(np.asarray(m, dtype=dtype))
                    ch2_wop.append(np.asarray(m.conj().T @ m, dtype=dtype))
                    ch2_gamma.append(gamma)
                else:
                    msg = (
                        "Non-Pauli long-range two-site noise processes are "
                        "not supported (reference parity)."
                    )
                    raise NotImplementedError(msg)

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
    for a_name, a in PAULI.items():
        for b_name, b in PAULI.items():
            k = np.kron(a, b)
            c = np.trace(m @ k.conj().T) / 4
            if abs(abs(c) - 1.0) < 1e-12 and np.allclose(m, c * k, atol=1e-12):
                return c * a, b
    return None
