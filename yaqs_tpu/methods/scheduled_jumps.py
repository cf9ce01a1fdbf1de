"""Deterministic scheduled jumps at fixed grid times.

Reference: mqt-yaqs core/methods/scheduled_jumps.py — jump operators applied
at user-specified times (grid tolerance ``dt * 1e-3``), replacing the
stochastic process at those steps; supported for analog MPS TJM order 1.

TPU mapping: the schedule is compiled host-side into per-step one-site
operator stacks ``(num_steps, L, d, d)`` (identity where no jump) plus a
per-step flag; inside the trajectory scan a flagged step applies the stack in
one einsum and renormalizes.  Adjacent two-site jump matrices are decomposed
into per-site factors when they factorize exactly (product application needs
no SVD); non-factorizable ones compile into fixed-size per-step SLOT tables
``(num_steps, S)`` of (bond, (d^2, d^2) matrix, active) triples — ``S`` = max
two-site jumps at any one step — applied sequentially in user list order via
merge -> matrix -> truncated split (the reference's merged-SVD path,
scheduled_jumps.py:96-108).  Slots are fixed-shape so the tables ride the
trajectory scan as xs (TPU platform rules: no zero-sized operands, no
dynamic shapes); within a flagged step the one-site stack applies before the
two-site slots.
"""

from __future__ import annotations

import numpy as np

from ..models.operators import noise_operator

__all__ = [
    "apply_scheduled_jumps_host",
    "compile_scheduled_jumps",
    "split_t0_jumps",
]

_TIME_ATOL_FACTOR = 1e-3


def _resolve_jump_matrix(jump: dict) -> np.ndarray:
    if "matrix" in jump:
        return np.asarray(jump["matrix"], dtype=np.complex128)
    return noise_operator(str(jump["name"]))


def _factor_two_site(m: np.ndarray, d: int):
    """Factor a (d^2, d^2) matrix into A (x) B if it is rank-1 in the
    operator-Schmidt sense; returns None otherwise."""
    t = m.reshape(d, d, d, d).transpose(0, 2, 1, 3).reshape(d * d, d * d)
    u, s, vh = np.linalg.svd(t)
    if s[0] == 0 or (len(s) > 1 and s[1] > 1e-12 * s[0]):
        return None
    a = (u[:, 0] * np.sqrt(s[0])).reshape(d, d)
    b = (vh[0] * np.sqrt(s[0])).reshape(d, d)
    return a, b


def split_t0_jumps(scheduled: list[dict], times: np.ndarray):
    """Partition the schedule into (jumps at ``times[0]``, later jumps).

    The reference applies jumps scheduled at the start time *before* the
    initial sample (analog_tjm.py:281-283), so they must not enter the
    per-step tables; grid tolerance matches :func:`compile_scheduled_jumps`.
    """
    num_steps = len(times) - 1
    dt = float(times[1] - times[0]) if num_steps > 0 else 1.0
    atol = dt * _TIME_ATOL_FACTOR
    t0 = float(times[0])
    at0: list[dict] = []
    later: list[dict] = []
    for jump in scheduled:
        (at0 if abs(float(jump["time"]) - t0) <= atol else later).append(jump)
    return at0, later


def apply_scheduled_jumps_host(
    tensors0: np.ndarray, jumps: list[dict], *, threshold: float = 0.0
) -> np.ndarray:
    """Apply scheduled jumps host-side to padded ``(L, d, chi, chi)`` tensors.

    Mirrors the reference's start-time application (scheduled_jumps.py:52-119):
    one-site contraction, adjacent two-site merged apply + split, annihilation
    check, renormalization.  Deterministic and shared by every trajectory, so
    it runs once on the host instead of inside the scan.
    """
    from ..core.mps import MPS

    arr = np.asarray(tensors0, dtype=np.complex128).copy()
    chi = int(arr.shape[-1])
    m = MPS(tensors=arr)
    for jump in jumps:
        sites = jump["sites"]
        sites = [sites] if isinstance(sites, int) else list(sites)
        mat = _resolve_jump_matrix(jump)
        if len(sites) == 1:
            m.apply_local(mat, sites[0])
        elif len(sites) == 2:
            if abs(sites[1] - sites[0]) != 1:
                msg = "scheduled two-site jumps must be nearest-neighbor"
                raise ValueError(msg)
            m.apply_local(mat, (sites[0], sites[1]))
        else:
            msg = "scheduled jumps act on 1 or 2 sites"
            raise ValueError(msg)
    nrm2 = m.norm()
    if not np.isfinite(nrm2) or nrm2 <= 0.0:
        msg = (
            "Scheduled jump produced a zero or non-finite squared norm "
            f"(squared_norm={nrm2}); the jump operator annihilates the state"
        )
        raise ValueError(msg)
    if m.chi > chi:
        m.compress(threshold=threshold, max_bond_dim=chi)
    m.normalize()
    out = np.asarray(m.tensors, dtype=np.complex128)
    if out.shape[-1] > chi:
        # two-site apply doubles the padding; after truncation to <= chi kept
        # directions the data lives in the leading block (masked keep-counts)
        out = np.ascontiguousarray(out[:, :, :chi, :chi])
    return out


def compile_scheduled_jumps(
    scheduled: list[dict], times: np.ndarray, length: int, d: int = 2
):
    """Compile the schedule into ``(flags (T-1,), mats (T-1, L, d, d), two)``.

    Step ``j`` (applying between ``times[j-1]`` and ``times[j]``) carries the
    jumps scheduled at ``times[j]``. Returns ``None`` for an empty schedule.
    ``two`` is ``None`` when every jump factorizes into per-site operators;
    otherwise it is the fixed-shape slot-table triple
    ``(bonds (T-1, S) int32, mats2 (T-1, S, d^2, d^2), active (T-1, S) bool)``
    for the non-factorizable adjacent two-site jumps (see module docstring).
    """
    if not scheduled:
        return None
    num_steps = len(times) - 1
    dt = float(times[1] - times[0]) if num_steps > 0 else 1.0
    atol = dt * _TIME_ATOL_FACTOR
    mats = np.tile(np.eye(d, dtype=np.complex128), (max(num_steps, 1), length, 1, 1))
    flags = np.zeros(max(num_steps, 1), dtype=bool)
    two_site: list[list[tuple[int, np.ndarray]]] = [[] for _ in range(max(num_steps, 1))]
    for jump in scheduled:
        t_jump = float(jump["time"])
        hits = [j for j in range(1, num_steps + 1) if abs(times[j] - t_jump) <= atol]
        if not hits:
            msg = f"scheduled jump time {t_jump} does not match the time grid"
            raise ValueError(msg)
        j = hits[0] - 1  # step index
        sites = jump["sites"]
        sites = [sites] if isinstance(sites, int) else list(sites)
        if len(sites) == 1:
            m = _resolve_jump_matrix(jump)
            mats[j, sites[0]] = m @ mats[j, sites[0]]
        elif len(sites) == 2:
            if abs(sites[1] - sites[0]) != 1:
                msg = "scheduled two-site jumps must be nearest-neighbor"
                raise ValueError(msg)
            m = _resolve_jump_matrix(jump)
            if m.shape != (d * d, d * d):
                msg = f"two-site scheduled jump matrix must be ({d * d}, {d * d})"
                raise ValueError(msg)
            factors = _factor_two_site(m, d)
            lo = min(sites)
            if factors is not None:
                # exact product application — no SVD split needed
                mats[j, lo] = factors[0] @ mats[j, lo]
                mats[j, lo + 1] = factors[1] @ mats[j, lo + 1]
            else:
                if sites[0] > sites[1]:
                    # matrix rows are ordered (first-listed site most
                    # significant) — reorder to ascending-bond convention
                    perm = np.arange(d * d).reshape(d, d).T.reshape(-1)
                    m = m[np.ix_(perm, perm)]
                two_site[j].append((lo, m))
        else:
            msg = "scheduled jumps act on 1 or 2 sites"
            raise ValueError(msg)
        flags[j] = True
    slots = max((len(t) for t in two_site), default=0)
    if slots == 0:
        return flags, mats, None
    t_rows = max(num_steps, 1)
    bonds = np.zeros((t_rows, slots), dtype=np.int32)
    mats2 = np.tile(np.eye(d * d, dtype=np.complex128), (t_rows, slots, 1, 1))
    active = np.zeros((t_rows, slots), dtype=bool)
    for j, entries in enumerate(two_site):
        for s, (bond, m) in enumerate(entries):
            bonds[j, s] = bond
            mats2[j, s] = m
            active[j, s] = True
    return flags, mats, (bonds, mats2, active)
