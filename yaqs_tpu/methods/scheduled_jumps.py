"""Deterministic scheduled jumps at fixed grid times.

Reference: mqt-yaqs core/methods/scheduled_jumps.py — jump operators applied
at user-specified times (grid tolerance ``dt * 1e-3``), replacing the
stochastic process at those steps; supported for analog MPS TJM order 1.

TPU mapping: the schedule is compiled host-side into per-step one-site
operator stacks ``(num_steps, L, d, d)`` (identity where no jump) plus a
per-step flag; inside the trajectory scan a flagged step applies the stack in
one einsum and renormalizes.  Adjacent two-site jump matrices are decomposed
into per-site factors when they factorize; otherwise they are rejected (the
reference's merged-SVD path for non-factorizable adjacent jumps is not
implemented yet).
"""

from __future__ import annotations

import numpy as np

from ..models.operators import noise_operator

__all__ = ["compile_scheduled_jumps"]

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


def compile_scheduled_jumps(
    scheduled: list[dict], times: np.ndarray, length: int, d: int = 2
):
    """Compile the schedule into ``(flags (T-1,), mats (T-1, L, d, d))``.

    Step ``j`` (applying between ``times[j-1]`` and ``times[j]``) carries the
    jumps scheduled at ``times[j]``. Returns ``None`` for an empty schedule.
    """
    if not scheduled:
        return None
    num_steps = len(times) - 1
    dt = float(times[1] - times[0]) if num_steps > 0 else 1.0
    atol = dt * _TIME_ATOL_FACTOR
    mats = np.tile(np.eye(d, dtype=np.complex128), (max(num_steps, 1), length, 1, 1))
    flags = np.zeros(max(num_steps, 1), dtype=bool)
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
            factors = _factor_two_site(m, d)
            if factors is None:
                msg = (
                    "non-factorizable adjacent scheduled jumps are not "
                    "supported yet; provide a product-form matrix"
                )
                raise NotImplementedError(msg)
            lo = min(sites)
            mats[j, lo] = factors[0] @ mats[j, lo]
            mats[j, lo + 1] = factors[1] @ mats[j, lo + 1]
        else:
            msg = "scheduled jumps act on 1 or 2 sites"
            raise ValueError(msg)
        flags[j] = True
    return flags, mats
