"""Fixed-shape singular-value truncation (mask semantics).

The reference library truncates by *shrinking* the bond dimension to a
data-dependent keep-count (mqt-yaqs core/linalg/svd_utils.py:22-83).  Dynamic
shapes do not jit on TPU, so here truncation keeps the padded shape and instead
returns a keep-count plus a binary mask over singular values: masked-out
singular values are zeroed, which makes the corresponding bond directions drop
out of every subsequent contraction exactly as if the bond had been shrunk.

Keep-count semantics replicate the reference bit-for-bit:

- ``discarded_weight``: discard the largest tail (smallest singular values)
  whose cumulative squared weight stays strictly below ``threshold``; if even
  the full sum is below ``threshold`` nothing is discarded.
- ``relative``: keep values with ``s / s[0] >= threshold`` (``s[0] <= 0`` keeps
  nothing before caps).
- ``hard_cutoff``: keep values strictly greater than ``threshold``.

``max_bond_dim`` caps and ``min_keep`` floors are applied last, in that order.
All functions are shape-polymorphic over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["keep_count", "keep_mask", "TRUNC_MODES"]

TRUNC_MODES = ("discarded_weight", "relative", "hard_cutoff")


def keep_count(
    s: jnp.ndarray,
    *,
    mode: str,
    threshold,
    max_bond_dim: int | None = None,
    min_keep: int = 1,
) -> jnp.ndarray:
    """Number of leading singular values to keep (traced int32, batched).

    Args:
        s: Singular values in non-increasing order, shape ``(..., n)``.
        mode: One of ``TRUNC_MODES``.
        threshold: Mode-dependent cutoff (scalar, may be traced).
        max_bond_dim: Optional static hard cap.
        min_keep: Static floor (applied last).

    Returns:
        int32 array of shape ``(...,)`` with values in ``[min_keep, n]``.
    """
    if mode not in TRUNC_MODES:
        msg = f"Unknown truncation mode: {mode!r}"
        raise ValueError(msg)
    n = s.shape[-1]
    if max_bond_dim is not None and max_bond_dim < min_keep:
        msg = f"max_bond_dim ({max_bond_dim}) must be >= min_keep ({min_keep})"
        raise ValueError(msg)

    if mode == "hard_cutoff":
        keep = jnp.sum(s > threshold, axis=-1)
    elif mode == "relative":
        smax = s[..., :1]
        rel_keep = jnp.sum(s >= threshold * smax, axis=-1)
        keep = jnp.where(smax[..., 0] <= 0.0, 0, rel_keep)
    else:  # discarded_weight
        s2 = jnp.square(s)
        # tail2[..., k] = sum_{i >= k} s_i^2; discarding from k on is allowed
        # when tail2[k] < threshold. keep = count of k with tail2[k] >= threshold,
        # except when even the total weight is below threshold (keep everything,
        # matching the reference's no-break path).
        tail2 = jnp.flip(jnp.cumsum(jnp.flip(s2, axis=-1), axis=-1), axis=-1)
        keep = jnp.sum(tail2 >= threshold, axis=-1)
        keep = jnp.where(tail2[..., 0] < threshold, n, keep)

    if max_bond_dim is not None:
        keep = jnp.minimum(keep, max_bond_dim)
    keep = jnp.maximum(keep, min_keep)
    return jnp.minimum(keep, n).astype(jnp.int32)


def keep_mask(
    s: jnp.ndarray,
    *,
    mode: str,
    threshold,
    max_bond_dim: int | None = None,
    min_keep: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Binary mask over singular values implementing fixed-shape truncation.

    Returns:
        ``(mask, keep)`` where ``mask`` has the same shape/real-dtype as ``s``
        (1.0 for kept values) and ``keep`` is the int32 keep-count.
    """
    keep = keep_count(
        s, mode=mode, threshold=threshold, max_bond_dim=max_bond_dim, min_keep=min_keep
    )
    idx = jnp.arange(s.shape[-1], dtype=jnp.int32)
    mask = (idx < keep[..., None]).astype(s.dtype)
    return mask, keep
