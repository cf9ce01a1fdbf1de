"""Trajectory-ensemble runtime: vmap within a chip, mesh sharding across chips.

This replaces the reference's ProcessPoolExecutor runtime (mqt-yaqs
core/parallel_utils.py:331-391) with the TPU-native equivalent: the
embarrassingly-parallel trajectory ensemble is the data-parallel axis, batched
with ``vmap`` and laid out over a 1-D device mesh (axis ``"traj"``) via
sharding annotations, so XLA partitions the batch across chips over ICI with
no per-trajectory host traffic.  Results come back as one batched array; the
only cross-device communication is the final gather of the small
``(n_traj, n_obs, T)`` observable buffer.

Determinism: trajectory RNG keys are derived from the trajectory index alone
(``fold_in`` hierarchies), so results are bit-identical regardless of device
count or batch chunking — the analogue of the reference's
parallel/serial-equivalence guarantee (tests/test_simulator.py:86).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ExecutionConfig", "make_trajectory_mesh", "run_ensemble"]


@dataclasses.dataclass(frozen=True)
class ExecutionConfig:
    """Execution-side configuration (TPU analogue of the reference's
    ExecutionConfig, parallel_utils.py:185-259).

    Attributes:
        parallel: shard the trajectory batch over all visible devices.
        batch_size: max trajectories evaluated in one device dispatch (bounds
            peak memory); None = all at once.
        devices: explicit device list; None = ``jax.devices()``.
        show_progress: print chunk progress (host-side).
        max_retries: re-dispatch a failed chunk up to this many times
            (reference per-job retry, parallel_utils.py:361-389). Scope: this
            is an IN-PROCESS retry, useful for transient host-side faults
            (e.g. tunnel hiccups surfacing as runtime errors). It cannot
            recover the tunneled TPU's wedge failure mode, where one failed
            dispatch poisons every subsequent dispatch in the process
            (docs/tpu_numerics.md) — recovering that requires restarting the
            process, which is the caller's job. A repeat of the identical
            exception fast-fails instead of burning the retry budget.
    """

    parallel: bool = True
    batch_size: int | None = None
    devices: tuple | None = None
    show_progress: bool = False
    max_retries: int = 0


def make_trajectory_mesh(config: ExecutionConfig | None = None) -> Mesh:
    devices = list((config.devices if config and config.devices else jax.devices()))
    if config is not None and not config.parallel:
        devices = devices[:1]
    return Mesh(np.array(devices), ("traj",))


# Cross-run cache of jitted ensemble programs: traj_fn closures are rebuilt
# per Simulator.run (complex operands must ride as trace-time constants on
# the tunneled TPU platform), so without this every run retraces+recompiles.
# Callers opt in by passing program_key = a content digest of everything the
# closure captures (see digital engine _tree_digest).
_ENSEMBLE_CACHE: dict = {}
_ENSEMBLE_CACHE_MAX = 64


def clear_ensemble_cache() -> None:
    """Drop all cached jitted ensemble programs (test hygiene: required
    after monkeypatching numerical internals that the cache key — captured
    CONTENT + config — cannot see)."""
    _ENSEMBLE_CACHE.clear()


def tree_digest(tree) -> str:
    """Stable content digest of a host-numpy pytree (structure+shape+bytes);
    the identity used for cross-run program caching."""
    import hashlib

    h = hashlib.sha1()
    leaves, treedef = jax.tree.flatten(tree)
    h.update(repr(treedef).encode())
    for leaf in leaves:
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def run_ensemble(
    traj_fn: Callable,
    num_traj: int,
    base_key: jax.Array,
    key_fns: tuple[Callable, Callable],
    config: ExecutionConfig | None = None,
    reduce: str | None = None,
    program_key: object | None = None,
) -> np.ndarray:
    """Run ``traj_fn(traj_key, smpl_key) -> (n_obs, T)`` for ``num_traj``
    trajectories and return the stacked ``(num_traj, n_obs, T)`` host array.

    The batch axis is padded up to a multiple of the device count per chunk,
    sharded over the ``traj`` mesh axis, and chunked by ``batch_size``.

    ``program_key``: optional hashable identity for ``traj_fn``'s captured
    content; when given, the jitted batched program is reused across calls
    with the same key (cold-start fix, round 5).

    With ``reduce="mean"`` the cross-trajectory mean is taken ON DEVICE
    inside the jitted program: the sum over the sharded ``traj`` axis lowers
    to an XLA all-reduce over ICI, and only the small ``(n_obs, T)`` buffer
    ever crosses the host boundary (vs the full per-trajectory stack).  This
    is the mesh-native analogue of the reference's host-side aggregation
    loop (parallel_utils.py:331-391).  Padded trajectories (batch rounding
    past ``num_traj``) are masked out of the sum.  Note the summation order
    differs between chunkings, so reduced results agree across
    ``batch_size`` choices only to floating-point tolerance (the
    per-trajectory path stays bit-identical).
    """
    if reduce not in (None, "mean"):
        msg = f"reduce must be None or 'mean', got {reduce!r}"
        raise ValueError(msg)
    config = config or ExecutionConfig()
    mesh = make_trajectory_mesh(config)
    n_dev = mesh.devices.size

    traj_key_fn, sample_key_fn = key_fns
    cache_key = None if program_key is None else (program_key, reduce)
    batched = _ENSEMBLE_CACHE.get(cache_key) if cache_key is not None else None
    if batched is None:
        if reduce == "mean":

            @jax.jit
            def batched(tks, sks, valid):
                res = jax.vmap(traj_fn)(tks, sks)
                w = valid.reshape((-1,) + (1,) * (res.ndim - 1)).astype(res.dtype)
                # sum over the sharded axis -> XLA all-reduce over the traj mesh
                return jnp.sum(res * w, axis=0)

        else:
            batched = jax.jit(jax.vmap(traj_fn))
        if cache_key is not None:
            if len(_ENSEMBLE_CACHE) >= _ENSEMBLE_CACHE_MAX:
                _ENSEMBLE_CACHE.pop(next(iter(_ENSEMBLE_CACHE)))
            _ENSEMBLE_CACHE[cache_key] = batched

    chunk = config.batch_size or num_traj
    chunk = max(1, min(chunk, num_traj))
    # round the chunk to a device multiple so shards are even
    chunk = int(math.ceil(chunk / n_dev) * n_dev)

    key_sharding = NamedSharding(mesh, P("traj"))
    outs = []
    start = 0
    while start < num_traj:
        idx = np.arange(start, start + chunk)  # pad past num_traj; sliced later
        idx_arr = jnp.asarray(idx)
        tks = jax.vmap(lambda i: traj_key_fn(base_key, i))(idx_arr)
        sks = jax.vmap(lambda i: sample_key_fn(base_key, i))(idx_arr)
        tks = jax.device_put(tks, key_sharding)
        sks = jax.device_put(sks, key_sharding)
        attempt = 0
        last_sig = None
        while True:
            try:
                if reduce == "mean":
                    valid = jax.device_put(
                        jnp.asarray(idx < num_traj), key_sharding
                    )
                    res = batched(tks, sks, valid)
                else:
                    res = batched(tks, sks)
                out_np = np.asarray(res)  # fetch = the real completion point
                break
            except Exception as exc:
                attempt += 1
                sig = (type(exc), str(exc))
                if attempt > config.max_retries or sig == last_sig:
                    # identical repeat = deterministic failure (or the
                    # platform's dispatch wedge): retrying cannot help
                    raise
                last_sig = sig
        outs.append(out_np)
        if config.show_progress:
            done = min(start + chunk, num_traj)
            print(f"[yaqs_tpu] trajectories {done}/{num_traj}", flush=True)
        start += chunk
    if reduce == "mean":
        return np.sum(np.stack(outs, axis=0), axis=0) / num_traj
    return np.concatenate(outs, axis=0)[:num_traj]
