"""Ensemble runtime: chunking/device-count invariance and retry behavior.

The reference guarantees parallel == serial results via SeedSequence streams
(tests/test_simulator.py:86); here the same guarantee is: results are
bit-identical for ANY batch_size / device count because keys derive from the
trajectory index alone.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from yaqs_tpu.parallel.runtime import ExecutionConfig, make_trajectory_mesh, run_ensemble


def _traj_fn(tk, sk):
    # deterministic pseudo-trajectory: depends on both streams
    a = jax.random.normal(tk, (3, 4))
    b = jax.random.normal(sk, (3, 4))
    return a + 0.5 * b


def _keys(base, i):
    return jax.random.fold_in(base, i)


def test_chunking_invariance():
    base = jax.random.PRNGKey(0)
    outs = []
    for bs in (None, 1, 3, 16):
        res = run_ensemble(
            _traj_fn, 7, base, (_keys, lambda b, i: _keys(jax.random.fold_in(b, 99), i)),
            ExecutionConfig(batch_size=bs),
        )
        outs.append(np.asarray(res))
    for other in outs[1:]:
        np.testing.assert_array_equal(outs[0], other)


def test_serial_vs_parallel_devices():
    base = jax.random.PRNGKey(1)
    kf = (_keys, lambda b, i: _keys(jax.random.fold_in(b, 7), i))
    par = run_ensemble(_traj_fn, 5, base, kf, ExecutionConfig(parallel=True))
    ser = run_ensemble(_traj_fn, 5, base, kf, ExecutionConfig(parallel=False))
    np.testing.assert_array_equal(par, ser)


def test_mesh_respects_parallel_flag():
    assert make_trajectory_mesh(ExecutionConfig(parallel=False)).devices.size == 1
    assert make_trajectory_mesh(ExecutionConfig(parallel=True)).devices.size >= 1


def test_on_device_mean_reduction_matches_host_mean():
    """reduce="mean" sums over the SHARDED traj axis inside jit (lowers to an
    XLA all-reduce over the mesh) and must agree with the host-side mean of
    the per-trajectory path, including masked padding (7 traj on 8 devices)
    and across chunk sizes."""
    base = jax.random.PRNGKey(3)
    kf = (_keys, lambda b, i: _keys(jax.random.fold_in(b, 11), i))
    full = run_ensemble(_traj_fn, 7, base, kf, ExecutionConfig())
    want = np.asarray(full).mean(axis=0)
    for bs in (None, 2, 16):
        got = run_ensemble(
            _traj_fn, 7, base, kf, ExecutionConfig(batch_size=bs), reduce="mean"
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_reduce_rejects_unknown_mode():
    base = jax.random.PRNGKey(4)
    kf = (_keys, _keys)
    with pytest.raises(ValueError, match="reduce"):
        run_ensemble(_traj_fn, 2, base, kf, None, reduce="sum")


def test_retry_recovers_transient_failure():
    calls = {"n": 0}

    def flaky(tk, sk):
        # Python-level failure on first trace; retry recompiles and succeeds.
        calls["n"] += 1
        if calls["n"] == 1:
            msg = "transient"
            raise OSError(msg)
        return jax.random.normal(tk, (2,))

    base = jax.random.PRNGKey(2)
    kf = (_keys, lambda b, i: _keys(jax.random.fold_in(b, 3), i))
    with pytest.raises(OSError):
        run_ensemble(flaky, 2, base, kf, ExecutionConfig(max_retries=0))
    calls["n"] = 0
    res = run_ensemble(flaky, 2, base, kf, ExecutionConfig(max_retries=2))
    assert res.shape == (2, 2)
