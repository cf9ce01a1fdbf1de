"""Cross-run program cache contracts (round-5 digital cold-start fix).

The step factories are cached by the CONTENT of what their closures capture
(noise tables, observable tables) plus the static config; identical
Simulator.run calls must reuse the same jitted programs (no retrace, no
recompile), while any content change must miss.  Results must be bitwise
independent of cache hits.
"""

from __future__ import annotations

import numpy as np

from yaqs_tpu import DigitalSimParams, NoiseModel, Observable, Simulator, State
from yaqs_tpu.core.noise_model import compile_noise
from yaqs_tpu.digital.circuit import Circuit
from yaqs_tpu.digital.engine import make_half_layer_step, make_gate_stage_steps
from yaqs_tpu.methods.tdvp import TDVPConfig
from yaqs_tpu.parallel.runtime import run_ensemble, tree_digest


def _noise(n=3, gamma=0.1):
    return compile_noise(
        NoiseModel([{"name": "lowering", "sites": [i], "strength": gamma} for i in range(n)]),
        n,
        2,
    )


def test_half_layer_programs_reused_for_identical_content():
    cfg = TDVPConfig(krylov_dim=4, threshold=1e-6, max_bond_dim=8)
    a = make_half_layer_step(_noise(), cfg, True)
    b = make_half_layer_step(_noise(), cfg, True)
    assert a[0] is b[0] and a[1] is b[1] and a[2] is b[2]


def test_half_layer_cache_misses_on_content_change():
    cfg = TDVPConfig(krylov_dim=4, threshold=1e-6, max_bond_dim=8)
    a = make_half_layer_step(_noise(gamma=0.1), cfg, True)
    b = make_half_layer_step(_noise(gamma=0.2), cfg, True)
    assert a[0] is not b[0]
    c2 = TDVPConfig(krylov_dim=5, threshold=1e-6, max_bond_dim=8)
    c = make_half_layer_step(_noise(gamma=0.1), c2, True)
    assert a[0] is not c[0]


def test_gate_stage_programs_reused():
    cfg = TDVPConfig(krylov_dim=4, threshold=1e-6, max_bond_dim=8)
    a = make_gate_stage_steps(_noise(), cfg, True, "mpo", 3)
    b = make_gate_stage_steps(_noise(), cfg, True, "mpo", 3)
    assert a is b
    c = make_gate_stage_steps(_noise(), cfg, True, "mpo", 4)
    assert a is not c


def test_tree_digest_stability_and_sensitivity():
    t1 = {"a": np.arange(6).reshape(2, 3), "b": np.ones(2, dtype=np.complex64)}
    t2 = {"a": np.arange(6).reshape(2, 3), "b": np.ones(2, dtype=np.complex64)}
    assert tree_digest(t1) == tree_digest(t2)
    t3 = {"a": np.arange(6).reshape(3, 2), "b": np.ones(2, dtype=np.complex64)}
    assert tree_digest(t1) != tree_digest(t3)  # shape
    t4 = {"a": np.arange(6).reshape(2, 3), "b": np.ones(2, dtype=np.complex128)}
    assert tree_digest(t1) != tree_digest(t4)  # dtype
    t5 = {"a": np.arange(1, 7).reshape(2, 3), "b": np.ones(2, dtype=np.complex64)}
    assert tree_digest(t1) != tree_digest(t5)  # values


def test_repeat_runs_bit_identical_through_cache():
    """Second run reuses cached programs and reproduces the first bitwise."""
    n = 4
    c = Circuit(n)
    for i in range(n):
        c.h(i)
    for i in range(0, n - 1, 2):
        c.cx(i, i + 1)
    c.measure()
    nm = NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.05} for i in range(n)])

    def params():
        return DigitalSimParams(
            observables=[Observable("z", i) for i in range(n)],
            num_traj=6, shots=9, max_bond_dim=8, random_seed=11,
        )

    r1 = Simulator().run(State(n), c, params(), nm)
    r2 = Simulator().run(State(n), c, params(), nm)
    np.testing.assert_array_equal(r1.trajectories, r2.trajectories)
    assert r1.counts == r2.counts


def test_noise_strength_change_changes_results_not_stale_cache():
    """A different noise strength must NOT hit the cached program of the old
    strength (the closure captures the noise tables)."""
    n = 3
    c = Circuit(n)
    for i in range(n):
        c.h(i)
    c.cx(0, 1)

    def run(gamma):
        nm = NoiseModel([{"name": "lowering", "sites": [i], "strength": gamma} for i in range(n)])
        p = DigitalSimParams(
            observables=[Observable("z", i) for i in range(n)],
            num_traj=8, max_bond_dim=8, random_seed=5,
        )
        return np.asarray(Simulator().run(State(n), c, p, nm).expectation_values)

    a = run(0.02)
    b = run(0.4)
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(a, run(0.02))  # and the cache is consistent


def test_run_ensemble_program_key_reuse_and_isolation():
    import jax
    import jax.numpy as jnp
    from yaqs_tpu.parallel.runtime import _ENSEMBLE_CACHE, ExecutionConfig

    calls = []

    def make_fn(scale):
        def traj_fn(tk, sk):
            calls.append(scale)
            return jnp.ones((2, 3)) * scale

        return traj_fn

    key = jax.random.PRNGKey(0)
    kf = (lambda k, i: jax.random.fold_in(k, i), lambda k, i: jax.random.fold_in(k, 7 * i + 1))
    cfg = ExecutionConfig(parallel=False)
    out1 = run_ensemble(make_fn(1.0), 2, key, kf, cfg, program_key=("t", "digest1"))
    n_traces = len(calls)
    out2 = run_ensemble(make_fn(2.0), 2, key, kf, cfg, program_key=("t", "digest1"))
    # same key -> CACHED program (the second traj_fn is never traced): this
    # is exactly why callers must key by captured content
    assert len(calls) == n_traces
    np.testing.assert_array_equal(out1, out2)
    out3 = run_ensemble(make_fn(3.0), 2, key, kf, cfg, program_key=("t", "digest3"))
    assert len(calls) > n_traces
    assert float(out3[0, 0, 0]) == 3.0
    assert any(k[0] == ("t", "digest1") for k in _ENSEMBLE_CACHE)


def test_clear_program_cache_forces_retrace():
    """Monkeypatch hygiene: clearing the caches drops every cached program
    (content keys cannot see patched internals, so patched test code MUST
    call this)."""
    from yaqs_tpu.digital.engine import _PROGRAM_CACHE, clear_program_cache
    from yaqs_tpu.parallel.runtime import _ENSEMBLE_CACHE as ens
    from yaqs_tpu.core.noise_model import NoiseModel as NM, compile_noise
    from yaqs_tpu.methods.tdvp import TDVPConfig

    cfg = TDVPConfig(krylov_dim=4, threshold=1e-6, max_bond_dim=8)
    noise = compile_noise(NM([{"name": "lowering", "sites": [0], "strength": 0.1}]), 2, 2)
    a = make_half_layer_step(noise, cfg, True)
    assert _PROGRAM_CACHE
    clear_program_cache()
    assert not _PROGRAM_CACHE and not ens
    b = make_half_layer_step(noise, cfg, True)
    assert a[0] is not b[0]
