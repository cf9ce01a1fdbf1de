"""TJM orchestration-order contracts.

The reference pins its pipeline order with mock-based tests (initialize must
call dissipation(dt/2) before the stochastic process; step_through must run
tdvp -> dissipation(dt) -> jumps; /root/reference/tests/analog/
test_analog_tjm.py:66-130).  Here the pipeline is a single traced program, so
the equivalent — and stronger — check is compositional: re-build each schedule
out of the exported component functions in the documented order and demand
numerical identity with ``tjm_trajectory``.  Any reordering, missing renorm,
wrong dt, or wrong RNG fold breaks these at far above the tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yaqs_tpu.analog.tjm import (
    TrajectoryPlan,
    _evaluate,
    _renorm_center0,
    sample_key,
    tjm_trajectory,
    trajectory_key,
)
from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.mpo_builders import ising_mpo
from yaqs_tpu.core.noise_model import NoiseModel, compile_noise
from yaqs_tpu.core.observables import compile_observables
from yaqs_tpu.core.sim_params import Observable
from yaqs_tpu.methods.dissipation import apply_dissipation
from yaqs_tpu.methods.stochastic import stochastic_process
from yaqs_tpu.methods.tdvp import TDVPConfig, tdvp_step

L, CHI, DT, STEPS = 4, 8, 0.1, 3


def _operands(two_site_obs: bool):
    w = ising_mpo(L, 1.0, 0.5)
    t0 = mps_ops.named_product_state("x+", L, CHI)
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.3} for i in range(L)]
        + [{"name": "z", "sites": [i], "strength": 0.2} for i in range(L)]
    )
    noise = compile_noise(nm, L, 2)
    obs = [Observable("z", i) for i in range(L)]
    if two_site_obs:
        # a two-site row disables the gauge-free fast path so the composed
        # measurement branch below matches the engine's exactly
        obs.append(Observable("zz", [0, 1]))
    return w, t0, noise, compile_observables(obs, L, 2)


def _plan(order: int) -> TrajectoryPlan:
    return TrajectoryPlan(
        dt=DT,
        num_steps=STEPS,
        order=order,
        sample_timesteps=True,
        evolution=TDVPConfig(krylov_dim=5, threshold=1e-9, max_bond_dim=CHI),
    )


def test_order1_schedule_matches_component_composition():
    """Order 1 per step: evolve(dt) -> renorm -> dissipate(dt) ->
    jump(fold(traj_key, j)); column j measures the post-jump state."""
    w, t0, noise, obs = _operands(two_site_obs=True)
    plan = _plan(1)
    base = jax.random.PRNGKey(7)
    tk, sk = trajectory_key(base, 0), sample_key(base, 0)
    cfg = plan.evolution

    @jax.jit
    def composed(tk):
        state = jnp.asarray(t0)
        cols = [_evaluate(state, obs)]
        for j in range(1, STEPS + 1):
            state = tdvp_step(state, jnp.asarray(w), DT, cfg)
            state = _renorm_center0(state)
            state = apply_dissipation(state, noise, DT, cfg)
            state, _ = stochastic_process(
                state, noise, DT, jax.random.fold_in(tk, j), cfg
            )
            cols.append(_evaluate(state, obs))
        return jnp.stack(cols, axis=1), state

    want_cols, want_state = composed(tk)
    got_cols, _, got_state = jax.jit(
        lambda tk, sk: tjm_trajectory(tk, sk, t0, w, noise, obs, plan)
    )(tk, sk)
    np.testing.assert_allclose(got_cols, want_cols, atol=1e-12, rtol=0)
    np.testing.assert_allclose(got_state, want_state, atol=1e-12, rtol=0)


def test_order2_schedule_matches_component_composition():
    """Order 2: F0 = dissipate(dt/2) -> jump(fold(traj, 0)); each step
    evolves ONCE and forks: trajectory branch dissipate(dt) + jump(traj
    stream), measurement branch dissipate(dt/2) + jump(sampling stream)."""
    w, t0, noise, obs = _operands(two_site_obs=True)
    plan = _plan(2)
    base = jax.random.PRNGKey(11)
    tk, sk = trajectory_key(base, 0), sample_key(base, 0)
    cfg = plan.evolution

    @jax.jit
    def composed(tk, sk):
        cols = [_evaluate(jnp.asarray(t0), obs)]
        # initialize: half-step dissipation, then jumps with fold 0
        phi = apply_dissipation(jnp.asarray(t0), noise, DT / 2, cfg)
        phi, _ = stochastic_process(phi, noise, DT, jax.random.fold_in(tk, 0), cfg)
        evolved = _renorm_center0(tdvp_step(phi, jnp.asarray(w), DT, cfg))

        def measure(evolved, j):
            psi = apply_dissipation(evolved, noise, DT / 2, cfg)
            psi, _ = stochastic_process(
                psi, noise, DT, jax.random.fold_in(sk, j), cfg
            )
            return _evaluate(psi, obs), psi

        col, psi = measure(evolved, 1)
        cols.append(col)
        for j in range(2, STEPS + 1):
            phi = apply_dissipation(evolved, noise, DT, cfg)
            phi, _ = stochastic_process(
                phi, noise, DT, jax.random.fold_in(tk, j), cfg
            )
            evolved = _renorm_center0(tdvp_step(phi, jnp.asarray(w), DT, cfg))
            col, psi = measure(evolved, j)
            cols.append(col)
        return jnp.stack(cols, axis=1), psi

    want_cols, want_state = composed(tk, sk)
    got_cols, _, got_state = jax.jit(
        lambda tk, sk: tjm_trajectory(tk, sk, t0, w, noise, obs, plan)
    )(tk, sk)
    np.testing.assert_allclose(got_cols, want_cols, atol=1e-12, rtol=0)
    np.testing.assert_allclose(got_state, want_state, atol=1e-12, rtol=0)


def test_rng_streams_are_independent():
    """Stream contract: order 1 never consumes the sampling stream (bit-
    identical under a different sample_key); order 2's measurement branch
    consumes ONLY the sampling stream at the documented folds, so swapping
    sample_keys changes measured columns while a composed trajectory carry
    (re-built with the trajectory stream alone) is untouched — covered by
    the composition test above.  A different trajectory_key changes both."""
    w, t0, noise, obs = _operands(two_site_obs=False)
    base = jax.random.PRNGKey(3)

    plan1 = _plan(1)
    run1 = jax.jit(lambda tk, sk: tjm_trajectory(tk, sk, t0, w, noise, obs, plan1))
    tk = trajectory_key(base, 0)
    cols_a, _, state_a = run1(tk, sample_key(base, 0))
    cols_b, _, state_b = run1(tk, sample_key(base, 1))
    np.testing.assert_array_equal(np.asarray(state_a), np.asarray(state_b))
    np.testing.assert_array_equal(np.asarray(cols_a), np.asarray(cols_b))

    plan2 = _plan(2)
    run2 = jax.jit(lambda tk, sk: tjm_trajectory(tk, sk, t0, w, noise, obs, plan2))
    cols_c, _, _ = run2(tk, sample_key(base, 0))
    cols_d, _, _ = run2(tk, sample_key(base, 1))
    # column 0 measures the initial state (no RNG); later columns come from
    # the measurement branch and must respond to the sampling stream
    np.testing.assert_array_equal(np.asarray(cols_c)[:, 0], np.asarray(cols_d)[:, 0])
    assert not np.allclose(np.asarray(cols_c), np.asarray(cols_d), atol=1e-6)

    # A different trajectory_key must change the jump realization.  Any single
    # pair of trajectories can legitimately coincide (both may draw "no jump"
    # at these rates), so scan a handful of indices and demand at least one
    # diverges — all-identical across 8 streams would mean the trajectory key
    # is never consumed.
    diverged = False
    for idx in range(1, 9):
        _, _, state_e = run1(trajectory_key(base, idx), sample_key(base, 0))
        if not np.allclose(np.asarray(state_a), np.asarray(state_e), atol=1e-6):
            diverged = True
            break
    assert diverged


@pytest.mark.parametrize("order", [1, 2])
def test_final_only_sampling_matches_last_sampled_column(order):
    """sample_timesteps=False must reproduce the last column of the sampled
    run exactly: the RNG folds are schedule-independent by design."""
    w, t0, noise, obs = _operands(two_site_obs=False)
    base = jax.random.PRNGKey(5)
    tk, sk = trajectory_key(base, 0), sample_key(base, 0)
    full = _plan(order)
    final = TrajectoryPlan(
        dt=DT, num_steps=STEPS, order=order, sample_timesteps=False,
        evolution=full.evolution,
    )
    cols_full, _, state_full = jax.jit(
        lambda tk, sk: tjm_trajectory(tk, sk, t0, w, noise, obs, full)
    )(tk, sk)
    cols_final, _, state_final = jax.jit(
        lambda tk, sk: tjm_trajectory(tk, sk, t0, w, noise, obs, final)
    )(tk, sk)
    np.testing.assert_allclose(
        np.asarray(cols_final)[:, 0], np.asarray(cols_full)[:, -1],
        atol=1e-12, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(state_final), np.asarray(state_full), atol=1e-12, rtol=0
    )


def test_noiseless_orders_agree():
    """With noise=None both schedules collapse to the same unitary chain —
    the order-2 half-step dissipations are identities."""
    w, t0, _, obs = _operands(two_site_obs=False)
    base = jax.random.PRNGKey(1)
    tk, sk = trajectory_key(base, 0), sample_key(base, 0)
    cols = []
    for order in (1, 2):
        plan = _plan(order)
        c, _, _ = jax.jit(
            lambda tk, sk, plan=plan: tjm_trajectory(tk, sk, t0, w, None, obs, plan)
        )(tk, sk)
        cols.append(np.asarray(c))
    np.testing.assert_allclose(cols[0], cols[1], atol=1e-10)
