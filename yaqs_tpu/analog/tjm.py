"""Tensor Jump Method trajectories as jit-compiled scan programs.

The reference runs each trajectory as a Python loop over timesteps in a
process-pool worker (mqt-yaqs analog/analog_tjm.py).  Here one trajectory is a
single jitted function — ``lax.scan`` over the time grid around the TDVP +
dissipation + jump kernel — and the trajectory ensemble is ``vmap`` over
per-trajectory PRNG keys (sharded across chips by the runtime layer).

Scheme parity (analog_tjm.py:161-313):

- order 2 (``analog_tjm_2``): sampling MPS ``Phi_0 = jump(dissipate(psi0, dt/2))``;
  step ``Phi_{j+1} = jump(dissipate(tdvp(Phi_j, dt), dt))``; measurements are
  taken on a *copy* ``Psi_j = jump(dissipate(tdvp(Phi_j, dt), dt/2))`` using an
  independent per-timestep RNG stream so sampling never perturbs the
  trajectory stream (reference random_utils.py:20-79; here
  ``fold_in``-derived key hierarchies).
- order 1 (``analog_tjm_1``): in-place evolve -> dissipate -> jump -> measure.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.mps_ops import normalize_canonical
from ..core.noise_model import CompiledNoise
from ..core.observables import CompiledObservables, evaluate_observables
from ..methods.dissipation import apply_dissipation
from ..methods.stochastic import stochastic_process
from ..methods.bug import bug_step
from ..methods.tdvp import TDVPConfig, tdvp_step

__all__ = ["TrajectoryPlan", "tjm_trajectory", "trajectory_key", "sample_key"]


@dataclasses.dataclass(frozen=True)
class TrajectoryPlan:
    """Static trajectory schedule (hashable; jit static argument).

    ``num_steps`` is the number of dt-steps, i.e. ``len(times) - 1``;
    observables are sampled at every grid point when ``sample_timesteps`` else
    only at the final time.
    """

    dt: float
    num_steps: int
    order: int = 2
    sample_timesteps: bool = True
    evolution: TDVPConfig = dataclasses.field(default_factory=TDVPConfig)
    evolution_mode: str = "tdvp"  # "tdvp" | "bug"
    has_scheduled: bool = False  # deterministic scheduled jumps (order 1 only)
    record_diagnostics: bool = False  # effective-bond curves (extra sweep/step)

    @property
    def num_times(self) -> int:
        return self.num_steps + 1


def trajectory_key(base_key, traj_idx) -> jax.Array:
    """Trajectory RNG stream (initialize + step_through jumps)."""
    return jax.random.fold_in(jax.random.fold_in(base_key, 0), traj_idx)


def sample_key(base_key, traj_idx) -> jax.Array:
    """Independent per-trajectory sampling stream (measurement copies)."""
    return jax.random.fold_in(jax.random.fold_in(base_key, 1), traj_idx)


def _evaluate(tensors, co):
    return evaluate_observables(tensors, co)


def _diagnostics(tensors, threshold):
    """Effective bond dims from Schmidt spectra: (cost sum(chi_eff^3),
    max bond, total bond) — the reference's per-step diagnostics
    (MPS.record_diagnostics, mps.py:593-602) at fixed padded shape."""
    from ..equivalence.checker import _bond_spectra

    spectra, _ = _bond_spectra(tensors)  # (L-1, chi)
    smax = jnp.maximum(spectra[:, :1], 1e-300)
    eff = jnp.maximum(jnp.sum(spectra > threshold * smax, axis=1), 1)
    efff = eff.astype(spectra.dtype)
    return jnp.stack([jnp.sum(efff**3), jnp.max(efff), jnp.sum(efff)])


@partial(jax.jit, static_argnames=("plan",))
def tjm_trajectory(
    traj_key: jax.Array,
    smpl_key: jax.Array,
    tensors0: jnp.ndarray,
    mpo: jnp.ndarray,
    noise: CompiledNoise | None,
    observables: CompiledObservables,
    plan: TrajectoryPlan,
    sj_flags: jnp.ndarray | None = None,
    sj_mats: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run one TJM trajectory.

    Args:
        traj_key / smpl_key: independent PRNG streams (see ``trajectory_key``).
        tensors0: initial padded MPS, canonical at 0 and normalized.
        mpo: padded Hamiltonian MPO ``(L, d, d, Dw, Dw)``.
        noise: compiled noise model or None (noiseless).
        observables: compiled observable tables (one/two-site, entropy, PVM).
        plan: static schedule.

    Returns:
        ``(results, diagnostics, final_tensors)``: observable rows
        ``(n_obs, n_cols)``, diagnostics ``(3, n_cols)`` (cost sum(chi^3),
        max bond, total bond; zeros unless ``plan.record_diagnostics``), and
        the final sampling state.
    """
    dt = plan.dt
    cfg = plan.evolution
    n_obs = observables.num_rows
    n_cols = plan.num_times if plan.sample_timesteps else 1

    if plan.evolution_mode == "bug":
        evolve = lambda t, step_dt: bug_step(t, mpo, step_dt, cfg)
    else:
        evolve = lambda t, step_dt: tdvp_step(t, mpo, step_dt, cfg)

    if plan.num_steps == 0:
        vals = _evaluate(tensors0, observables)
        diag0 = (
            _diagnostics(tensors0, cfg.threshold)[:, None]
            * jnp.ones((3, n_cols), tensors0.real.dtype)
            if plan.record_diagnostics
            else jnp.zeros((3, n_cols), tensors0.real.dtype)
        )
        return (
            vals[:, None] * jnp.ones((n_obs, n_cols), vals.dtype),
            diag0,
            tensors0,
        )

    if plan.order == 2:
        return _run_order2(
            traj_key, smpl_key, tensors0, noise, observables, plan, evolve
        )
    return _run_order1(
        traj_key, tensors0, noise, observables, plan, evolve, sj_flags, sj_mats
    )


def _renorm_center0(tensors):
    """Rescale site 0 so the canonical-at-0 state is normalized.

    Applied right after the unitary TDVP/BUG evolution: the exact step is
    norm-preserving, so any drift (fixed-iteration Krylov series truncation,
    fixed-chi split loss) is numerical and must NOT leak into the subsequent
    dissipation norm deficit, which IS the jump probability (reference
    renorm_drift for fixed-chi runs, sweep_utils.py:152)."""
    from ..core.mps_ops import norm_squared_center0

    n2 = norm_squared_center0(tensors)
    safe = jnp.where(n2 > 0, jnp.sqrt(n2), 1.0)
    return tensors.at[0].set(tensors[0] / safe.astype(tensors.dtype))


def _run_order2(traj_key, smpl_key, tensors0, noise, observables, plan, evolve):
    dt = plan.dt
    t_total = plan.num_times

    cfg = plan.evolution

    def sample(phi, j):
        """Measure a copy evolved by dt + dissipated dt/2 + jumped (indep. RNG)."""
        psi = _renorm_center0(evolve(phi, dt))
        psi = apply_dissipation(psi, noise, dt / 2, cfg)
        psi, _ = stochastic_process(
            psi, noise, dt, jax.random.fold_in(smpl_key, j), cfg
        )
        diag = (
            _diagnostics(psi, cfg.threshold)
            if plan.record_diagnostics
            else jnp.zeros((3,), psi.real.dtype)
        )
        return _evaluate(psi, observables), diag, psi

    def step_through(phi, j):
        phi = _renorm_center0(evolve(phi, dt))
        phi = apply_dissipation(phi, noise, dt, cfg)
        phi, _ = stochastic_process(
            phi, noise, dt, jax.random.fold_in(traj_key, j), cfg
        )
        return phi

    obs0 = _evaluate(tensors0, observables)
    diag0 = (
        _diagnostics(tensors0, cfg.threshold)
        if plan.record_diagnostics
        else jnp.zeros((3,), tensors0.real.dtype)
    )

    # F0: dissipate dt/2 + jump
    phi = apply_dissipation(tensors0, noise, dt / 2, cfg)
    phi, _ = stochastic_process(phi, noise, dt, jax.random.fold_in(traj_key, 0), cfg)

    obs1, diag1, psi1 = sample(phi, 1)

    if plan.num_steps >= 2:

        def body(carry, j):
            phi, _ = carry
            phi = step_through(phi, j)
            obs_j, diag_j, psi_j = sample(phi, j)
            return (phi, psi_j), (obs_j, diag_j)

        (phi, final_psi), (obs_rest, diag_rest) = jax.lax.scan(
            body, (phi, psi1), jnp.arange(2, t_total)
        )
        cols = jnp.concatenate([obs0[None], obs1[None], obs_rest], axis=0)  # (T, n_obs)
        diags = jnp.concatenate([diag0[None], diag1[None], diag_rest], axis=0)
    else:
        final_psi = psi1
        cols = jnp.stack([obs0, obs1], axis=0)
        diags = jnp.stack([diag0, diag1], axis=0)

    if plan.sample_timesteps:
        return cols.T, diags.T, final_psi  # (n_obs, T), (3, T)
    return cols[-1][:, None], diags[-1][:, None], final_psi


def _run_order1(
    traj_key, tensors0, noise, observables, plan, evolve, sj_flags=None, sj_mats=None
):
    dt = plan.dt
    t_total = plan.num_times

    def apply_scheduled(state, mats):
        state = jnp.einsum("iab,iblr->ialr", mats.astype(state.dtype), state)
        state, _ = normalize_canonical(state)
        return state

    def body(state, xs):
        j = xs[0] if plan.has_scheduled else xs
        state = evolve(state, dt)
        if noise is not None:
            state = _renorm_center0(state)
            state = apply_dissipation(state, noise, dt, plan.evolution)
            if plan.has_scheduled:
                _, flag, mats = xs
                state = jax.lax.cond(
                    flag,
                    lambda st: apply_scheduled(st, mats),
                    lambda st: stochastic_process(
                        st, noise, dt, jax.random.fold_in(traj_key, j), plan.evolution
                    )[0],
                    state,
                )
            else:
                state, _ = stochastic_process(
                    state, noise, dt, jax.random.fold_in(traj_key, j), plan.evolution
                )
        elif plan.has_scheduled:
            _, flag, mats = xs
            state = jax.lax.cond(
                flag,
                lambda st: apply_scheduled(st, mats),
                lambda st: normalize_canonical(st)[0],
                state,
            )
        else:
            state, _ = normalize_canonical(state)
        diag = (
            _diagnostics(state, plan.evolution.threshold)
            if plan.record_diagnostics
            else jnp.zeros((3,), state.real.dtype)
        )
        return state, (_evaluate(state, observables), diag)

    obs0 = _evaluate(tensors0, observables)
    diag0 = (
        _diagnostics(tensors0, plan.evolution.threshold)
        if plan.record_diagnostics
        else jnp.zeros((3,), tensors0.real.dtype)
    )
    xs = (
        (jnp.arange(1, t_total), sj_flags, sj_mats)
        if plan.has_scheduled
        else jnp.arange(1, t_total)
    )
    state, (obs_rest, diag_rest) = jax.lax.scan(body, tensors0, xs)
    cols = jnp.concatenate([obs0[None], obs_rest], axis=0)
    diags = jnp.concatenate([diag0[None], diag_rest], axis=0)
    if plan.sample_timesteps:
        return cols.T, diags.T, state
    return cols[-1][:, None], diags[-1][:, None], state
