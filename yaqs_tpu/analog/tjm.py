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
from ..ops.decomp import merge_two_site, split_two_site_truncated
from ..core.noise_model import CompiledNoise
from ..core.observables import (
    CompiledObservables,
    evaluate_observables,
    evaluate_observables_gauge_free,
)
from ..methods.dissipation import apply_dissipation
from ..methods.stochastic import stochastic_process
from ..methods.bug import bug_step
from ..methods.tdvp import TDVPConfig, tdvp_step

__all__ = [
    "TrajectoryPlan",
    "tjm_trajectory",
    "make_order2_chunked",
    "trajectory_key",
    "sample_key",
]


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
    has_scheduled2: bool = False  # non-factorizable two-site slot tables present
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
    from ..core.mps_ops import bond_spectra

    if tensors.shape[0] < 2:  # single site: no internal bonds
        one = jnp.ones((), tensors.real.dtype)
        return jnp.stack([one, one, one])
    spectra, _ = bond_spectra(tensors)  # (L-1, chi)
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
    sj_two: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run one TJM trajectory.

    Args:
        traj_key / smpl_key: independent PRNG streams (see ``trajectory_key``).
        tensors0: initial padded MPS, canonical at 0 and normalized.
        mpo: padded Hamiltonian MPO ``(L, d, d, Dw, Dw)``.
        noise: compiled noise model or None (noiseless).
        observables: compiled observable tables (one/two-site, entropy, PVM).
        plan: static schedule.
        sj_flags / sj_mats / sj_two: compiled scheduled-jump tables
            (methods/scheduled_jumps.compile_scheduled_jumps); ``sj_two`` is
            the ``(bonds, mats2, active)`` slot triple for non-factorizable
            adjacent two-site jumps, present iff ``plan.has_scheduled2``.

    Returns:
        ``(results, diagnostics, final_tensors)``: observable rows
        ``(n_obs, n_cols)``, diagnostics ``(3, n_cols)`` (cost sum(chi^3),
        max bond, total bond; zeros unless ``plan.record_diagnostics``), and
        the final sampling state.
    """
    dt = plan.dt
    cfg = plan.evolution
    # spectrum observables append chi extra rows past the scalar rows
    n_obs = observables.num_rows + observables.s_bonds.shape[0] * tensors0.shape[-1]
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
        traj_key, tensors0, noise, observables, plan, evolve, sj_flags, sj_mats,
        sj_two,
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


def _order2_branches(smpl_key, traj_key, noise, observables, plan, evolve):
    """The two stochastic continuations forking from a common evolved state.

    The reference's step_through and sample both begin with the SAME unitary
    evolution of Phi_j by dt (analog_tjm.py:66-160): the trajectory branch
    continues with dissipate(dt) + jump (trajectory RNG stream) while the
    measurement branch continues with dissipate(dt/2) + jump (independent
    sampling stream).  The evolution is deterministic, so it is computed
    ONCE per step and both branches fork from the evolved state — exact
    same results at half the TDVP cost (the reference recomputes it on the
    sampling deep-copy).

    Gauge-free measurement fast path: when every observable is one-site and
    diagnostics are off, the measurement branch's post-jump canonicalization
    — the step's dominant cost on TPU (~45 of 55 ms at L=100 chi=64 B=32,
    docs/tpu_numerics.md) — is skipped, and observables are evaluated from
    two-sided Gram moments normalized by <psi|psi>
    (core/observables.evaluate_observables_gauge_free).  That branch's state
    is discarded after evaluation (the trajectory continues from the
    TRAJECTORY branch), so the gauge restoration buys nothing.  In fast mode
    the psi returned by ``measure_branch`` is therefore RAW (arbitrary gauge,
    unnormalized); callers that expose a final state canonicalize it once at
    the very end (``_run_order2`` / the last ``make_order2_chunked`` chunk —
    same point in the op sequence, keeping chunked == monolithic bitwise).
    """
    dt = plan.dt
    cfg = plan.evolution
    fast = observables.only_one_site and not plan.record_diagnostics

    def measure_branch(evolved, j):
        """Dissipate dt/2 + jump (indep. RNG) + measure on the evolved state."""
        psi = apply_dissipation(evolved, noise, dt / 2, cfg)
        psi, _ = stochastic_process(
            psi, noise, dt, jax.random.fold_in(smpl_key, j), cfg,
            canonicalize=not fast,
        )
        if fast:
            zero_diag = jnp.zeros((3,), psi.real.dtype)
            return evaluate_observables_gauge_free(psi, observables), zero_diag, psi
        diag = (
            _diagnostics(psi, cfg.threshold)
            if plan.record_diagnostics
            else jnp.zeros((3,), psi.real.dtype)
        )
        return _evaluate(psi, observables), diag, psi

    def trajectory_branch(evolved, j):
        """Dissipate dt + jump (trajectory RNG) completing step_through."""
        phi = apply_dissipation(evolved, noise, dt, cfg)
        phi, _ = stochastic_process(
            phi, noise, dt, jax.random.fold_in(traj_key, j), cfg
        )
        return phi

    def body(carry, j):
        evolved_prev, _ = carry
        phi = trajectory_branch(evolved_prev, j)
        evolved_j = _renorm_center0(evolve(phi, dt))
        obs_j, diag_j, psi_j = measure_branch(evolved_j, j)
        return (evolved_j, psi_j), (obs_j, diag_j)

    return measure_branch, body, fast


def make_order2_chunked(tensors0, mpo, noise, observables, plan: TrajectoryPlan):
    """Closure factory for the chunked order-2 dispatch API.

    Returns ``(start, chunk)``:

    - ``start(traj_keys, smpl_keys) -> (carry, cols01, diags01)`` runs F0
      (dissipate dt/2 + jump) and the first evolution for a BATCH of
      trajectories (leading axis of the key arrays), measuring columns
      0 and 1 (``cols01`` is ``(B, 2, n_obs)``).
    - ``chunk(traj_keys, smpl_keys, carry, j0, j1) -> (carry, obs, diags)``
      continues over output columns ``[j0, j1)`` (static bounds;
      ``2 <= j0 < j1 <= plan.num_times``).  Chunk boundaries do not change
      results: the composition of chunks is the same operation sequence as
      the monolithic :func:`tjm_trajectory` scan.

    Chunking keeps each TPU dispatch under the worker's ~50 s limit for long
    time grids.  Platform rules (docs/tpu_numerics.md) are why this is a
    factory: ``tensors0`` / ``mpo`` / ``noise`` / ``observables`` must be
    host-numpy complex leaves baked in as trace-time CONSTANTS (host->device
    complex jit operands and zero-sized channel tables are UNIMPLEMENTED on
    the tunneled TPU), so only PRNG keys and the device-resident ``carry``
    cross the dispatch boundary; both functions are vmapped because the
    unbatched trajectory program does not lower on that platform.
    """
    cfg = plan.evolution
    dt = plan.dt
    evolve = _make_evolve(mpo, plan)

    def _restore(psi, fast):
        """Gauge-free fast mode leaves the measurement psi raw; restore the
        canonical contract exactly where the monolithic scan does (after the
        FINAL column) so chunked == monolithic stays bitwise."""
        if not fast:
            return psi
        out, _ = normalize_canonical(psi, method=cfg.canon_method)
        return out

    def _start_one(traj_key, smpl_key):
        t0 = jnp.asarray(tensors0)  # host-numpy closure -> trace-time constant
        measure_branch, _, fast = _order2_branches(
            smpl_key, traj_key, noise, observables, plan, evolve
        )
        obs0 = _evaluate(t0, observables)
        diag0 = (
            _diagnostics(t0, cfg.threshold)
            if plan.record_diagnostics
            else jnp.zeros((3,), t0.real.dtype)
        )
        phi = apply_dissipation(t0, noise, dt / 2, cfg)
        phi, _ = stochastic_process(
            phi, noise, dt, jax.random.fold_in(traj_key, 0), cfg
        )
        evolved = _renorm_center0(evolve(phi, dt))
        obs1, diag1, psi1 = measure_branch(evolved, 1)
        if plan.num_times <= 2:  # no chunks will follow: column 1 is final
            psi1 = _restore(psi1, fast)
        return (
            (evolved, psi1),
            jnp.stack([obs0, obs1], axis=0),
            jnp.stack([diag0, diag1], axis=0),
        )

    start = jax.jit(jax.vmap(_start_one))

    def _chunk_one(traj_key, smpl_key, carry, j0, j1):
        _, body, fast = _order2_branches(
            smpl_key, traj_key, noise, observables, plan, evolve
        )
        carry, (obs, diags) = jax.lax.scan(body, carry, jnp.arange(j0, j1))
        if j1 >= plan.num_times:  # final chunk: restore the sampling state
            carry = (carry[0], _restore(carry[1], fast))
        return carry, obs, diags

    @partial(jax.jit, static_argnames=("j0", "j1"))
    def chunk(traj_keys, smpl_keys, carry, j0: int, j1: int):
        return jax.vmap(
            lambda tk, sk, c: _chunk_one(tk, sk, c, j0, j1)
        )(traj_keys, smpl_keys, carry)

    return start, chunk


def _make_evolve(mpo, plan: TrajectoryPlan):
    cfg = plan.evolution
    if plan.evolution_mode == "bug":
        return lambda t, step_dt: bug_step(t, mpo, step_dt, cfg)
    return lambda t, step_dt: tdvp_step(t, mpo, step_dt, cfg)


def _run_order2(traj_key, smpl_key, tensors0, noise, observables, plan, evolve):
    t_total = plan.num_times
    cfg = plan.evolution

    measure_branch, body, fast = _order2_branches(
        smpl_key, traj_key, noise, observables, plan, evolve
    )
    dt = plan.dt

    def restore(psi):
        """Fast mode leaves the measurement state raw; the returned final
        state must honor the canonical-at-0 + normalized contract."""
        if not fast:
            return psi
        out, _ = normalize_canonical(psi, method=cfg.canon_method)
        return out

    obs0 = _evaluate(tensors0, observables)
    diag0 = (
        _diagnostics(tensors0, cfg.threshold)
        if plan.record_diagnostics
        else jnp.zeros((3,), tensors0.real.dtype)
    )

    # F0: dissipate dt/2 + jump
    phi = apply_dissipation(tensors0, noise, dt / 2, cfg)
    phi, _ = stochastic_process(phi, noise, dt, jax.random.fold_in(traj_key, 0), cfg)

    evolved = _renorm_center0(evolve(phi, dt))

    if not plan.sample_timesteps:
        # final-time-only sampling: skip the per-step measurement branch
        # entirely (the reference's analog_tjm_2 likewise only calls sample()
        # at the final step when sample_timesteps is off); the trajectory
        # stream and the final measurement use the same RNG folds as the
        # sampled path, so turning sampling on/off never perturbs physics.
        def body_traj(evolved_prev, j):
            phi_j = apply_dissipation(evolved_prev, noise, dt, cfg)
            phi_j, _ = stochastic_process(
                phi_j, noise, dt, jax.random.fold_in(traj_key, j), cfg
            )
            return _renorm_center0(evolve(phi_j, dt)), None

        if plan.num_steps >= 2:
            evolved, _ = jax.lax.scan(body_traj, evolved, jnp.arange(2, t_total))
        obs_f, diag_f, final_psi = measure_branch(evolved, t_total - 1)
        return obs_f[:, None], diag_f[:, None], restore(final_psi)

    obs1, diag1, psi1 = measure_branch(evolved, 1)

    if plan.num_steps >= 2:
        (_, final_psi), (obs_rest, diag_rest) = jax.lax.scan(
            body, (evolved, psi1), jnp.arange(2, t_total)
        )
        cols = jnp.concatenate([obs0[None], obs1[None], obs_rest], axis=0)  # (T, n_obs)
        diags = jnp.concatenate([diag0[None], diag1[None], diag_rest], axis=0)
    else:
        final_psi = psi1
        cols = jnp.stack([obs0, obs1], axis=0)
        diags = jnp.stack([diag0, diag1], axis=0)

    if plan.sample_timesteps:
        return cols.T, diags.T, restore(final_psi)  # (n_obs, T), (3, T)
    return cols[-1][:, None], diags[-1][:, None], restore(final_psi)


def _run_order1(
    traj_key, tensors0, noise, observables, plan, evolve, sj_flags=None,
    sj_mats=None, sj_two=None,
):
    dt = plan.dt
    t_total = plan.num_times
    cfg = plan.evolution

    def apply_two_site_slots(state, bonds, mats2, active):
        """Sequential merge -> matrix -> truncated split per active slot
        (reference merged-SVD two-site scheduled jump, scheduled_jumps.py:96)."""
        length, d, chi, _ = state.shape

        def slot_body(st, slot):
            bond, m, on = slot

            def do(st):
                theta = merge_two_site(
                    jax.lax.dynamic_index_in_dim(st, bond, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(st, bond + 1, 0, keepdims=False),
                )
                th = (m.astype(st.dtype) @ theta.reshape(d * d, chi * chi)).reshape(
                    d, d, chi, chi
                )
                a, b, _, _ = split_two_site_truncated(
                    th,
                    chi,
                    mode=cfg.trunc_mode,
                    threshold=cfg.threshold,
                    max_bond_dim=cfg.max_bond_dim,
                    min_keep=1,
                    svd_distribution="right",
                )
                st = jax.lax.dynamic_update_index_in_dim(st, a, bond, 0)
                return jax.lax.dynamic_update_index_in_dim(st, b, bond + 1, 0)

            return jax.lax.cond(on, do, lambda s: s, st), None

        state, _ = jax.lax.scan(slot_body, state, (bonds, mats2, active))
        return state

    def apply_scheduled(state, mats, two):
        state = jnp.einsum("iab,iblr->ialr", mats.astype(state.dtype), state)
        if plan.has_scheduled2:
            state = apply_two_site_slots(state, *two)
        state, _ = normalize_canonical(state, method=cfg.canon_method)
        return state

    def body(state, xs):
        j = xs[0] if plan.has_scheduled else xs
        state = evolve(state, dt)
        if plan.has_scheduled:
            if plan.has_scheduled2:
                _, flag, mats, b2, m2, a2 = xs
                two = (b2, m2, a2)
            else:
                _, flag, mats = xs
                two = None
        if noise is not None:
            state = _renorm_center0(state)
            state = apply_dissipation(state, noise, dt, plan.evolution)
            if plan.has_scheduled:
                state = jax.lax.cond(
                    flag,
                    lambda st: apply_scheduled(st, mats, two),
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
            state = jax.lax.cond(
                flag,
                lambda st: apply_scheduled(st, mats, two),
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
    if plan.has_scheduled2:
        xs = (jnp.arange(1, t_total), sj_flags, sj_mats, *sj_two)
    elif plan.has_scheduled:
        xs = (jnp.arange(1, t_total), sj_flags, sj_mats)
    else:
        xs = jnp.arange(1, t_total)
    state, (obs_rest, diag_rest) = jax.lax.scan(body, tensors0, xs)
    cols = jnp.concatenate([obs0[None], obs_rest], axis=0)
    diags = jnp.concatenate([diag0[None], diag_rest], axis=0)
    if plan.sample_timesteps:
        return cols.T, diags.T, state
    return cols[-1][:, None], diags[-1][:, None], state
