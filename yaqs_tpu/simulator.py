"""Simulator: the main entry point for analog (and digital) runs.

Reference parity: mqt-yaqs simulator.py — dispatch on sim-params type and the
State's representation (``mps`` -> TJM trajectories, ``vector`` -> MCWF,
``density_matrix`` -> exact Lindblad), static-disorder sampling once per run,
observable ordering (site-sorted workers, user-order results), mean-over-
trajectory aggregation.

TPU execution model: one jitted trajectory program, ``vmap`` over fold_in
keys, sharded over the device mesh by the runtime layer — replacing the
reference's process pool.
"""

from __future__ import annotations

import logging
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .analog.embedding import embed_one_site
from .analog.lindblad import (
    noise_model_jump_ops,
    noise_model_jump_ops_sparse,
)
from .analog.mcwf import (
    make_mcwf_context,
    make_mcwf_local_context,
    mcwf_trajectory,
    mcwf_trajectory_local,
)
from .analog.tjm import TrajectoryPlan, sample_key, tjm_trajectory, trajectory_key
from .methods.scheduled_jumps import (
    apply_scheduled_jumps_host,
    compile_scheduled_jumps,
    split_t0_jumps,
)
from .core.hamiltonian import Hamiltonian
from .core.noise_model import NoiseModel, compile_noise, validate_noise_model_for_run
from .core.observables import compile_observables
from .core.result import Result
from .core.sim_params import AnalogSimParams, DigitalSimParams
from .core.state import State
from .methods.tdvp import TDVPConfig
from .utils.host import fetch, to_device
from .parallel.runtime import ExecutionConfig, run_ensemble, tree_digest

__all__ = ["Simulator"]

logger = logging.getLogger(__name__)

_DISORDER_TAG = 7791
_DEFAULT_CHI_CAP = 256
_MCWF_MAX_PRECOMPUTE_DIM = 4096  # reference analog/mcwf.py:49-51


class Simulator:
    """Owns execution configuration; ``run`` executes a simulation."""

    def __init__(
        self,
        *,
        parallel: bool = True,
        batch_size: int | None = None,
        devices=None,
        show_progress: bool = False,
        max_workers: int | None = None,  # accepted for reference API parity
        max_retries: int = 0,
        mp_context: str | None = None,  # accepted for reference API parity
        retry_exceptions: tuple | None = None,  # accepted for reference parity
        matmul_precision: str | None = "highest",
    ) -> None:
        # max_workers / mp_context / retry_exceptions exist in the reference's
        # process-pool runtime (parallel_utils.py:185-259); on the TPU the
        # ensemble is one batched device program, so worker counts and fork
        # semantics have no equivalent — accepted and ignored so call sites
        # port unchanged.  max_retries maps to the chunk re-dispatch budget.
        if max_workers is not None:
            if isinstance(max_workers, bool) or not isinstance(max_workers, (int, np.integer)):
                msg = f"max_workers must be a positive int, got {max_workers!r}"
                raise TypeError(msg)
            if max_workers < 1:
                msg = f"max_workers must be >= 1, got {max_workers}"
                raise ValueError(msg)
        if isinstance(max_retries, bool) or not isinstance(max_retries, (int, np.integer)):
            msg = f"max_retries must be a non-negative int, got {max_retries!r}"
            raise TypeError(msg)
        if max_retries < 0:
            msg = f"max_retries must be >= 0, got {max_retries}"
            raise ValueError(msg)
        del max_workers, mp_context, retry_exceptions
        self._execution = ExecutionConfig(
            parallel=parallel,
            batch_size=batch_size,
            devices=tuple(devices) if devices else None,
            show_progress=show_progress,
            max_retries=max_retries,
        )
        # TPU matmuls default to bf16-multiply passes, which degrades complex64
        # sweeps from a ~1e-4 observable floor to ~1e-1 over 5 sweeps (measured
        # on 100-site TFIM); "highest" restores full f32 products.  None keeps
        # the platform default.
        self._matmul_precision = matmul_precision

    @property
    def execution(self) -> ExecutionConfig:
        return self._execution

    # ------------------------------------------------------------------
    def run(
        self,
        initial_state: State,
        operator,
        sim_params,
        noise_model: NoiseModel | None = None,
    ) -> Result:
        """Run a simulation and return an aggregated :class:`Result`."""
        import contextlib

        import jax

        t_start = time.perf_counter()
        prec_ctx = (
            jax.default_matmul_precision(self._matmul_precision)
            if self._matmul_precision is not None
            else contextlib.nullcontext()
        )
        with prec_ctx:
            if isinstance(initial_state, (list, tuple)):
                if not all(isinstance(s, State) for s in initial_state):
                    msg = "initial_state list must contain only State objects"
                    raise TypeError(msg)
                if isinstance(sim_params, DigitalSimParams):
                    msg = "Circuit simulation requires a single State initial_state"
                    raise TypeError(msg)
                if not isinstance(sim_params, AnalogSimParams):
                    msg = "ensemble (list-of-State) runs require AnalogSimParams"
                    raise TypeError(msg)
                if noise_model is not None:
                    # reference contract: list[State] runs must be noiseless —
                    # zero-strength processes are tolerated, scheduled_jumps
                    # and positive strengths are rejected (simulator.py:1075)
                    if getattr(noise_model, "scheduled_jumps", None):
                        msg = (
                            "scheduled_jumps are not supported for unitary "
                            "ensemble (list-of-State) runs"
                        )
                        raise ValueError(msg)
                    if any(
                        isinstance(p["strength"], dict)
                        or float(p["strength"]) > 0.0
                        for p in getattr(noise_model, "processes", [])
                    ):
                        msg = (
                            "unitary ensemble (list-of-State) runs are "
                            "noiseless; pass noise_model=None or zero-strength "
                            "processes (reference simulator.py list-initial-"
                            "state contract)"
                        )
                        raise ValueError(msg)
                result = self._run_ensemble(list(initial_state), operator, sim_params)
            elif isinstance(sim_params, AnalogSimParams):
                result = self._run_analog(
                    initial_state, operator, sim_params, noise_model
                )
            elif isinstance(sim_params, DigitalSimParams):
                result = self._run_digital(
                    initial_state, operator, sim_params, noise_model
                )
            else:
                msg = f"Unsupported sim_params type: {type(sim_params).__name__}"
                raise TypeError(msg)
        result.elapsed_wall_time = time.perf_counter() - t_start
        return result

    # ------------------------------------------------------------------
    def _sample_noise(self, noise_model, sim_params):
        if noise_model is None:
            return None
        if noise_model.has_distributions:
            seed = sim_params.random_seed
            rng = np.random.default_rng(
                [seed, _DISORDER_TAG] if seed is not None else None
            )
            return noise_model.sample(rng)
        return noise_model

    def _resolve_chi(self, sim_params, length, d) -> int:
        chi = sim_params.max_bond_dim
        if chi is None:
            chi = min(d ** (length // 2), _DEFAULT_CHI_CAP)
            warnings.warn(
                f"max_bond_dim=None resolved to padded bond dimension {chi} "
                "(fixed shapes are required on TPU)",
                RuntimeWarning,
                stacklevel=3,
            )
        return max(int(chi), 2)

    @staticmethod
    def _sparse_observables(sim_params, length, d):
        """Sparse embedded observables for the large-chain MCWF path."""
        import scipy.sparse as sp

        from .analog.lindblad import _embed_one_site_sparse

        out = []
        for obs in sim_params.sorted_observables:
            sites = obs.site_list
            if obs.name == "pvm":
                idx = sum(int(b) * d**i for i, b in enumerate(obs.bitstring))
                proj = sp.csr_matrix(
                    ([1.0], ([idx], [idx])), shape=(d**length, d**length), dtype=complex
                )
                out.append(proj)
            elif obs.name in {"entropy", "schmidt_spectrum"}:
                msg = "entropy observables require the MPS representation"
                raise NotImplementedError(msg)
            elif len(sites) == 1:
                out.append(_embed_one_site_sparse(obs.matrix, sites[0], length, d))
            else:
                from .core.observables import product_terms

                acc = None
                for factors in product_terms(obs.matrix, sites, d):
                    term = None
                    for s, m in factors:
                        emb = _embed_one_site_sparse(m, s, length, d)
                        term = emb if term is None else term @ emb
                    acc = term if acc is None else acc + term
                out.append(acc)
        return out

    @staticmethod
    def _local_jump_channels(noise_model):
        """Jump channels as lists of local ``(site, matrix)`` factors with
        ``sqrt(gamma)`` folded in (large-system MCWF path)."""
        channels = []
        if noise_model is None:
            return channels
        for proc in noise_model.processes:
            gamma = float(proc["strength"])
            if gamma == 0.0:
                continue
            sites = proc["sites"]
            root = np.sqrt(gamma)
            if len(sites) == 1:
                channels.append([(sites[0], root * np.asarray(proc["matrix"]))])
            elif "factors" in proc:
                f0, f1 = proc["factors"]
                channels.append(
                    [(sites[0], root * np.asarray(f0)), (sites[1], np.asarray(f1))]
                )
            else:
                # adjacent matrix process: product-form (operator-Schmidt
                # rank 1, e.g. any crosstalk kron) maps onto local factors;
                # genuine sum-of-products jump operators are out of scope for
                # the local-factor MCWF path.
                from .analog.embedding import operator_schmidt_factors

                terms = operator_schmidt_factors(proc["matrix"])
                if len(terms) != 1:
                    msg = (
                        "adjacent two-site matrix processes with operator-"
                        "Schmidt rank > 1 are not supported on the large-"
                        "system MCWF path (use the mps representation)"
                    )
                    raise NotImplementedError(msg)
                a_k, b_k = terms[0]
                channels.append(
                    [(sites[0], root * a_k), (sites[1], b_k)]
                )
        return channels

    @staticmethod
    def _local_obs_rows(sim_params, d):
        """Observables as sums of local-factor products (large-system MCWF):
        ``("terms", [[(site, mat), ...], ...])`` rows or ``("pvm", index)``."""
        rows = []
        for obs in sim_params.sorted_observables:
            sites = obs.site_list
            if obs.name == "pvm":
                idx = sum(int(b) * d**i for i, b in enumerate(obs.bitstring))
                rows.append(("pvm", idx))
            elif obs.name in {"entropy", "schmidt_spectrum"}:
                msg = "entropy observables require the MPS representation"
                raise NotImplementedError(msg)
            elif len(sites) == 1:
                rows.append(("terms", [[(sites[0], np.asarray(obs.matrix))]]))
            else:
                from .core.observables import product_terms

                rows.append(("terms", product_terms(obs.matrix, sites, d)))
        return rows

    @staticmethod
    def _dense_observables(sim_params, length, d):
        """Dense embedded matrices for the sorted observables (small-system
        backends); supports one-site, two-site, and PVM rows."""
        from .analog.embedding import embed_operator

        out = []
        for obs in sim_params.sorted_observables:
            sites = obs.site_list
            if obs.name == "pvm":
                dim = d**length
                idx = sum(int(b) * d**i for i, b in enumerate(obs.bitstring))
                proj = np.zeros((dim, dim), dtype=np.complex128)
                proj[idx, idx] = 1.0
                out.append(proj)
            elif obs.name in {"entropy", "schmidt_spectrum"}:
                msg = "entropy observables require the MPS representation"
                raise NotImplementedError(msg)
            elif len(sites) == 1:
                out.append(embed_one_site(obs.matrix, sites[0], length, d))
            else:
                from .core.observables import product_terms

                dense = np.zeros((d**length, d**length), dtype=np.complex128)
                for factors in product_terms(obs.matrix, sites, d):
                    dense += embed_operator(dict(factors), length, d)
                out.append(dense)
        return out

    @staticmethod
    def _user_order(sim_params, sorted_rows: np.ndarray) -> np.ndarray:
        idx = sim_params.observable_sorted_indices
        if not idx:
            return sorted_rows
        return sorted_rows[..., list(idx), :]

    # ------------------------------------------------------------------
    def _run_analog(self, initial_state, operator, sim_params, noise_model) -> Result:
        if not isinstance(initial_state, State):
            msg = "initial_state must be a State"
            raise TypeError(msg)
        if not sim_params.observables and not sim_params.get_state:
            msg = (
                "No output specified: either observables or get_state must "
                "be set."
            )
            raise ValueError(msg)
        if isinstance(operator, Hamiltonian):
            ham = operator
        elif isinstance(operator, np.ndarray) and operator.ndim == 5:
            ham = Hamiltonian.from_mpo(operator)
        else:
            msg = "operator must be a Hamiltonian or a padded MPO array"
            raise TypeError(msg)

        sampled_noise = self._sample_noise(noise_model, sim_params)
        validate_noise_model_for_run(sampled_noise, initial_state.length, initial_state.d)
        rep = initial_state.representation
        if rep == "mps":
            result = self._run_analog_tjm(initial_state, ham, sim_params, sampled_noise)
        elif rep == "vector":
            result = self._run_analog_mcwf(initial_state, ham, sim_params, sampled_noise)
        elif rep == "density_matrix":
            result = self._run_analog_lindblad(initial_state, ham, sim_params, sampled_noise)
        else:  # pragma: no cover
            msg = f"Unknown representation {rep!r}"
            raise ValueError(msg)
        result.noise_model = sampled_noise
        return result

    def _run_analog_tjm(self, initial_state, ham, sim_params, noise) -> Result:
        length = initial_state.length
        d = max(initial_state.d, ham.d)
        chi = self._resolve_chi(sim_params, length, d)
        # Operands stay host-side numpy: complex device arrays cannot be
        # embedded as jit constants on the tunneled TPU platform (see
        # yaqs_tpu.utils.host). They are converted at trace time.
        mpo = np.asarray(ham.ensure_mpo())
        tensors0 = np.asarray(initial_state.to_padded_mps(chi))
        compiled = compile_noise(noise, length, d) if noise is not None else None

        observables = compile_observables(sim_params.sorted_observables, length, d)

        scheduled = None
        if noise is not None and noise.scheduled_jumps:
            if sim_params.order != 1:
                msg = "scheduled jumps are supported for analog TJM order=1 only"
                raise ValueError(msg)
            # jumps at times[0] apply before the initial sample (reference
            # analog_tjm.py:281-283) — deterministic, host-side, shared by
            # every trajectory
            t0_jumps, later_jumps = split_t0_jumps(
                noise.scheduled_jumps, sim_params.times
            )
            if t0_jumps:
                tensors0 = apply_scheduled_jumps_host(
                    tensors0, t0_jumps, threshold=sim_params.svd_threshold
                )
            if later_jumps:
                scheduled = compile_scheduled_jumps(
                    later_jumps, sim_params.times, length, d
                )
        sj_flags, sj_mats, sj_two = (
            scheduled if scheduled is not None else (None, None, None)
        )

        plan = TrajectoryPlan(
            dt=sim_params.dt,
            num_steps=sim_params.num_steps,
            order=sim_params.order,
            sample_timesteps=sim_params.sample_timesteps,
            evolution_mode=getattr(sim_params, "evolution_mode", "tdvp"),
            has_scheduled=scheduled is not None,
            has_scheduled2=sj_two is not None,
            record_diagnostics=True,
            evolution=TDVPConfig(
                krylov_dim=sim_params.krylov_dim,
                trunc_mode=sim_params.trunc_mode,
                threshold=sim_params.svd_threshold,
                max_bond_dim=chi,
                mode=sim_params.tdvp_mode,
                sweeps=sim_params.tdvp_sweeps,
                **sim_params.fast_path_kwargs(),
            ),
        )

        stochastic_run = compiled is not None
        num_traj = sim_params.num_traj if stochastic_run else 1
        seed = sim_params.random_seed if sim_params.random_seed is not None else 0
        base_key = jax.random.PRNGKey(seed)

        def traj_obs(tk, sk):
            res, diag, _ = tjm_trajectory(
                tk, sk, tensors0, mpo, compiled, observables, plan,
                sj_flags, sj_mats, sj_two,
            )
            return jnp.concatenate([res, diag.astype(res.dtype)], axis=0)

        stacked = run_ensemble(
            traj_obs,
            num_traj,
            base_key,
            (trajectory_key, sample_key),
            self._execution,
            program_key=(
                "tjm",
                tree_digest(
                    (tensors0, mpo, compiled, observables, sj_flags, sj_mats, sj_two)
                ),
                plan,
            ),
        )  # (n_traj, n_obs_sorted [+ ns*chi spectra] + 3, T)
        per_traj = stacked[:, :-3, :]
        diag_traj = stacked[:, -3:, :]
        diag_mean = diag_traj.mean(axis=0)

        # Schmidt-spectrum observables ride as chi extra rows per observable
        # appended after the scalar rows (core/observables.py); split them
        # back out into per-user-observable (n_traj, chi, T) arrays
        schmidt_spectra = None
        n_scalar = observables.num_rows
        ns = int(observables.s_bonds.shape[0])
        if ns:
            tail = per_traj[:, n_scalar:, :]
            chi_rows = tail.shape[1] // ns
            sp = np.asarray(tail).reshape(tail.shape[0], ns, chi_rows, tail.shape[-1])
            per_traj = per_traj[:, :n_scalar, :]
            idx = list(sim_params.observable_sorted_indices) or list(range(n_scalar))
            schmidt_spectra = {
                idx.index(int(sorted_row)): sp[:, j]
                for j, sorted_row in enumerate(observables.s_rows)
            }
        mean_sorted = per_traj.mean(axis=0)

        output_state = None
        if sim_params.get_state:
            _, _, final = tjm_trajectory(
                trajectory_key(base_key, 0),
                sample_key(base_key, 0),
                tensors0,
                mpo,
                compiled,
                observables,
                plan,
                sj_flags,
                sj_mats,
                sj_two,
            )
            # reference contract (simulator.py:327): get_state stores a State
            # wrapping the final (padded) MPS tensors of trajectory 0
            output_state = State(
                length=length,
                tensors=fetch(final),
                physical_dimensions=initial_state.physical_dimensions,
            )

        return Result(
            observables=list(sim_params.observables),
            expectation_values=self._user_order(sim_params, mean_sorted),
            trajectories=self._user_order(sim_params, per_traj),
            times=sim_params.times if sim_params.sample_timesteps else sim_params.times[-1:],
            num_trajectories=num_traj,
            output_state=output_state,
            runtime_cost=diag_mean[0],
            max_bond=diag_mean[1],
            total_bond=diag_mean[2],
            schmidt_spectra=schmidt_spectra,
        )

    @staticmethod
    def _reject_scheduled_jumps(noise, backend: str) -> None:
        if noise is not None and getattr(noise, "scheduled_jumps", None):
            msg = (
                f"scheduled_jumps are supported only for analog MPS TJM "
                f"(order=1) runs, not the {backend} backend (reference "
                f"simulator scheduled-jump contract)"
            )
            raise ValueError(msg)

    def _run_analog_mcwf(self, initial_state, ham, sim_params, noise) -> Result:
        self._reject_scheduled_jumps(noise, "MCWF state-vector")
        length = initial_state.length
        d = initial_state.d
        dim = d**length
        psi0 = initial_state.to_vector()
        if dim > _MCWF_MAX_PRECOMPUTE_DIM:
            # dense exp(-i dt H_eff) no longer fits: per-step Arnoldi with the
            # Hamiltonian applied as an MPO over the reshaped statevector and
            # local jump/observable factors (reference cutoff analog/
            # mcwf.py:49-51; sparse BCOO matvecs are UNIMPLEMENTED on the
            # tunneled TPU, so the local-term path replaces the reference's
            # scipy-sparse Krylov loop)
            channels = self._local_jump_channels(noise)
            obs_rows = self._local_obs_rows(sim_params, d)
            have_obs = bool(obs_rows)
            ctx = make_mcwf_local_context(
                ham.ensure_mpo(),
                channels,
                obs_rows,
                sim_params.dt,
                krylov_dim=min(25, dim),
            )
            have_noise = bool(channels)

            def traj_obs(tk, sk):
                del sk
                return mcwf_trajectory_local(
                    tk, jnp.asarray(psi0), ctx, sim_params.num_steps
                )
        else:
            h = ham.ensure_matrix()
            obs_dense = self._dense_observables(sim_params, length, d)
            have_obs = bool(obs_dense)
            # embedded operators already carry sqrt(gamma); unit rates then
            # give the correct H_eff and jump weights
            jumps = noise_model_jump_ops(noise, length, d)
            ctx = make_mcwf_context(
                h,
                jumps,
                [1.0] * len(jumps),
                obs_dense if have_obs else [np.eye(dim)],
                sim_params.dt,
            )
            have_noise = bool(jumps)

            def traj_obs(tk, sk):
                del sk
                return mcwf_trajectory(tk, jnp.asarray(psi0), ctx, sim_params.num_steps)

        num_traj = sim_params.num_traj if have_noise else 1
        seed = sim_params.random_seed if sim_params.random_seed is not None else 0
        base_key = jax.random.PRNGKey(seed)

        per_traj = run_ensemble(
            traj_obs, num_traj, base_key, (trajectory_key, sample_key), self._execution
        )
        if not have_obs:
            per_traj = per_traj[:, :0, :]
        mean_sorted = per_traj.mean(axis=0)
        if not sim_params.sample_timesteps:
            mean_sorted = mean_sorted[:, -1:]
            per_traj = per_traj[:, :, -1:]

        output_state = None
        if sim_params.get_state:
            # final state vector of trajectory 0 (reference mcwf.py:279 +
            # simulator.py:351: get_state stores a vector-representation State)
            import functools

            tk = trajectory_key(base_key, 0)
            if dim > _MCWF_MAX_PRECOMPUTE_DIM:
                run_final = jax.jit(
                    functools.partial(
                        mcwf_trajectory_local,
                        ctx=ctx,
                        num_steps=sim_params.num_steps,
                        return_state=True,
                    )
                )
                _, psi_f = run_final(tk, jnp.asarray(psi0))
            else:
                _, psi_f = mcwf_trajectory(
                    tk,
                    jnp.asarray(psi0),
                    ctx,
                    sim_params.num_steps,
                    return_state=True,
                )
            output_state = State(
                length=length,
                vector=fetch(psi_f),
                physical_dimensions=initial_state.physical_dimensions,
            )

        return Result(
            observables=list(sim_params.observables),
            expectation_values=self._user_order(sim_params, mean_sorted),
            trajectories=self._user_order(sim_params, per_traj),
            times=sim_params.times if sim_params.sample_timesteps else sim_params.times[-1:],
            num_trajectories=num_traj,
            output_state=output_state,
        )

    def _run_analog_lindblad(self, initial_state, ham, sim_params, noise) -> Result:
        from .analog.lindblad import (
            MAX_PROPAGATOR_VEC_DIM,
            RECOMMENDED_MAX_QUBITS,
            build_liouvillian,
            build_liouvillian_sparse,
            lindblad_rk4_expectations,
        )

        self._reject_scheduled_jumps(noise, "Lindblad density-matrix")
        length = initial_state.length
        d = initial_state.d
        dim = d**length
        rho0 = initial_state.to_density_matrix()
        if length > RECOMMENDED_MAX_QUBITS:
            warnings.warn(
                f"Density-matrix evolution is exponential in system size; "
                f"N={length} exceeds the recommended maximum of "
                f"{RECOMMENDED_MAX_QUBITS} (reference lindblad.py:96-99)",
                RuntimeWarning,
                stacklevel=3,
            )
        rho_final = None
        if dim * dim > MAX_PROPAGATOR_VEC_DIM:
            # vec(rho) too large for the dense expm(L dt) propagator: sparse
            # fixed-grid RK4 ODE path (reference lindblad.py:343-375)
            obs_sparse = self._sparse_observables(sim_params, length, d)
            jumps_sp = noise_model_jump_ops_sparse(noise, length, d)
            liou = build_liouvillian_sparse(ham.ensure_sparse(), jumps_sp)
            if sim_params.get_state:
                vals, vec_f = lindblad_rk4_expectations(
                    liou,
                    rho0.reshape(-1),
                    obs_sparse,
                    sim_params.dt,
                    sim_params.num_steps,
                    return_final=True,
                )
                rho_final = np.asarray(vec_f).reshape(dim, dim)
            else:
                vals = lindblad_rk4_expectations(
                    liou,
                    rho0.reshape(-1),
                    obs_sparse,
                    sim_params.dt,
                    sim_params.num_steps,
                )
        else:
            import scipy.linalg

            h = ham.ensure_matrix()
            obs_dense = self._dense_observables(sim_params, length, d)
            jumps = noise_model_jump_ops(noise, length, d)
            liou = build_liouvillian(h, jumps)
            prop = scipy.linalg.expm(liou * sim_params.dt)
            vec = rho0.reshape(-1)
            cols = []
            for j in range(sim_params.num_steps + 1):
                if j > 0:
                    vec = prop @ vec
                rho = vec.reshape(dim, dim)
                cols.append([np.real(np.trace(o @ rho)) for o in obs_dense])
            vals = np.asarray(cols).T  # (n_obs, T)
            if sim_params.get_state:
                rho_final = vec.reshape(dim, dim)
        if not sim_params.sample_timesteps:
            vals = vals[:, -1:]

        output_state = None
        if rho_final is not None:
            # reference contract (simulator.py:361-370): store the final
            # density matrix as a State with the lattice metadata preserved
            tr = np.trace(rho_final)
            output_state = State(
                length=length,
                density_matrix=rho_final / tr,
                physical_dimensions=initial_state.physical_dimensions,
            )
        return Result(
            observables=list(sim_params.observables),
            expectation_values=self._user_order(sim_params, vals),
            trajectories=self._user_order(sim_params, vals[None]),
            times=sim_params.times if sim_params.sample_timesteps else sim_params.times[-1:],
            num_trajectories=1,
            output_state=output_state,
        )

    # ------------------------------------------------------------------
    def _run_ensemble(self, states, operator, sim_params) -> Result:
        """Deterministic unitary ensemble (list of States), optionally with
        multi-time correlators (reference _run_ensemble, simulator.py:1049)."""
        from .analog.ensemble import ensemble_trajectory, prepare_phi
        from .analog.tjm import TrajectoryPlan

        if not states:
            msg = "ensemble run requires at least one State"
            raise ValueError(msg)
        for s in states:
            if getattr(s, "representation", "mps") != "mps":
                msg = (
                    f"ensemble members must use the 'mps' representation, got "
                    f"{s.representation!r}"
                )
                raise ValueError(msg)
            if s.length != states[0].length:
                msg = (
                    f"ensemble members must share one length; got "
                    f"{s.length} vs {states[0].length}"
                )
                raise ValueError(msg)
        if sim_params.get_state:
            msg = "get_state is not supported for ensemble (list-of-State) runs"
            raise ValueError(msg)
        ham = operator if isinstance(operator, Hamiltonian) else Hamiltonian.from_mpo(operator)
        length = states[0].length
        d = max(max(s.d for s in states), ham.d)
        chi = self._resolve_chi(sim_params, length, d)
        mpo = np.asarray(ham.ensure_mpo())
        observables = compile_observables(sim_params.sorted_observables, length, d)

        mt_pairs = sim_params.multi_time_observables or []
        mt_a_terms, mt_a_sites, mt_b = [], [], []
        for a_obs, b_obs in mt_pairs:
            if len(b_obs.site_list) > 2:
                msg = (
                    "multi-time B observables support one or two sites "
                    "(reference apply_local conventions, mps.py:1045-1155)"
                )
                raise NotImplementedError(msg)
            a_sites = [int(s) for s in a_obs.site_list]
            a_mat = np.asarray(a_obs.matrix, dtype=np.complex128)
            if len(a_sites) == 1:
                terms = [[(a_sites[0], a_mat)]]
            else:
                # k-site A via operator-Schmidt product terms (each term is a
                # product of one-site factors — evaluable gauge-free in the
                # mixed transfer contraction, ensemble.mixed_terms_expectation)
                from .core.observables import product_terms

                terms = product_terms(a_mat, a_sites, d)
            mt_a_terms.append(terms)
            mt_a_sites.append(sorted(a_sites))
            mt_b.append((b_obs.matrix, [int(s) for s in b_obs.site_list]))
        n_pairs = len(mt_pairs)
        # pad to shared (K, S) slots: identity factors at site 0 fill unused
        # site slots; all-zero factor rows fill unused terms (contribute 0)
        max_k = max((len(t) for t in mt_a_terms), default=1)
        max_s = max((len(s) for s in mt_a_sites), default=1)
        mt_a_terms_arr = np.zeros((n_pairs, max_k, max_s, d, d), dtype=np.complex128)
        mt_a_sites_arr = np.zeros((n_pairs, max_s), dtype=np.int32)
        eye_d = np.eye(d, dtype=np.complex128)
        for p, (terms, sites) in enumerate(zip(mt_a_terms, mt_a_sites)):
            mt_a_sites_arr[p, : len(sites)] = sites
            for k_i, factors in enumerate(terms):
                mt_a_terms_arr[p, k_i, :, :, :] = eye_d
                site_slot = {s: j for j, s in enumerate(sites)}
                for f_site, f_mat in factors:
                    mt_a_terms_arr[p, k_i, site_slot[f_site]] = f_mat

        plan = TrajectoryPlan(
            dt=sim_params.dt,
            num_steps=sim_params.num_steps,
            sample_timesteps=True,
            evolution_mode=getattr(sim_params, "evolution_mode", "tdvp"),
            evolution=TDVPConfig(
                krylov_dim=sim_params.krylov_dim,
                trunc_mode=sim_params.trunc_mode,
                threshold=sim_params.svd_threshold,
                max_bond_dim=chi,
                mode=sim_params.tdvp_mode,
                sweeps=sim_params.tdvp_sweeps,
                **sim_params.fast_path_kwargs(),
            ),
        )

        members = np.stack([s.to_padded_mps(chi) for s in states])
        # jit + real/imag fetch: eager complex compute and complex
        # device->host transfer are both unsupported on the tunneled TPU
        prepare_phi_j = jax.jit(prepare_phi)
        # traced once per run (chi is fixed); creating the jit inside
        # _make_phi would discard its cache and retrace per member x pair
        from .core import mps_ops as _mps_ops

        squeeze_j = jax.jit(
            lambda t: (
                _mps_ops.compress(t, threshold=0.0, max_bond_dim=chi, chi_out=chi),
                _mps_ops.norm_squared(t),
            )
        )
        norm2_j = jax.jit(_mps_ops.norm_squared)

        def _make_phi(member: np.ndarray, b_mat, b_sites: list[int]) -> np.ndarray:
            if len(b_sites) == 1:
                return fetch(
                    prepare_phi_j(
                        to_device(member),
                        to_device(np.asarray(b_mat, dtype=np.complex128)),
                        b_sites[0],
                    )
                )
            # two-site B: exact host-side application, then compress back to
            # the run's padded chi (reference ensemble applies B via
            # apply_local, ensemble.py:85-99, with no bond cap; here phi is
            # capped at the run chi, so warn if the cap discards weight)
            from .core.mps import MPS as _MPS

            m = _MPS(tensors=np.array(member, copy=True))
            m.apply_local(np.asarray(b_mat, dtype=np.complex128), tuple(b_sites))
            phi, before2 = squeeze_j(to_device(np.asarray(m.tensors)))
            kept = float(fetch(norm2_j(phi)).real) / max(float(fetch(before2).real), 1e-300)
            if kept < 1.0 - 1e-9:
                logger.warning(
                    "two-site B|psi> exceeded the run bond dimension chi=%d; "
                    "compressing discarded %.3e of the correlator weight "
                    "(raise max_bond_dim to keep B exact)",
                    chi,
                    1.0 - kept,
                )
            return fetch(phi)

        phis = []
        for member in members:
            member_phis = [
                _make_phi(member, b_mat, b_sites) for b_mat, b_sites in mt_b
            ]
            phis.append(
                np.stack(member_phis)
                if member_phis
                else np.zeros((0,) + member.shape, dtype=member.dtype)
            )
        phis = np.stack(phis)

        run = jax.jit(
            jax.vmap(
                lambda t0, ph: ensemble_trajectory(
                    t0,
                    mpo,
                    observables,
                    mt_a_terms_arr,
                    mt_a_sites_arr,
                    ph,
                    plan,
                )
            ),
            static_argnames=(),
        )
        obs_b, corr_b = run(to_device(members), to_device(phis))
        per_traj = np.asarray(obs_b)
        schmidt_spectra = None
        ns = int(observables.s_bonds.shape[0])
        if ns:
            n_scalar = observables.num_rows
            tail = per_traj[:, n_scalar:, :]
            sp = tail.reshape(tail.shape[0], ns, tail.shape[1] // ns, tail.shape[-1])
            per_traj = per_traj[:, :n_scalar, :]
            oidx = list(sim_params.observable_sorted_indices)
            schmidt_spectra = {
                oidx.index(int(r)): sp[:, j]
                for j, r in enumerate(observables.s_rows)
            }
        obs_mean = per_traj.mean(axis=0)
        corr_mean = fetch(corr_b).mean(axis=0) if n_pairs else None
        if not sim_params.sample_timesteps:
            # reference contract: record the final grid point only (ensemble
            # worker num_cols=1, reference analog/ensemble.py:88)
            obs_mean = obs_mean[:, -1:]
            per_traj = per_traj[:, :, -1:]
            if corr_mean is not None:
                corr_mean = corr_mean[:, -1:]
            if schmidt_spectra is not None:
                schmidt_spectra = {
                    k: v[..., -1:] for k, v in schmidt_spectra.items()
                }
        times = (
            sim_params.times if sim_params.sample_timesteps else sim_params.times[-1:]
        )
        return Result(
            observables=list(sim_params.observables),
            expectation_values=self._user_order(sim_params, obs_mean),
            trajectories=self._user_order(sim_params, per_traj),
            times=times,
            num_trajectories=len(states),
            multi_time_correlators=corr_mean,
            schmidt_spectra=schmidt_spectra,
        )

    # ------------------------------------------------------------------
    def _run_digital(self, initial_state, circuit, sim_params, noise_model) -> Result:
        from .digital.engine import run_digital  # deferred: heavy module

        if not isinstance(initial_state, State):
            msg = "Circuit simulation requires a State initial_state"
            raise TypeError(msg)
        return run_digital(self, initial_state, circuit, sim_params, noise_model)
