"""Dense state-vector Monte Carlo wavefunction (MCWF) backend.

Reference parity: mqt-yaqs analog/mcwf.py — effective Hamiltonian
``H_eff = H - (i/2) sum gamma L^dag L`` with a precomputed dense step
propagator (dim <= 4096 in the reference; here the propagator is always
precomputed host-side since this backend is for small systems), norm-deficit
jump decision, channel choice proportional to ``gamma ||L psi||^2``.

The per-trajectory program is a jitted ``lax.scan``; the ensemble is ``vmap``
over fold_in keys like the TJM.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

__all__ = ["MCWFContext", "make_mcwf_context", "mcwf_trajectory"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MCWFContext:
    """Precomputed dense operators for MCWF stepping.

    ``propagator``: ``exp(-i dt H_eff)`` (D, D); ``jump_ops``: ``(nc, D, D)``
    embedded jump operators (rates *not* folded in); ``gammas``: ``(nc,)``;
    ``obs``: ``(n_obs, D, D)`` observables.
    """

    propagator: object  # host numpy; transferred as a jit argument
    jump_ops: object
    gammas: object
    obs: object


def make_mcwf_context(
    h: np.ndarray,
    jump_ops: list[np.ndarray],
    gammas: list[float],
    observables: list[np.ndarray],
    dt: float,
) -> MCWFContext:
    heff = np.asarray(h, dtype=np.complex128).copy()
    for gamma, jump in zip(gammas, jump_ops):
        heff = heff - 0.5j * gamma * (jump.conj().T @ jump)
    prop = scipy.linalg.expm(-1j * dt * heff)
    dim = h.shape[0]
    jumps = (
        np.stack(jump_ops).astype(np.complex128)
        if jump_ops
        else np.zeros((0, dim, dim), dtype=np.complex128)
    )
    # leaves stay HOST numpy in the platform working precision (the
    # CompiledNoise pattern): eager device transfers of complex128 are
    # unsupported on the c64-only tunneled TPU; jit arguments transfer fine.
    x64 = jax.config.read("jax_enable_x64")
    cdt = np.complex128 if x64 else np.complex64
    rdt = np.float64 if x64 else np.float32
    return MCWFContext(
        propagator=np.asarray(prop, dtype=cdt),
        jump_ops=np.asarray(jumps, dtype=cdt),
        gammas=np.asarray(gammas, dtype=rdt).reshape(-1),
        obs=np.asarray(np.stack(observables), dtype=cdt),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MCWFKrylovContext:
    """Per-step Krylov variant for chains where the dense ``exp(-i dt H_eff)``
    propagator no longer fits (reference MAX_PRECOMPUTE_DIM = 4096,
    analog/mcwf.py:49-51): the effective Hamiltonian and jump operators are
    sparse (BCOO) and each step runs an Arnoldi ``expm``-apply."""

    heff: object  # BCOO (D, D)
    jump_ops: tuple  # tuple of BCOO (D, D)
    obs: tuple  # tuple of BCOO (D, D) observables
    dt: float = dataclasses.field(metadata={"static": True})
    krylov_dim: int = dataclasses.field(metadata={"static": True})


def make_mcwf_krylov_context(
    h_sparse,
    jump_ops_sparse: list,
    observables: list[np.ndarray],
    dt: float,
    krylov_dim: int = 25,
) -> MCWFKrylovContext:
    """Build from scipy CSR operators (jump ops carry sqrt(gamma))."""
    from jax.experimental import sparse as jsparse

    heff = h_sparse.astype(np.complex128).copy()
    for jump in jump_ops_sparse:
        heff = heff - 0.5j * (jump.conj().T @ jump)
    to_bcoo = lambda m: jsparse.BCOO.from_scipy_sparse(m.tocoo())
    import scipy.sparse as sp

    return MCWFKrylovContext(
        heff=to_bcoo(heff),
        jump_ops=tuple(to_bcoo(j) for j in jump_ops_sparse),
        obs=tuple(
            to_bcoo(o if sp.issparse(o) else sp.csr_matrix(o)) for o in observables
        ),
        dt=float(dt),
        krylov_dim=int(krylov_dim),
    )


@partial(jax.jit, static_argnames=("num_steps",))
def mcwf_trajectory_krylov(
    key: jax.Array, psi0: jnp.ndarray, ctx: MCWFKrylovContext, num_steps: int
) -> jnp.ndarray:
    """One MCWF trajectory with per-step Arnoldi propagation (sparse H_eff)."""
    from ..ops.krylov import arnoldi_expm_apply

    def measure(psi):
        n2 = jnp.real(jnp.vdot(psi, psi))
        vals = [jnp.real(jnp.vdot(psi, o @ psi)) for o in ctx.obs]
        return jnp.stack(vals) / n2 if vals else jnp.zeros((0,), n2.dtype)

    has_noise = len(ctx.jump_ops) > 0

    def step(psi, k):
        psi_evolved = arnoldi_expm_apply(
            lambda v: ctx.heff @ v, psi, -1j * ctx.dt, k=ctx.krylov_dim
        )
        n2 = jnp.real(jnp.vdot(psi_evolved, psi_evolved))
        if not has_noise:
            out = psi_evolved / jnp.sqrt(n2)
            return out, measure(out)
        dp = 1.0 - n2
        k1, k2 = jax.random.split(k)
        u = jax.random.uniform(k1, dtype=n2.dtype)

        def no_jump(_):
            return psi_evolved / jnp.sqrt(n2).astype(psi.dtype)

        def do_jump(_):
            lpsi = jnp.stack([j @ psi for j in ctx.jump_ops])
            w = jnp.real(jnp.einsum("ki,ki->k", lpsi.conj(), lpsi))
            idx = jax.random.categorical(k2, jnp.log(jnp.maximum(w, 1e-300)))
            out = lpsi[idx]
            return out / jnp.linalg.norm(out).astype(psi.dtype)

        psi_next = jax.lax.cond(u < dp, do_jump, no_jump, None)
        return psi_next, measure(psi_next)

    vals0 = measure(psi0)
    keys = jax.random.split(key, num_steps)
    _, vals = jax.lax.scan(step, psi0, keys)
    return jnp.concatenate([vals0[None], vals], axis=0).T


@partial(jax.jit, static_argnames=("num_steps",))
def mcwf_trajectory(
    key: jax.Array, psi0: jnp.ndarray, ctx: MCWFContext, num_steps: int
) -> jnp.ndarray:
    """One MCWF trajectory; returns ``(n_obs, num_steps + 1)`` real values."""

    def measure(psi):
        n2 = jnp.real(jnp.vdot(psi, psi))
        return jnp.real(jnp.einsum("i,kij,j->k", psi.conj(), ctx.obs, psi)) / n2

    has_noise = ctx.jump_ops.shape[0] > 0

    def step(psi, k):
        psi_evolved = ctx.propagator @ psi
        n2 = jnp.real(jnp.vdot(psi_evolved, psi_evolved))
        if not has_noise:
            out = psi_evolved / jnp.sqrt(n2)
            return out, measure(out)
        dp = 1.0 - n2
        k1, k2 = jax.random.split(k)
        u = jax.random.uniform(k1, dtype=n2.dtype)

        def no_jump(_):
            return psi_evolved / jnp.sqrt(n2).astype(psi.dtype)

        def do_jump(_):
            lpsi = jnp.einsum("kij,j->ki", ctx.jump_ops, psi)  # pre-step state
            w = ctx.gammas * jnp.real(jnp.einsum("ki,ki->k", lpsi.conj(), lpsi))
            idx = jax.random.categorical(k2, jnp.log(jnp.maximum(w, 1e-300)))
            out = lpsi[idx]
            return out / jnp.linalg.norm(out).astype(psi.dtype)

        psi_next = jax.lax.cond(u < dp, do_jump, no_jump, None)
        return psi_next, measure(psi_next)

    vals0 = measure(psi0)
    keys = jax.random.split(key, num_steps)
    _, vals = jax.lax.scan(step, psi0, keys)
    return jnp.concatenate([vals0[None], vals], axis=0).T
