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

__all__ = [
    "MCWFContext",
    "MCWFLocalContext",
    "make_mcwf_context",
    "make_mcwf_local_context",
    "mcwf_trajectory",
    "mcwf_trajectory_local",
    "mpo_matvec_statevector",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MCWFContext:
    """Precomputed dense operators for MCWF stepping.

    ``propagator``: ``exp(-i dt H_eff)`` (D, D); ``jump_ops``: ``(nc, D, D)``
    embedded jump operators (rates *not* folded in); ``gammas``: ``(nc,)``;
    ``obs``: ``(n_obs, D, D)`` observables.
    """

    propagator: object  # host numpy; closed over as a trace-time constant
    # (run_ensemble jits the closure; complex jit call operands are
    # unimplemented on the tunneled TPU — platform rule 2)
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


@partial(jax.jit, static_argnames=("num_steps", "return_state"))
def mcwf_trajectory_krylov(
    key: jax.Array,
    psi0: jnp.ndarray,
    ctx: MCWFKrylovContext,
    num_steps: int,
    return_state: bool = False,
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
            # relative noise floor: channels whose true weight is ~0 read
            # dtype noise; sampling one divides by a ~0 norm (same guard as
            # methods/stochastic.py stochastic_process)
            w = jnp.where(w > 1e-5 * jnp.sum(w), w, 0.0)
            idx = jax.random.categorical(k2, jnp.log(jnp.maximum(w, 1e-300)))
            out = lpsi[idx]
            nrm = jnp.linalg.norm(out)
            safe = out / jnp.maximum(nrm, 1e-300).astype(psi.dtype)
            # all channels dark (total weight 0): a noise-positive dp must
            # not jump — fall back to the no-jump output
            return jnp.where(jnp.sum(w) > 0, safe, no_jump(None))

        psi_next = jax.lax.cond(u < dp, do_jump, no_jump, None)
        return psi_next, measure(psi_next)

    vals0 = measure(psi0)
    keys = jax.random.split(key, num_steps)
    psi_f, vals = jax.lax.scan(step, psi0, keys)
    out = jnp.concatenate([vals0[None], vals], axis=0).T
    return (out, psi_f) if return_state else out


@dataclasses.dataclass(frozen=True)
class MCWFLocalContext:
    """Large-system MCWF context: Hamiltonian as a padded MPO applied to the
    full statevector by local-term contraction, jump/observable operators as
    products of LOCAL (d, d) factors.

    This is the TPU-native replacement for the reference's sparse per-step
    Krylov path (reference analog/mcwf.py:170-211): sparse complex matvecs
    (BCOO) are UNIMPLEMENTED on the tunneled TPU platform, and embedding
    operators densely is O(4^L) memory — whereas contracting the MPO across
    the reshaped statevector is O(L * d * Dw * 2^L) flops and O(Dw * 2^L)
    transient memory, scaling to any L where the statevector itself fits.

    All leaves are HOST numpy / python ints — the context must be closed over
    at trace time (it is NOT a pytree argument); sites are static.

    Attributes:
        mpo: padded Hamiltonian MPO ``(L, d, d, Dw, Dw)``, boundary index 0.
        channels: per jump channel, a tuple of ``(site, (d,d) matrix)`` local
            factors whose product is ``sqrt(gamma) L``.
        ldl_channels: per channel, the matching ``(site, (A^dag A))`` factors
            of ``gamma L^dag L`` (precomputed).
        obs_rows: per observable row, either ``("terms", ((weight-folded
            factors tuple), ...))`` — a sum of local-factor products — or
            ``("pvm", flat_index)``.
    """

    mpo: object
    channels: tuple
    ldl_channels: tuple
    obs_rows: tuple
    length: int
    d: int
    dt: float
    krylov_dim: int


def _apply_local_sv(psi_t, mat, site, length):
    """Apply a (d, d) operator at chain ``site`` of a statevector reshaped to
    ``(d,)*length`` (site 0 least significant => axis ``length-1-site``)."""
    ax = length - 1 - site
    psi_t = jnp.moveaxis(psi_t, ax, 0)
    psi_t = jnp.einsum("ab,b...->a...", jnp.asarray(mat, dtype=psi_t.dtype), psi_t)
    return jnp.moveaxis(psi_t, 0, ax)


def mpo_matvec_statevector(w, psi_t, length: int):
    """Contract a padded MPO ``(L, d, d, Dw, Dw)`` with a statevector tensor
    ``(d,)*length`` (site 0 least significant), carrying the MPO bond leg
    across sites.  Boundary bonds use index 0 (core/mps_ops convention)."""
    w = jnp.asarray(w)
    x = psi_t[None].astype(w.dtype)  # (Wc=1, s_{L-1}, ..., s_0); w_{-1}=0
    for i in range(length):
        ax = 1 + (length - 1 - i)
        x = jnp.moveaxis(x, ax, 1)  # (Wc, s_i in, rest...)
        wi = w[i]
        if i == 0:
            wi = wi[:, :, :1, :]  # left boundary row
        if i == length - 1:
            wi = wi[:, :, :, :1]  # right boundary column
        x = jnp.einsum("oiLR,Li...->Ro...", wi, x)
        x = jnp.moveaxis(x, 1, ax)
    return x[0]


def make_mcwf_local_context(
    mpo: np.ndarray,
    channels: list[list[tuple[int, np.ndarray]]],
    obs_rows: list,
    dt: float,
    krylov_dim: int = 25,
) -> MCWFLocalContext:
    """Build the local-term context.  ``channels`` items are lists of
    ``(site, matrix)`` factors with ``sqrt(gamma)`` already folded in;
    ``obs_rows`` items are ``("terms", [...])`` or ``("pvm", index)``."""
    x64 = jax.config.read("jax_enable_x64")
    cdt = np.complex128 if x64 else np.complex64
    length = int(mpo.shape[0])
    d = int(mpo.shape[1])
    chans, ldls = [], []
    for factors in channels:
        chans.append(tuple((int(s), np.asarray(m, dtype=cdt)) for s, m in factors))
        ldls.append(
            tuple(
                (int(s), np.asarray(m, dtype=cdt).conj().T @ np.asarray(m, dtype=cdt))
                for s, m in factors
            )
        )
    rows = []
    for kind, payload in obs_rows:
        if kind == "pvm":
            rows.append(("pvm", int(payload)))
        else:
            rows.append(
                (
                    "terms",
                    tuple(
                        tuple((int(s), np.asarray(m, dtype=cdt)) for s, m in term)
                        for term in payload
                    ),
                )
            )
    return MCWFLocalContext(
        mpo=np.asarray(mpo, dtype=cdt),
        channels=tuple(chans),
        ldl_channels=tuple(ldls),
        obs_rows=tuple(rows),
        length=length,
        d=d,
        dt=float(dt),
        krylov_dim=int(krylov_dim),
    )


def mcwf_trajectory_local(
    key: jax.Array,
    psi0: jnp.ndarray,
    ctx: MCWFLocalContext,
    num_steps: int,
    return_state: bool = False,
) -> jnp.ndarray:
    """One MCWF trajectory with the local-term H_eff Arnoldi propagation.

    Must run under jit with ``ctx`` closed over (host-numpy leaves become
    trace-time constants; sites are static python ints — the platform rules
    forbid complex jit call operands on the tunneled TPU).
    Returns ``(n_obs, num_steps + 1)`` real values.
    """
    from ..ops.krylov import arnoldi_expm_apply

    length, d = ctx.length, ctx.d
    shape = (d,) * length

    def heff_mv(v):
        t = v.reshape(shape)
        out = mpo_matvec_statevector(ctx.mpo, t, length)
        for ldl in ctx.ldl_channels:
            tt = t
            for site, m in ldl:
                tt = _apply_local_sv(tt, m, site, length)
            out = out - 0.5j * tt
        return out.reshape(-1)

    def apply_channel(psi, factors):
        t = psi.reshape(shape)
        for site, m in factors:
            t = _apply_local_sv(t, m, site, length)
        return t.reshape(-1)

    def measure(psi):
        n2 = jnp.real(jnp.vdot(psi, psi))
        vals = []
        for kind, payload in ctx.obs_rows:
            if kind == "pvm":
                amp = psi[payload]
                vals.append(jnp.real(amp * jnp.conj(amp)))
            else:
                acc = None
                for term in payload:
                    opsi = apply_channel(psi, term)
                    v = jnp.real(jnp.vdot(psi, opsi))
                    acc = v if acc is None else acc + v
                vals.append(acc)
        if not vals:
            return jnp.zeros((0,), n2.dtype)
        return jnp.stack(vals) / n2

    has_noise = len(ctx.channels) > 0

    def step(psi, k):
        psi_evolved = arnoldi_expm_apply(
            heff_mv, psi, -1j * ctx.dt, k=ctx.krylov_dim
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
            lpsi = jnp.stack([apply_channel(psi, ch) for ch in ctx.channels])
            w = jnp.real(jnp.einsum("ki,ki->k", lpsi.conj(), lpsi))
            # relative noise floor: channels whose true weight is ~0 read
            # dtype noise; sampling one divides by a ~0 norm (same guard as
            # methods/stochastic.py stochastic_process)
            w = jnp.where(w > 1e-5 * jnp.sum(w), w, 0.0)
            idx = jax.random.categorical(k2, jnp.log(jnp.maximum(w, 1e-300)))
            out = lpsi[idx]
            nrm = jnp.linalg.norm(out)
            safe = out / jnp.maximum(nrm, 1e-300).astype(psi.dtype)
            # all channels dark (total weight 0): a noise-positive dp must
            # not jump — fall back to the no-jump output
            return jnp.where(jnp.sum(w) > 0, safe, no_jump(None))

        psi_next = jax.lax.cond(u < dp, do_jump, no_jump, None)
        return psi_next, measure(psi_next)

    vals0 = measure(psi0)
    keys = jax.random.split(key, num_steps)
    psi_f, vals = jax.lax.scan(step, psi0, keys)
    out = jnp.concatenate([vals0[None], vals], axis=0).T
    return (out, psi_f) if return_state else out


@partial(jax.jit, static_argnames=("num_steps", "return_state"))
def mcwf_trajectory(
    key: jax.Array,
    psi0: jnp.ndarray,
    ctx: MCWFContext,
    num_steps: int,
    return_state: bool = False,
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
            # relative noise floor: channels whose true weight is ~0 read
            # dtype noise; sampling one divides by a ~0 norm (same guard as
            # methods/stochastic.py stochastic_process)
            w = jnp.where(w > 1e-5 * jnp.sum(w), w, 0.0)
            idx = jax.random.categorical(k2, jnp.log(jnp.maximum(w, 1e-300)))
            out = lpsi[idx]
            nrm = jnp.linalg.norm(out)
            safe = out / jnp.maximum(nrm, 1e-300).astype(psi.dtype)
            # all channels dark (total weight 0): a noise-positive dp must
            # not jump — fall back to the no-jump output
            return jnp.where(jnp.sum(w) > 0, safe, no_jump(None))

        psi_next = jax.lax.cond(u < dp, do_jump, no_jump, None)
        return psi_next, measure(psi_next)

    vals0 = measure(psi0)
    keys = jax.random.split(key, num_steps)
    psi_f, vals = jax.lax.scan(step, psi0, keys)
    out = jnp.concatenate([vals0[None], vals], axis=0).T
    return (out, psi_f) if return_state else out
