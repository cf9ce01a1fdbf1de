"""Functional MPS kernels on fixed-shape padded arrays.

TPU-native representation: an MPS over ``L`` sites with uniform (padded)
physical dimension ``d`` and padded bond dimension ``chi`` is a single array

    ``tensors: (L, d, chi, chi)`` complex, index order ``(sigma, left, right)``

Bond dimensions smaller than ``chi`` (including the dangling boundary bonds,
which are dimension 1) are represented by zero padding: the boundary bonds use
index 0 only.  Every chain contraction starts from a boundary, so stray
orthonormal completions introduced by QR/SVD in padded directions never
contribute (they are annihilated by the zero rows of the factors carried along
the chain).

Gauge discipline replaces the reference's mutable ``orthogonality_center``
bookkeeping (mqt-yaqs core/data_structures/mps.py:303-393): every routine here
documents the canonical form it expects/produces.  "Canonical at 0" means
``tensors[1:]`` are right-orthonormal (B tensors) and ``tensors[0]`` carries
the norm and phase.

All functions are jit- and vmap-compatible (batch over a leading trajectory
axis via ``jax.vmap``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "product_state_tensors",
    "transfer_right",
    "norm_squared",
    "scalar_product",
    "canonicalize_right",
    "zero_boundary_pads",
    "shift_center_right",
    "normalize_canonical",
    "left_gram_environments",
    "right_gram_environments",
    "site_moment_matrices",
    "site_expectation",
    "site_expectations",
    "all_site_expectations",
    "apply_one_site_operator",
    "apply_operator_everywhere",
    "to_statevector",
    "bond_spectra",
    "bond_entropies",
]

# ---------------------------------------------------------------------------
# Construction (host-side helpers; return numpy for cheap staging)
# ---------------------------------------------------------------------------

_LOCAL_STATES = {
    "zeros": np.array([1.0, 0.0]),
    "ones": np.array([0.0, 1.0]),
    "x+": np.array([1.0, 1.0]) / np.sqrt(2),
    "x-": np.array([1.0, -1.0]) / np.sqrt(2),
    "y+": np.array([1.0, 1.0j]) / np.sqrt(2),
    "y-": np.array([1.0, -1.0j]) / np.sqrt(2),
}


def product_state_tensors(
    local_states: list[np.ndarray] | np.ndarray,
    chi: int,
    d: int | None = None,
    dtype=np.complex128,
) -> np.ndarray:
    """Build padded product-state tensors from per-site local vectors.

    Args:
        local_states: Sequence of length-``d_i`` state vectors (normalized by
            the caller or not; no normalization is applied here).
        chi: Padded bond dimension.
        d: Padded physical dimension (defaults to the max local dimension).

    Returns:
        numpy array ``(L, d, chi, chi)`` with only ``[:, :, 0, 0]`` populated.
    """
    locals_ = [np.asarray(v, dtype=dtype).reshape(-1) for v in local_states]
    length = len(locals_)
    if d is None:
        d = max(v.shape[0] for v in locals_)
    out = np.zeros((length, d, chi, chi), dtype=dtype)
    for i, v in enumerate(locals_):
        out[i, : v.shape[0], 0, 0] = v
    return out


def named_product_state(
    name: str,
    length: int,
    chi: int,
    d: int = 2,
    dtype=np.complex128,
    basis_string: str | None = None,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Preset states matching the reference naming
    (mqt-yaqs core/data_structures/mps.py:170-281): zeros, ones, x+/-, y+/-,
    Neel (alternating 01), wall (half 0 half 1), basis (computational string),
    random (random product), haar-random (entangled Haar isometries).
    """
    if name in _LOCAL_STATES:
        vecs = [_LOCAL_STATES[name]] * length
    elif name == "Neel":
        vecs = [_LOCAL_STATES["zeros" if i % 2 == 0 else "ones"] for i in range(length)]
    elif name == "wall":
        vecs = [_LOCAL_STATES["zeros" if i < length // 2 else "ones"] for i in range(length)]
    elif name == "basis":
        if basis_string is None or len(basis_string) != length:
            msg = "state='basis' requires a basis_string of chain length"
            raise ValueError(msg)
        vecs = []
        for ch in basis_string:
            v = np.zeros(d, dtype=dtype)
            v[int(ch)] = 1.0
            vecs.append(v)
    elif name == "random":
        rng = rng or np.random.default_rng()
        vs = rng.normal(size=(length, d)) + 1j * rng.normal(size=(length, d))
        vecs = list(vs / np.linalg.norm(vs, axis=1, keepdims=True))
    elif name == "haar-random":
        return haar_random_mps(length, chi, d=d, dtype=dtype, rng=rng)
    else:
        msg = f"Unknown preset state {name!r}"
        raise ValueError(msg)
    return product_state_tensors(vecs, chi, d=d, dtype=dtype)


def haar_random_mps(
    length: int,
    chi: int,
    d: int = 2,
    dtype=np.complex128,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Entangled Haar-random MPS from left-orthonormal Haar isometries with
    representability-capped bond dims (reference mps.py haar-random preset,
    QR-phase fixed for a well-defined Haar sample)."""
    rng = rng or np.random.default_rng()
    caps = [1] * (length + 1)
    for i in range(1, length):
        caps[i] = min(d**i, d ** (length - i), chi)
    out = np.zeros((length, d, chi, chi), dtype=dtype)
    for i in range(length):
        cl, cr = caps[i], caps[i + 1]
        x = rng.standard_normal((d * cl, cr)) + 1j * rng.standard_normal((d * cl, cr))
        q, r = np.linalg.qr(x)
        diag = np.diag(r)
        phases = np.where(np.abs(diag) > 0, diag / np.abs(np.where(diag == 0, 1, diag)), 1.0)
        q = q / phases[None, :]
        out[i, :, :cl, :cr] = q.reshape(d, cl, cr)
    return out


# ---------------------------------------------------------------------------
# Transfer / overlap primitives
# ---------------------------------------------------------------------------


def transfer_right(env: jnp.ndarray, a_bra: jnp.ndarray, a_ket: jnp.ndarray) -> jnp.ndarray:
    """One-site transfer: ``env'[rb, rk] = sum conj(Ab[s,lb,rb]) env[lb,lk] Ak[s,lk,rk]``."""
    tmp = jnp.einsum("lm,smr->slr", env, a_ket)
    return jnp.einsum("slb,slr->br", a_bra.conj(), tmp)


def scalar_product(bra: jnp.ndarray, ket: jnp.ndarray) -> jnp.ndarray:
    """Full overlap ``<bra|ket>`` of two padded MPS arrays (any gauge)."""
    chi = bra.shape[-1]
    env0 = jnp.eye(chi, dtype=ket.dtype)

    def step(env, tensors):
        ab, ak = tensors
        return transfer_right(env, ab, ak), None

    env, _ = jax.lax.scan(step, env0, (bra, ket))
    return jnp.trace(env)


def norm_squared(tensors: jnp.ndarray) -> jnp.ndarray:
    """``<psi|psi>`` via the full transfer chain (gauge-free, real output)."""
    return jnp.real(scalar_product(tensors, tensors))


def norm_squared_center0(tensors: jnp.ndarray) -> jnp.ndarray:
    """``<psi|psi>`` assuming canonical form at site 0 (O(d chi^2))."""
    t0 = tensors[0]
    return jnp.real(jnp.vdot(t0, t0))


# ---------------------------------------------------------------------------
# Canonicalization
# ---------------------------------------------------------------------------


def _qr_rank_noise(shape, dtype) -> np.ndarray | None:
    """Deterministic rank-safety noise for complex64 QRs.

    XLA:TPU's Householder QR produces NaN columns on exactly rank-deficient
    blocks, which padded states (and exactly-rank-preserving splits such as
    the Newton-Schulz subspace split) create.  A fixed noise matrix at
    ~eps^(3/4) below the input norm keeps every QR full-rank while staying
    far below the complex64 working precision.  float64 runs use LAPACK,
    which completes rank-deficient QRs gracefully — no noise there.
    """
    if jnp.zeros((), dtype).real.dtype != jnp.float32:
        return None
    nz = np.random.default_rng(9157).standard_normal(shape)
    return (nz / np.linalg.norm(nz)).astype(np.float32)


# one ulp relative suffices to keep Householder off exact singularity while
# perturbing the state below accumulation relevance (~sqrt(n_calls) * eps)
_QR_EPS32 = float(np.finfo(np.float32).eps)


def canonicalize_right(tensors: jnp.ndarray, method: str = "qr") -> jnp.ndarray:
    """Bring the MPS to canonical form at site 0 without normalizing.

    ``tensors[1:]`` become right-orthonormal; ``tensors[0]`` absorbs the
    leftover factor (norm and phase preserved: the represented state is
    unchanged).

    ``method="newton"`` replaces each per-site Householder LQ with a
    Newton-Schulz polar orthogonalization (matmuls only — ~5x faster per site
    on TPU, see CLAUDE.md microbenchmarks).  The polar factor spans the same
    row space up to the iteration's isometry error (~working precision for
    well-separated singular values; weak directions carry negligible state
    weight), so the represented state is preserved to the same order as the
    subspace splits that already use it.
    """
    length, d, chi, _ = tensors.shape
    if length == 1:
        return zero_boundary_pads(tensors)

    if method == "newton":
        from ..ops.decomp import newton_schulz_orthogonalize

        def step(c, a):
            # Absorb carried factor from the right, then polar-LQ:
            # m (chi, d*chi) = c_new . q with q = x^H, x = polar(m^H).
            t = jnp.einsum("slr,rm->slm", a, c)
            m = jnp.transpose(t, (1, 0, 2)).reshape(chi, d * chi)
            x = newton_schulz_orthogonalize(m.conj().T)  # (d*chi, chi) isometry
            b = x.conj().T.reshape(chi, d, chi).transpose(1, 0, 2)
            return m @ x, b

    else:
        noise = _qr_rank_noise((d * chi, chi), tensors.dtype)

        def step(c, a):
            # Absorb carried factor from the right, then LQ-split.
            t = jnp.einsum("slr,rm->slm", a, c)
            m = jnp.transpose(t, (1, 0, 2)).reshape(chi, d * chi)
            mh = m.conj().T
            if noise is not None:
                # absolute floor keeps even exactly-zero blocks (post-jump site
                # tensors) full rank without f32 underflow inside Householder
                scale = (_QR_EPS32 * jnp.linalg.norm(mh) + 1e-16).astype(mh.dtype)
                mh = mh + scale * jnp.asarray(noise, dtype=mh.dtype)
            qh, rh = jnp.linalg.qr(mh)  # m = rh^H qh^H
            b = qh.conj().T.reshape(chi, d, chi).transpose(1, 0, 2)
            return rh.conj().T, b

    c0 = jnp.eye(chi, dtype=tensors.dtype)
    c, bs_rev = jax.lax.scan(step, c0, jnp.flip(tensors[1:], axis=0))
    bs = jnp.flip(bs_rev, axis=0)
    a0 = jnp.einsum("slr,rm->slm", tensors[0], c)
    return zero_boundary_pads(jnp.concatenate([a0[None], bs], axis=0))


def zero_boundary_pads(tensors: jnp.ndarray) -> jnp.ndarray:
    """Zero the contraction-unreachable boundary-pad entries.

    The padded layout anchors both chain boundaries at bond index 0, so
    ``tensors[0][:, 1:, :]`` and ``tensors[-1][:, :, 1:]`` never contribute
    to any anchored contraction.  LQ/polar canonicalization nevertheless
    fills the last site's pad COLUMNS with unit-norm isometry-completion
    rows, and a later two-site solve that merges that site lets those
    unit singular values compete with physical weight for the keep slots —
    truncation then silently moves real amplitude into the pad sector
    (bisected via the digital window-TDVP stage: a full-chain CX-generator
    window lost 0.43% of physical weight while the trace norm read 1.0).
    Re-zeroing here restores the documented zero-padding invariant at
    every canonicalization.  Only valid for FULL chains (every caller —
    engines, checker, MPS/MPO classes — canonicalizes whole chains; embedded
    windows never route through this function).
    """
    z0 = tensors[0] * jnp.zeros_like(tensors[0]).at[:, 0, :].set(1.0)
    tensors = tensors.at[0].set(z0)  # sequential: site 0 may BE site -1 (L=1)
    zl = tensors[-1] * jnp.zeros_like(tensors[-1]).at[:, :, 0].set(1.0)
    return tensors.at[-1].set(zl)


def shift_center_right(tensors: jnp.ndarray, n: int) -> jnp.ndarray:
    """Move the canonical center from site 0 to site ``n`` (static ``n``).

    Sites ``0..n-1`` become left-orthonormal via QR; the leftover factor is
    absorbed rightward.  Norm and represented state preserved exactly.
    """
    if n <= 0:
        return tensors
    length, d, chi, _ = tensors.shape
    noise = _qr_rank_noise((d * chi, chi), tensors.dtype)

    def body(t, i):
        a = t[i].reshape(d * chi, chi)
        if noise is not None:
            scale = (_QR_EPS32 * jnp.linalg.norm(a) + 1e-16).astype(a.dtype)
            a = a + scale * jnp.asarray(noise, dtype=a.dtype)
        q, r = jnp.linalg.qr(a)
        b = jnp.einsum("lm,smr->slr", r, t[i + 1])
        return t.at[i].set(q.reshape(d, chi, chi)).at[i + 1].set(b), None

    tensors, _ = jax.lax.scan(body, tensors, jnp.arange(n))
    return tensors


def shift_center_right_dynamic(tensors: jnp.ndarray, n) -> jnp.ndarray:
    """Like :func:`shift_center_right` but with a TRACED shift count ``n``:
    a full-length masked QR sweep (bonds with ``i >= n`` pass through
    unchanged).  Costs O(L) QRs regardless of ``n``, but lets one compiled
    program serve every window position (the digital gate-stage cache)."""
    length, d, chi, _ = tensors.shape
    if length < 2:
        return tensors
    noise = _qr_rank_noise((d * chi, chi), tensors.dtype)

    def body(t, i):
        a = t[i].reshape(d * chi, chi)
        if noise is not None:
            scale = (_QR_EPS32 * jnp.linalg.norm(a) + 1e-16).astype(a.dtype)
            a = a + scale * jnp.asarray(noise, dtype=a.dtype)
        q, r = jnp.linalg.qr(a)
        do = i < n
        new_i = jnp.where(do, q.reshape(d, chi, chi), t[i])
        new_ip1 = jnp.where(do, jnp.einsum("lm,smr->slr", r, t[i + 1]), t[i + 1])
        return t.at[i].set(new_i).at[i + 1].set(new_ip1), None

    tensors, _ = jax.lax.scan(body, tensors, jnp.arange(length - 1))
    return tensors


def normalize_canonical(
    tensors: jnp.ndarray, method: str = "qr"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Canonicalize at site 0 and scale to unit norm.

    Returns ``(tensors, norm)`` where ``norm`` is the pre-normalization norm
    (reference ``MPS.normalize("B")``, mps.py:788-837).
    """
    canon = canonicalize_right(tensors, method=method)
    nrm = jnp.sqrt(norm_squared_center0(canon))
    safe = jnp.where(nrm > 0, nrm, 1.0)
    canon = canon.at[0].divide(safe.astype(canon.dtype))
    return canon, nrm


# ---------------------------------------------------------------------------
# Expectation values (state canonical at 0 and normalized)
# ---------------------------------------------------------------------------


def left_gram_environments(tensors: jnp.ndarray) -> jnp.ndarray:
    """Stacked left Gram environments ``rho[i]`` (before site i), ``(L, chi, chi)``."""
    chi = tensors.shape[-1]
    env0 = jnp.eye(chi, dtype=tensors.dtype)

    def step(env, a):
        return transfer_right(env, a, a), env

    _, envs = jax.lax.scan(step, env0, tensors)
    return envs


def right_gram_environments(tensors: jnp.ndarray) -> jnp.ndarray:
    """``rhoR[i]`` = Gram of sites > i contracted from the right, ``(L, chi, chi)``
    (``rhoR[i]`` applies to the right leg of site ``i``). Gauge-free."""
    chi = tensors.shape[-1]
    env0 = jnp.eye(chi, dtype=tensors.dtype)

    def step(env, a):
        tmp = jnp.einsum("slt,rt->slr", a, env)
        new = jnp.einsum("slr,smr->lm", a.conj(), tmp)
        return new, env

    _, envs_rev = jax.lax.scan(step, env0, jnp.flip(tensors, 0))
    return jnp.flip(envs_rev, 0)


def site_moment_matrices(tensors: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-site moments ``T_i[b,k] = <psi| (|b><k|)_i |psi>`` (GAUGE-FREE).

    Returns ``(T (L, d, d), norm2)`` from one left and one right transfer
    scan. Any one-site expectation follows as ``sum O[b,k] T[b,k] / norm2``
    without requiring canonical form — the basis of both the jump sampler's
    channel weights (methods/stochastic.py) and the gauge-free observable
    fast path (core/observables.py)."""
    left_envs = left_gram_environments(tensors)
    full = transfer_right(left_envs[-1], tensors[-1], tensors[-1])
    right_envs = right_gram_environments(tensors)

    def one(a, rho_l, rho_r):
        tmp = jnp.einsum("lm,kms->kls", rho_l, a)
        tmp = jnp.einsum("kls,rs->klr", tmp, rho_r)
        return jnp.einsum("blr,klr->bk", a.conj(), tmp)

    t = jax.vmap(one)(tensors, left_envs, right_envs)
    return t, jnp.real(jnp.trace(full))


def site_expectation(
    tensors: jnp.ndarray, envs: jnp.ndarray, op: jnp.ndarray, site
) -> jnp.ndarray:
    """``<psi| O_site |psi>`` for canonical-at-0 normalized ``tensors``.

    ``envs`` are the stacked left Gram environments; the right part is
    orthonormal so the right environment is the identity.
    """
    a = tensors[site]
    env = envs[site]
    return jnp.einsum("blr,bk,kmr,lm->", a.conj(), op.astype(a.dtype), a, env)


def site_expectations(
    tensors: jnp.ndarray, ops: jnp.ndarray, sites: jnp.ndarray
) -> jnp.ndarray:
    """Batched one-site expectations: ``ops (n, d, d)``, ``sites (n,)`` -> ``(n,)``."""
    envs = left_gram_environments(tensors)
    return jax.vmap(lambda o, s: site_expectation(tensors, envs, o, s))(ops, sites)


def all_site_expectations(tensors: jnp.ndarray, op: jnp.ndarray) -> jnp.ndarray:
    """``<O_i>`` for one operator at every site, ``(L,)``; single scan."""

    chi = tensors.shape[-1]
    env0 = jnp.eye(chi, dtype=tensors.dtype)

    def step(env, a):
        val = jnp.einsum("blr,bk,kmr,lm->", a.conj(), op.astype(a.dtype), a, env)
        return transfer_right(env, a, a), val

    _, vals = jax.lax.scan(step, env0, tensors)
    return vals


# ---------------------------------------------------------------------------
# Local operator application
# ---------------------------------------------------------------------------


def apply_one_site_operator(tensors: jnp.ndarray, op: jnp.ndarray, site) -> jnp.ndarray:
    """Apply a ``(d, d)`` operator at a (possibly traced) site index."""
    a = tensors[site]
    a2 = jnp.einsum("ab,blr->alr", op.astype(a.dtype), a)
    return tensors.at[site].set(a2)


def apply_operator_everywhere(tensors: jnp.ndarray, ops: jnp.ndarray) -> jnp.ndarray:
    """Apply per-site ``(L, d, d)`` operators to all sites at once (one einsum)."""
    return jnp.einsum("iab,iblr->ialr", ops.astype(tensors.dtype), tensors)


# ---------------------------------------------------------------------------
# Dense conversion + diagnostics (test/small-system paths)
# ---------------------------------------------------------------------------


def to_statevector_np(tensors) -> np.ndarray:
    """Pure-numpy dense conversion (site 0 least significant).

    Use this for host-side conversions outside jit: eager complex device
    compute is unsupported on the tunneled TPU platform, so the jnp variant
    below is only safe inside jitted programs (or on CPU).
    """
    t = np.asarray(tensors)
    length, d, chi, _ = t.shape
    vec = t[0][:, 0, :]  # (d, chi)
    for i in range(1, length):
        vec = np.einsum("...r,srm->...sm", vec, t[i])
    vec = vec[..., 0]
    perm = tuple(reversed(range(length)))
    return np.transpose(vec, perm).reshape(-1)


def to_statevector(tensors: jnp.ndarray) -> jnp.ndarray:
    """Contract to a dense state vector with site 0 as the least significant
    index (reference kron order, mps.py:1629-1654 via flip_network).

    Host/test utility — exponential in L.  On the tunneled TPU platform call
    :func:`to_statevector_np` instead (eager complex device compute is
    unsupported there).
    """
    length, d, chi, _ = tensors.shape
    vec = tensors[0][:, 0, :]  # (d, chi): boundary left bond index 0
    dims = [d]
    for i in range(1, length):
        vec = jnp.einsum("...r,srm->...sm", vec, tensors[i])
        dims.append(d)
    vec = vec[..., 0]  # right boundary index 0
    # vec index order (s_0, s_1, ..., s_{L-1}); site 0 least significant
    # => flatten with s_{L-1} slowest.
    perm = tuple(reversed(range(length)))
    return jnp.transpose(vec, perm).reshape(-1)


def compress(
    tensors: jnp.ndarray,
    *,
    mode: str = "discarded_weight",
    threshold: float = 0.0,
    max_bond_dim: int | None = None,
    chi_out: int | None = None,
) -> jnp.ndarray:
    """Canonicalize then truncate every bond with one L->R SVD sweep.

    Reference ``MPS.compress`` semantics (mps.py:839-895): right-canonicalize,
    then sweep left-to-right splitting each merged pair with truncation.  The
    result is canonical at the last site; a final canonicalization returns the
    center to 0.  ``chi_out`` optionally slices the padded bond dimension down
    (valid because kept singular directions occupy the leading slots).
    """
    from ..ops.decomp import merge_two_site as _merge
    from ..ops.decomp import split_two_site_truncated as _split

    length, d, chi, _ = tensors.shape
    tensors = canonicalize_right(tensors)
    if length > 1:
        cap = chi if max_bond_dim is None else min(max_bond_dim, chi)

        def body(tensors, i):
            theta = _merge(tensors[i], tensors[i + 1])
            a, b, _, _ = _split(
                theta,
                chi,
                mode=mode,
                threshold=threshold,
                max_bond_dim=cap,
                min_keep=1,
                svd_distribution="right",
            )
            return tensors.at[i].set(a).at[i + 1].set(b), None

        tensors, _ = jax.lax.scan(body, tensors, jnp.arange(length - 1))
        tensors = canonicalize_right(tensors)
    if chi_out is not None and chi_out < chi:
        tensors = tensors[:, :, :chi_out, :chi_out]
    return tensors


def statevector_to_mps(
    psi: np.ndarray, length: int, chi: int, d: int = 2, dtype=np.complex128
) -> np.ndarray:
    """Factor a dense state vector (site 0 least significant) into a padded
    MPS via successive truncated SVDs. Host-side utility (numpy).
    """
    psi = np.asarray(psi, dtype=dtype).reshape(-1)
    if psi.size != d**length:
        msg = f"state vector size {psi.size} != {d}**{length}"
        raise ValueError(msg)
    tensors = np.zeros((length, d, chi, chi), dtype=dtype)
    amp = psi.reshape([d] * length)  # axes (s_{L-1}, ..., s_0)
    amp = amp.transpose(tuple(reversed(range(length))))  # (s_0, ..., s_{L-1})
    m = amp.reshape(1, -1)
    left_dim = 1
    for i in range(length - 1):
        m = m.reshape(left_dim * d, -1)
        u, s, vh = np.linalg.svd(m, full_matrices=False)
        k = min(len(s), chi)
        tensors[i, :, :left_dim, :k] = (
            u[:, :k].reshape(left_dim, d, -1).transpose(1, 0, 2)[:, :, :k]
        )
        m = (np.diag(s[:k]) @ vh[:k]).reshape(k, -1)
        left_dim = k
    tensors[length - 1, :, :left_dim, 0] = m.reshape(left_dim, d).T
    return tensors


def bond_spectra(tensors: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Schmidt spectra ``(L-1, chi)`` and von Neumann entropies ``(L-1,)`` at
    every internal bond.

    Assumes canonical form at site 0 with unit norm. Sweeps the center
    rightward via QR, computing the Schmidt spectrum at each bond by SVD of
    the center matrix.
    """
    length, d, chi, _ = tensors.shape
    eps = jnp.finfo(jnp.zeros((), tensors.real.dtype).dtype).tiny

    def step(carry, a):
        center = carry  # (chi, chi) factor to absorb into this site
        t = jnp.einsum("lm,smr->slr", center, a)
        m = t.reshape(d * chi, chi)
        q, r = jnp.linalg.qr(m)
        s = jnp.linalg.svd(r, compute_uv=False)
        p = s * s
        p = p / jnp.maximum(jnp.sum(p), eps)
        ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))
        return r, (s, ent)

    center0 = jnp.eye(chi, dtype=tensors.dtype)
    _, (spectra, ents) = jax.lax.scan(step, center0, tensors[:-1])
    return spectra, ents


def bond_entropies(tensors: jnp.ndarray) -> jnp.ndarray:
    """Von Neumann entanglement entropy at every internal bond, ``(L-1,)``."""
    _, ents = bond_spectra(tensors)
    return ents
