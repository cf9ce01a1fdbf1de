"""QR / SVD site decompositions on fixed-shape padded tensors.

MPS site tensors are rank-3 ``(d, l, r)`` (physical, left bond, right bond)
padded to a uniform bond dimension chi; MPO tensors are rank-4
``(d_out, d_in, wl, wr)``.  All functions here keep shapes fixed so they jit
and vmap cleanly; truncation is expressed as singular-value masking
(:mod:`yaqs_tpu.ops.truncation`) rather than shape shrinking.

Reference semantics: mqt-yaqs core/methods/decompositions.py:30-188 (right_qr,
left_qr, merge_two_site, split_two_site) re-derived for fixed shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .truncation import keep_mask


def _real_or(dtype):
    return jnp.zeros((), dtype=dtype).real.dtype

__all__ = [
    "newton_schulz_orthogonalize",
    "right_qr",
    "left_qr",
    "merge_two_site",
    "split_two_site_truncated",
    "split_matrix_truncated",
]


def newton_schulz_orthogonalize(
    y: jnp.ndarray, passes: int = 1, aggressive: int = 4
) -> jnp.ndarray:
    """Orthonormalize the columns of ``y`` by Newton-Schulz polar iteration.

    Matmuls only (MXU-native): avoids the XLA:TPU Householder-QR NaN hazard on
    exactly rank-deficient blocks (padded states produce them).  Rank-safe:
    for rank-deficient ``y`` the iteration converges to a partial isometry —
    null directions stay (harmlessly) null.

    ``aggressive`` counts the accelerated (polar-express) quintics per pass;
    each multiplies small singular values by ~3.44, the two mild quintics by
    ~2, so one default pass (4 aggressive) lifts ~2.8 decades — full
    orthonormalization for spreads down to ~1e-2.  ``passes`` repeats the
    whole pass (re-normalizing in between), stacking coverage.

    **Do NOT raise ``aggressive`` above the tuned 4 for complex64 work.**
    The 4+2+2 schedule is a tuned sequence, and in complex64 any extra lift
    amplifies sub-eps NOISE directions into the basis: measured end-to-end
    on the bench shape (L=100 chi=64 TFIM, noiseless, vs x64 golden), the
    half-step split reads 1.7e-5 max observable error at aggressive=4 and
    ~0.96 (catastrophic state collapse at t~0.3) at EVERY aggressive in
    {5,6,7,8} — a cliff, not a ramp (2026-08-21 sweep, docs/tpu_numerics.md).
    Directions genuinely below one pass's ~2.8-decade reach stay partial
    isometries, which the half-step subspace iteration is self-correcting
    against (each m-application re-expresses them; XXZ x64 e2e reads 1.0e-4
    at every aggressive setting).

    The scaling must be a GUARANTEED upper bound on sigma_max — the degree-5
    polynomial (polar-express coefficients) diverges for singular values above
    ~1.46, so an underestimating spectral estimate (e.g. a short power
    iteration) would overflow to NaN on noisy states.  We use
    ``min(frobenius, sqrt(norm1 * norminf))`` — both are true upper bounds,
    and the Holder bound is typically ~sqrt(rank) tighter than Frobenius,
    which buys roughly one extra converged decade per iteration budget.
    """
    x = y
    for _ in range(passes):
        a1 = jnp.abs(x)
        holder = jnp.sqrt(
            jnp.max(jnp.sum(a1, axis=-2), axis=-1) * jnp.max(jnp.sum(a1, axis=-1), axis=-1)
        )
        frob = jnp.sqrt(jnp.sum(a1**2, axis=(-2, -1)))
        bound = (jnp.minimum(frob, holder) + 1e-30)[..., None, None]
        x = x / bound.astype(x.dtype)
        coeffs = [(3.4445, -4.7750, 2.0315)] * aggressive + [
            (2.0, -1.3333, 0.3333),
            (2.0, -1.3333, 0.3333),
        ]
        for a, b, c in coeffs:
            g = jnp.swapaxes(x.conj(), -1, -2) @ x
            xg = x @ g
            x = a * x + b * xg + c * (xg @ g)
        for _ in range(2):
            g = jnp.swapaxes(x.conj(), -1, -2) @ x
            x = 1.5 * x - 0.5 * (x @ g)
    return x


def right_qr(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Left-orthonormalize ``a``: returns ``(q, r)`` with ``a = q . r``.

    ``q`` has orthonormal columns in the combined ``(d*l)`` index, i.e.
    ``sum_{d,l} conj(q[d,l,m]) q[d,l,m'] = delta_{mm'}``; ``r`` is ``(r_old?, )``
    -- concretely ``a[d,l,r] = sum_m q[d,l,m] r[m,r]``.
    """
    d, l, r = a.shape
    m = a.reshape(d * l, r)
    q, rr = jnp.linalg.qr(m)
    return q.reshape(d, l, -1), rr


def left_qr(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Right-orthonormalize ``a``: returns ``(q, lmat)`` with
    ``a[d,l,r] = sum_m lmat[l,m] q[d,m,r]`` and
    ``sum_{d,r} q[d,m,r] conj(q[d,m',r]) = delta_{mm'}``.

    Implemented as QR of the conjugate-transposed unfolding (an LQ
    decomposition).
    """
    d, l, r = a.shape
    m = jnp.transpose(a, (1, 0, 2)).reshape(l, d * r)  # rows l, cols (d r)
    qh, rh = jnp.linalg.qr(m.conj().T)  # m = rh^H qh^H
    q = qh.conj().T.reshape(-1, d, r).transpose(1, 0, 2)  # (d, m, r)
    lmat = rh.conj().T  # (l, m)
    return q, lmat


def merge_two_site(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Contract neighboring site tensors into a two-site block.

    ``a (d1, l, m)``, ``b (d2, m, r)`` -> ``theta (d1, d2, l, r)``.
    """
    return jnp.einsum("alm,bmr->ablr", a, b)


def split_matrix_truncated(
    m: jnp.ndarray,
    chi: int,
    *,
    mode: str,
    threshold,
    max_bond_dim: int | None = None,
    min_keep: int = 1,
    svd_distribution: str = "right",
):
    """Truncated SVD split of matrix ``m`` with a fixed output bond ``chi``.

    Returns ``(left (rows, chi), right (chi, cols), s_kept (chi,), keep)``.
    Masked-out singular directions are zeroed, reproducing the reference's
    shrink-to-keep semantics at fixed shape.  ``svd_distribution`` places the
    kept singular values on the ``left`` factor, the ``right`` factor, or
    ``sqrt`` on both.
    """
    u, s, vh = jnp.linalg.svd(m, full_matrices=False)
    k = s.shape[-1]
    if k < chi:  # pad up so the output bond is exactly chi
        pad = chi - k
        u = jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(0, pad)])
        s = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, pad)])
        vh = jnp.pad(vh, [(0, 0)] * (vh.ndim - 2) + [(0, pad), (0, 0)])
    else:
        u = u[..., :, :chi]
        s = s[..., :chi]
        vh = vh[..., :chi, :]
    cap = None if max_bond_dim is None else min(max_bond_dim, chi)
    mask, keep = keep_mask(
        s, mode=mode, threshold=threshold, max_bond_dim=cap, min_keep=min_keep
    )
    s_kept = s * mask
    sc = s_kept.astype(m.dtype)
    if svd_distribution == "left":
        left = u * sc[..., None, :]
        right = vh * mask.astype(m.dtype)[..., :, None]
    elif svd_distribution == "right":
        left = u * mask.astype(m.dtype)[..., None, :]
        right = vh * sc[..., :, None]
    elif svd_distribution == "sqrt":
        sq = jnp.sqrt(s_kept).astype(m.dtype)
        left = u * sq[..., None, :]
        right = vh * sq[..., :, None]
    else:
        msg = f"Unknown svd_distribution: {svd_distribution!r}"
        raise ValueError(msg)
    return left, right, s_kept, keep


def split_matrix_subspace(
    m: jnp.ndarray,
    chi: int,
    *,
    iters: int = 2,
    orth_every: bool = True,
    qr_method: str = "householder",
    svd_distribution: str = "right",
):
    """Approximate rank-``chi`` split via subspace (power) iteration — no SVD.

    TPU-motivated alternative to :func:`split_matrix_truncated`: on TPU the
    QDWH-based SVD of a (2chi, 2chi) block costs ~20x a QR, while the split
    only needs a good rank-``chi`` column subspace.  Power iteration on
    ``G = m m^H`` from a deterministic random range-finder start
    converges to the dominant subspace; the result keeps the padded shape
    with ``left = Q`` (isometry) and ``right = Q^H m``.

    Truncation-policy masking is NOT applied (equivalent to keep-all at the
    cap): at fixed padded bond dimension, sub-threshold directions are
    harmless zero-padding rather than a cost. Use the exact path when
    reference-exact truncation semantics are required.

    Accuracy in complex64 (TPU): ``iters=2`` matches the exact-SVD path's
    precision floor on 100-site TFIM sweeps; ``iters=1`` loses the subspace
    (O(0.1) observable errors) and ``orth_every=False`` overflows to NaN —
    both are only safe in float64.
    """
    import numpy as _np

    mh = jnp.swapaxes(m.conj(), -1, -2)
    # deterministic random range finder: a dense mixing start avoids the
    # rank-deficiency trap of structured (e.g. leading-column) starts on
    # padded tensors; trace-time numpy constant, same for every call
    cols = m.shape[-1]
    rows = m.shape[-2]
    omega_c = _np.random.default_rng(20260816).standard_normal((cols, chi)) / _np.sqrt(cols)
    omega_r = _np.random.default_rng(20260817).standard_normal((rows, chi)) / _np.sqrt(rows)

    # Rank-safety: padded states make the iterate rank-deficient, and the
    # TPU's Householder QR produces NaN columns on exactly-singular blocks
    # (LAPACK completes them gracefully; XLA:TPU does not).  A deterministic
    # noise floor ~eps^(3/4) below the iterate norm keeps every QR full-rank
    # while perturbing the kept subspace far below the dtype's working
    # precision for the power iteration.
    eps_reg = float(jnp.finfo(_real_or(m.dtype)).eps) ** 0.75

    def _safe_qr(y, seed, passes=1):
        if qr_method == "newton":
            # only reached via the half-step scheme below: inputs carry the
            # kept subspace's RAW sigma spread (never a powered spectrum).
            # ONE tuned pass (4 aggressive quintics, ~2.8 decades).  Weak
            # directions beyond that reach stay partial isometries — benign
            # here (the alternation re-expresses them each m-application)
            # — while any larger lift amplifies sub-eps noise directions
            # into the basis and collapses the trajectory (measured cliff,
            # see the NS docstring; e2e 1.7e-5 at 4 vs 0.96 at 5+).
            return newton_schulz_orthogonalize(y)
        if qr_method == "cholesky":
            # CholQR with an eps-shifted Gram: ~2x cheaper than Householder
            # per microbenchmark, but XLA:TPU's cholesky NaNs on the
            # rank-deficient Grams padded states produce even with the shift
            # — measured unusable on TPU; safe on CPU/float64 only.
            gram = jnp.swapaxes(y.conj(), -1, -2) @ y
            n = y.shape[-1]
            shift = (eps_reg * jnp.trace(gram).real / n).astype(gram.dtype)
            r = jnp.linalg.cholesky(gram + shift * jnp.eye(n, dtype=gram.dtype))
            qh = jax.scipy.linalg.solve_triangular(
                r, jnp.swapaxes(y.conj(), -1, -2), lower=True
            )
            return jnp.swapaxes(qh, -1, -2).conj()
        nz = _np.random.default_rng(seed).standard_normal(y.shape[-2:])
        nz = nz / _np.linalg.norm(nz)
        scale = (eps_reg * jnp.linalg.norm(y)).astype(y.dtype)
        q, _ = jnp.linalg.qr(y + scale * jnp.asarray(nz, dtype=y.dtype))
        return q
    # Newton (TPU default) uses HALF-STEP alternation: orthonormalize after
    # EVERY application of m / m^H, so each NS input carries the kept
    # subspace's raw sigma spread — never sigma^(2*iters+1).  The full-power
    # iterate is unrecoverable in complex64: powering crushes significant
    # directions (sigma_rel ~ 1e-3 at the bench truncation floor) below the
    # Gram noise floor (~sqrt(eps) ~ 2.4e-4), where NO pass count can lift
    # them cleanly (bisected: 1.9e-2 XXZ observable error; spread-ladder unit
    # pins in tests/methods/test_fast_path_battery.py).  Same total power
    # applications (2*iters + 1) as the classic scheme, so the subspace
    # convergence rate is unchanged.  Householder keeps the classic scheme:
    # exact QR handles any spread, and float64's deeper eps floor tolerates
    # the powered spectrum.
    half_step = qr_method == "newton"
    if svd_distribution == "right":
        # left factor isometric: dominant COLUMN subspace of m
        y = m @ jnp.asarray(omega_c, dtype=m.dtype)
        if half_step:
            for it in range(iters):
                q = _safe_qr(y, 31 + it)
                z = _safe_qr(mh @ q, 131 + it)
                y = m @ z
        else:
            for it in range(iters):
                if orth_every:  # re-orth between powers: resolves tails ~eps^(1/2)
                    y = _safe_qr(y, 31 + it)
                y = m @ (mh @ y)
        q = _safe_qr(y, 63, passes=2)
        left = q
        right = jnp.swapaxes(q.conj(), -1, -2) @ m
        s_approx = jnp.sqrt(jnp.sum(jnp.abs(right) ** 2, axis=-1))
    elif svd_distribution == "left":
        # right factor isometric: dominant ROW subspace of m
        y = mh @ jnp.asarray(omega_r, dtype=m.dtype)
        if half_step:
            for it in range(iters):
                v0 = _safe_qr(y, 47 + it)
                z = _safe_qr(m @ v0, 147 + it)
                y = mh @ z
        else:
            for it in range(iters):
                if orth_every:
                    y = _safe_qr(y, 47 + it)
                y = mh @ (m @ y)
        v = _safe_qr(y, 79, passes=2)
        left = m @ v
        right = jnp.swapaxes(v.conj(), -1, -2)
        s_approx = jnp.sqrt(jnp.sum(jnp.abs(left) ** 2, axis=-2))
    else:
        msg = "subspace splits support svd_distribution 'left'/'right' only"
        raise NotImplementedError(msg)
    keep = jnp.full(m.shape[:-2], chi, dtype=jnp.int32)
    return left, right, s_approx, keep


def split_two_site_subspace(
    theta: jnp.ndarray,
    chi: int,
    *,
    iters: int = 2,
    orth_every: bool = True,
    qr_method: str = "householder",
    svd_distribution: str = "right",
):
    """Two-site variant of :func:`split_matrix_subspace`."""
    d1, d2, l, r = theta.shape
    m = jnp.transpose(theta, (0, 2, 1, 3)).reshape(d1 * l, d2 * r)
    left, right, s, keep = split_matrix_subspace(
        m,
        chi,
        iters=iters,
        orth_every=orth_every,
        qr_method=qr_method,
        svd_distribution=svd_distribution,
    )
    a = left.reshape(d1, l, chi)
    b = right.reshape(chi, d2, r).transpose(1, 0, 2)
    return a, b, s, keep


def split_two_site_truncated(
    theta: jnp.ndarray,
    chi: int,
    *,
    mode: str,
    threshold,
    max_bond_dim: int | None = None,
    min_keep: int = 1,
    svd_distribution: str = "right",
):
    """Split a two-site block back into site tensors with masked truncation.

    ``theta (d1, d2, l, r)`` -> ``(a (d1, l, chi), b (d2, chi, r), s, keep)``.
    """
    d1, d2, l, r = theta.shape
    m = jnp.transpose(theta, (0, 2, 1, 3)).reshape(d1 * l, d2 * r)
    left, right, s_kept, keep = split_matrix_truncated(
        m,
        chi,
        mode=mode,
        threshold=threshold,
        max_bond_dim=max_bond_dim,
        min_keep=min_keep,
        svd_distribution=svd_distribution,
    )
    a = left.reshape(d1, l, chi)
    b = right.reshape(chi, d2, r).transpose(1, 0, 2)
    return a, b, s_kept, keep
