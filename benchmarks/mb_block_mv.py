"""Microbenchmark: merged-MPO two-site H_eff matvec — complex einsum chain vs
real-block embedding.

The Lanczos MV is the TJM sweep's dominant cost (CLAUDE.md: 6 raw MVs ~3.0 ms
of a 3.65 ms k=6 Lanczos at B=32, chi=64, Dw=3, PREC=high => ~6.4 TFLOP/s of
a ~60 TFLOP/s bf16x3 ceiling).  Hypothesis: the bottleneck is MXU tiling —
complex64 matmuls at chi=64 lower to four real matmuls whose contraction dim
(64) fills half the 128-lane MXU.  The one-sided real-block embedding

    [Cr; Ci] = [[Fr, -Fi], [Fi, Fr]] @ [Tr; Ti]

does the SAME real FLOPs (8*M*K*N) but with every matmul dimension doubled to
>=128, and the re/im "split" of the iterate survives the whole chain (only
transposes between steps), so a Lanczos iteration can stay in split form.

Per-trajectory block operands (envs F, G) are built once per bond and reused
across the k Krylov MVs, so their build cost is amortized k times; the merged
MPO block W is trajectory-independent.

Run on the TPU:  python benchmarks/mb_block_mv.py
Env: MB_CHI, MB_DW, MB_B, MB_ITERS, MB_PREC.
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update(
    "jax_default_matmul_precision", os.environ.get("MB_PREC", "high")
)

import jax.numpy as jnp
import numpy as np

CHI = int(os.environ.get("MB_CHI", 64))
DW = int(os.environ.get("MB_DW", 3))
D = 2
B = int(os.environ.get("MB_B", 32))
ITERS = int(os.environ.get("MB_ITERS", 200))
REPS = 3


def mv_flops(chi, dw, d):
    """Real FLOPs per complex two-site merged MV (4 real matmuls per complex
    one => 8 real flops per complex MAC)."""
    m1 = (chi * dw) * chi * (d * d * chi)
    m2 = (chi * chi) * (dw * d * d) * (d * d * dw)
    m3 = (d * d * chi) * (dw * chi) * chi
    return 8 * (m1 + m2 + m3)


# --- baseline: the production complex chain (methods/tdvp.py) ---------------


def heff_two_site_merged(f, w12, g, theta):
    d = theta.shape[0]
    chi = theta.shape[-1]
    dw = f.shape[1]
    x = jnp.einsum("awp,stpq->awstq", f, theta)
    xm = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(chi * chi, dw * d * d)
    y = (xm @ w12).reshape(chi, chi, d, d, dw)
    return jnp.einsum("aqxyu,buq->xyab", y, g)


# --- real-block variant ------------------------------------------------------


def _block_left(m):
    """Complex (M, K) -> real (2M, 2K) block [[Re, -Im], [Im, Re]]."""
    r, i = jnp.real(m), jnp.imag(m)
    return jnp.concatenate(
        [jnp.concatenate([r, -i], axis=1), jnp.concatenate([i, r], axis=1)],
        axis=0,
    )


def _block_right(m):
    """Complex (K, N) -> real (2K, 2N) block [[Re, Im], [-Im, Re]] so that
    [Cr, Ci] = [Ar, Ai] @ block."""
    r, i = jnp.real(m), jnp.imag(m)
    return jnp.concatenate(
        [jnp.concatenate([r, i], axis=1), jnp.concatenate([-i, r], axis=1)],
        axis=0,
    )


def make_block_operands(f, g, w12):
    """Per-bond precompute: F2 (2*a*w, 2p), W2 (2*wst, 2*xyu), G2 (2*uq, 2b)."""
    chi, dw = f.shape[0], f.shape[1]
    f2 = _block_left(f.reshape(chi * dw, chi))
    w2 = _block_right(w12)
    gm = jnp.transpose(g, (1, 2, 0)).reshape(dw * chi, chi)  # (u q, b)
    g2 = _block_right(gm)
    return f2, w2, g2


def theta_split(theta):
    """theta (s,t,p,q) -> split iterate (2p, s*t*q)."""
    d, _, chi, _ = theta.shape
    tm = jnp.transpose(theta, (2, 0, 1, 3)).reshape(chi, d * d * chi)
    return jnp.concatenate([jnp.real(tm), jnp.imag(tm)], axis=0)


def theta_unsplit(ts, d, chi):
    tm = ts[:chi] + 1j * ts[chi:]
    return jnp.transpose(tm.reshape(chi, d, d, chi), (1, 2, 0, 3))


def heff_block(f2, w2, g2, ts, d, chi, dw):
    """Split-form MV: (2p, stq) -> (2p, stq); all matmul dims >= 128."""
    x = f2 @ ts  # (2aw, stq)
    x = x.reshape(2, chi, dw, d, d, chi)  # (c, a, w, s, t, q)
    x = jnp.transpose(x, (1, 5, 0, 2, 3, 4)).reshape(chi * chi, 2 * dw * d * d)
    y = x @ w2  # (aq, 2xyu)
    y = y.reshape(chi, chi, 2, d, d, dw)  # (a, q, c, x, y, u)
    y = jnp.transpose(y, (3, 4, 0, 2, 5, 1)).reshape(d * d * chi, 2 * dw * chi)
    z = y @ g2  # (xya, 2b)
    z = z.reshape(d, d, chi, 2, chi)  # (x, y, a, c, b)
    # next iterate in split (2p, stq) form: p <- a, (s,t,q) <- (x,y,b)
    return jnp.transpose(z, (3, 2, 0, 1, 4)).reshape(2 * chi, d * d * chi)


def main():
    rng = np.random.default_rng(0)
    shape_f = (B, CHI, DW, CHI)
    shape_t = (B, D, D, CHI, CHI)
    f_np = (rng.standard_normal(shape_f) + 1j * rng.standard_normal(shape_f)).astype(
        np.complex64
    ) / CHI
    g_np = (rng.standard_normal(shape_f) + 1j * rng.standard_normal(shape_f)).astype(
        np.complex64
    ) / CHI
    t_np = (rng.standard_normal(shape_t) + 1j * rng.standard_normal(shape_t)).astype(
        np.complex64
    )
    w1 = (rng.standard_normal((D, D, DW, DW)) + 1j * rng.standard_normal((D, D, DW, DW))).astype(np.complex64)
    w2_ = (rng.standard_normal((D, D, DW, DW)) + 1j * rng.standard_normal((D, D, DW, DW))).astype(np.complex64)
    w12_np = np.einsum("xswv,ytvu->wstxyu", w1, w2_).reshape(
        DW * D * D, D * D * DW
    ).astype(np.complex64) / (4 * DW)

    flops = mv_flops(CHI, DW, D) * B

    def bench(fn, tag, extract):
        out = fn()  # compile + warm
        v = float(np.asarray(extract(out)))
        assert np.isfinite(v), tag
        best = np.inf
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn()
            _ = float(np.asarray(extract(out)))  # fetch = completion
            dt_ = (time.perf_counter() - t0) / ITERS
            best = min(best, dt_)
        print(
            f"{tag:34s} {best * 1e3:8.3f} ms/MV   "
            f"{flops / best / 1e12:6.2f} TFLOP/s"
        )
        return best

    # baseline: complex chain, theta as loop carry
    @jax.jit
    def run_base():
        def one(f, g, t):
            def body(_, th):
                out = heff_two_site_merged(f, w12_np, g, th)
                return out / jnp.sqrt(jnp.vdot(out, out).real + 1e-30)

            return jax.lax.fori_loop(0, ITERS, body, t)

        return jax.vmap(one)(f_np, g_np, t_np)

    t_base = bench(run_base, f"complex einsum chain", lambda o: jnp.real(o)[0, 0, 0, 0, 0])

    # block variant: split-form carry, block operands prebuilt per trajectory
    @jax.jit
    def run_block():
        def one(f, g, t):
            f2, w2b, g2 = make_block_operands(f, g, jnp.asarray(w12_np))
            ts = theta_split(t)

            def body(_, th):
                out = heff_block(f2, w2b, g2, th, D, CHI, DW)
                return out / jnp.sqrt(jnp.sum(out * out) + 1e-30)

            return jax.lax.fori_loop(0, ITERS, body, ts)

        return jax.vmap(one)(f_np, g_np, t_np)

    t_blk = bench(run_block, f"real-block split chain", lambda o: o[0, 0, 0])

    # block-operand build cost (amortized once per bond over k MVs)
    @jax.jit
    def run_build():
        def one(f, g):
            def body(_, acc):
                f2, w2b, g2 = make_block_operands(f + acc * 0, g, jnp.asarray(w12_np))
                return acc + f2[0, 0] + w2b[0, 0] + g2[0, 0]

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        return jax.vmap(one)(f_np, g_np)

    bench(run_build, "block-operand build (per bond)", lambda o: o[0])

    # correctness: block chain == complex chain
    f0, g0, t0_ = f_np[0], g_np[0], t_np[0]
    want = np.asarray(
        jax.jit(lambda: jnp.real(heff_two_site_merged(f0, w12_np, g0, t0_)))()
    )
    want_i = np.asarray(
        jax.jit(lambda: jnp.imag(heff_two_site_merged(f0, w12_np, g0, t0_)))()
    )

    @jax.jit
    def got_block():
        f2, w2b, g2 = make_block_operands(f0, g0, jnp.asarray(w12_np))
        return heff_block(f2, w2b, g2, theta_split(t0_), D, CHI, DW)

    got = np.asarray(got_block())
    got_c = got[:CHI] + 1j * got[CHI:]
    got_t = np.transpose(got_c.reshape(CHI, D, D, CHI), (1, 2, 0, 3))
    err = max(
        np.abs(got_t.real - want).max(), np.abs(got_t.imag - want_i).max()
    )
    print(f"max |block - complex| = {err:.2e}")
    print(f"speedup: {t_base / t_blk:.2f}x  (chi={CHI} Dw={DW} B={B})")


if __name__ == "__main__":
    main()
