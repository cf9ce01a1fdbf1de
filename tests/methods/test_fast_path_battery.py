"""TPU fast-path end-to-end accuracy battery.

The bench default knob set (svd_method="subspace", subspace_iters=1,
subspace_qr="newton", canon_method="newton", lanczos_reorth=False) is
validated here against the exact-linear-algebra path ON THE SAME SEEDS in
float64, where any deviation is algorithmic rather than precision:

- Heisenberg-class (slowly decaying Schmidt spectrum) is the hard case: the
  subspace power iterate cubes the spectrum, so a 1-pass Newton-Schulz final
  basis was only a PARTIAL isometry and distorted observables by 1.9e-2
  (bisected 2026-08-20; fixed by 2-pass NS on the final basis, now 1.0e-4).
  Round 5 generalized the fix: 2-pass NS only covered iters=1, and NO pass
  count can recover a powered spectrum in complex64 (Gram noise floor
  ~sqrt(eps)); the newton path now runs HALF-STEP orthonormalized subspace
  iteration, so every NS input carries the raw sigma spread.  The split
  spread-ladder below pins this against exact SVD for iters in {1, 2}.
- The multi-pass NS ladder is pinned at the operator level: each pass lifts
  relative singular values ~3 decades.
- Length ladder: the same knob set is pinned against the exact path at
  L in {8, 32, 100} (the L=200 hardware case lives in benchmarks/tpu_smoke
  + bench.py scaling points; the NaN there was traced to exactly the
  partial-isometry class this file pins).

No reference counterpart (the reference runs LAPACK QR/SVD everywhere); this
battery guards the knobs bench.py ships on TPU hardware.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from yaqs_tpu import AnalogSimParams, Hamiltonian, Observable, Simulator, State
from yaqs_tpu.ops.decomp import newton_schulz_orthogonalize

FAST = dict(svd_method="subspace", subspace_iters=1, lanczos_reorth=False,
            subspace_qr="newton", canon_method="newton")
EXACT = dict(svd_method="exact", lanczos_reorth=True, subspace_qr="householder",
             canon_method="qr")


def _evolve(ham, L, chi, knobs, order=1):
    obs = [Observable("z", i) for i in range(L)] + [Observable("x", 0)]
    p = AnalogSimParams(observables=obs, elapsed_time=1.0, dt=0.1, num_traj=1,
                        max_bond_dim=chi, order=order, random_seed=0,
                        sample_timesteps=True, **knobs)
    return np.asarray(Simulator().run(State(L, state="x+"), ham, p).expectation_values)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,ham,chi",
    [
        ("tfim", Hamiltonian.ising(8, 1.0, 0.5), 8),
        ("xxz", Hamiltonian.heisenberg(8, 1.0, 1.0, 0.5, 0.0), 12),
    ],
)
def test_fast_path_matches_exact_path_noiseless(name, ham, chi):
    """Full bench knob set vs exact path, same seeds, x64: <= 1e-3.

    Regression pin for the 1-pass-NS partial-isometry defect (XXZ read
    1.9e-2 before the 2-pass fix; both cases now measure ~1e-4)."""
    f = _evolve(ham, 8, chi, FAST)
    e = _evolve(ham, 8, chi, EXACT)
    assert np.abs(f - e).max() < 1e-3, np.abs(f - e).max()


@pytest.mark.slow
def test_fast_path_order2_matches_exact():
    ham = Hamiltonian.heisenberg(8, 1.0, 1.0, 0.5, 0.0)
    f = _evolve(ham, 8, 12, FAST, order=2)
    e = _evolve(ham, 8, 12, EXACT, order=2)
    assert np.abs(f - e).max() < 1e-3, np.abs(f - e).max()


@pytest.mark.slow
def test_digital_fast_path_matches_exact():
    """The digital TEBD split path honors subspace_qr (it was silently
    dropped before 2026-08-20) and stays within the fast-path envelope on a
    Heisenberg brickwork circuit (measured 4.2e-4)."""
    from yaqs_tpu import DigitalSimParams
    from yaqs_tpu.models.circuits import create_heisenberg_circuit

    n = 8
    circ = create_heisenberg_circuit(n, jx=1.0, jy=1.0, jz=0.5, h=0.3, dt=0.1,
                                     timesteps=10)
    obs = [Observable("z", i) for i in range(n)] + [Observable("x", 0)]

    def run(knobs):
        p = DigitalSimParams(observables=obs, num_traj=1, max_bond_dim=12,
                             random_seed=0, **knobs)
        return np.asarray(
            Simulator().run(State(n, state="x+"), circ, p).expectation_values
        )

    assert np.abs(run(FAST) - run(EXACT)).max() < 2e-3


@pytest.mark.slow
@pytest.mark.parametrize("length", [32, 100])
@pytest.mark.parametrize(
    "name,factory",
    [
        ("tfim", lambda length: Hamiltonian.ising(length, 1.0, 0.5)),
        ("xxz", lambda length: Hamiltonian.heisenberg(length, 1.0, 1.0, 0.5, 0.0)),
    ],
)
def test_fast_path_length_ladder(name, factory, length):
    """Fast-vs-exact x64 pin BEYOND toy length (VERDICT r4 #2).

    The NS partial-isometry defect was invisible at TFIM/L=8 and 1.9e-2 at
    XXZ/L=8; the L=200 TPU non-finite (BENCH_r04) was a longer-chain
    expression of the same class.  Two steps at L=32/L=100 exercise ~25x the
    split count of the L=8 cases."""
    obs = [Observable("z", i) for i in range(0, length, max(1, length // 8))]
    obs += [Observable("x", 0)]
    ham = factory(length)

    def run(knobs):
        p = AnalogSimParams(observables=obs, elapsed_time=0.2, dt=0.1, num_traj=1,
                            max_bond_dim=12, order=2, random_seed=0,
                            sample_timesteps=True, **knobs)
        return np.asarray(Simulator().run(State(length, state="x+"), ham, p).expectation_values)

    f = run(FAST)
    e = run(EXACT)
    assert np.isfinite(f).all()
    assert np.abs(f - e).max() < 1e-3, np.abs(f - e).max()


@pytest.mark.slow
def test_fast_path_complex64_symmetric_z_cliff():
    """Golden-free c64 guard for the noise-amplification cliff.

    Noiseless TFIM from |x+> has <Z_i(t)> = 0 EXACTLY (spin-flip symmetry:
    X^(x)L commutes with H and anticommutes with Z), so any |Z| is pure
    numerical error — no oracle run needed.  At L=48 chi=64 complex64 this
    reads ~7e-6 with the tuned NS pass and ~0.92 (state collapse) with any
    over-aggressive lift (measured sweep 2026-08-21; the round-5 driver
    would have shipped that as wrong-but-finite physics).  Runs in complex64
    deliberately — x64 cannot see this failure class."""
    import jax

    old_x64 = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", False)
    try:
        L = 48
        obs = [Observable("z", i) for i in range(0, L, 4)]
        p = AnalogSimParams(observables=obs, elapsed_time=1.0, dt=0.1,
                            num_traj=1, max_bond_dim=64, order=2,
                            random_seed=0, krylov_dim=4, sample_timesteps=True,
                            **FAST)
        r = Simulator().run(State(L, state="x+"),
                            Hamiltonian.ising(L, 1.0, 0.5), p)
        assert np.abs(np.asarray(r.expectation_values)).max() < 1e-3
    finally:
        jax.config.update("jax_enable_x64", old_x64)


# ------------------------------------------------- subspace split spread pins
def _spectrum_matrix(kept_spread, chi, n=64, seed=0):
    """Random c64 matrix whose KEPT-chi subspace has the given sigma spread
    (the tail sits well below, mimicking a truncation-floor Schmidt tail)."""
    rng = np.random.default_rng(seed)
    s = np.concatenate(
        [np.geomspace(1.0, kept_spread, chi), np.full(n - chi, kept_spread * 1e-2)]
    )
    u, _ = np.linalg.qr(rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    return (u @ np.diag(s) @ v.conj().T).astype(np.complex64)


@pytest.mark.parametrize("dist", ["right", "left"])
@pytest.mark.parametrize("iters", [1, 2])
@pytest.mark.parametrize("kept_spread", [3e-2, 1e-3, 1e-4])
def test_subspace_newton_split_spread_ladder(kept_spread, iters, dist):
    """Half-step NS split contracts across the spread ladder, both iters.

    Design point (measured 2026-08-21): ONE tuned NS pass per orth covers
    spreads to ~1e-2 fully; below that, weak directions stay PARTIAL
    isometries by design — any stronger lift amplifies sub-eps noise into
    the basis and collapses trajectories e2e (~0.96 observable error at
    every aggressive in {5..8} vs 1.7e-5 at the tuned pass).  So the
    matrix-level contract is: exact-SVD-matching reconstruction at 1-pass-
    covered spreads, BOUNDED reconstruction degradation (<2e-3 relative)
    at tighter spreads, always finite; the sharp accuracy guarantee lives
    in the e2e pins (length ladder above + the symmetric-Z cliff test)."""
    from yaqs_tpu.ops.decomp import split_matrix_subspace

    chi = 32
    m = _spectrum_matrix(kept_spread, chi)
    left, right, _, _ = split_matrix_subspace(
        jnp.asarray(m), chi, iters=iters, qr_method="newton", svd_distribution=dist
    )
    out = np.asarray(left) @ np.asarray(right)
    assert np.isfinite(out).all()
    recon = np.linalg.norm(out - m) / np.linalg.norm(m)
    u, s, vh = np.linalg.svd(m)
    exact = np.linalg.norm(u[:, :chi] * s[:chi] @ vh[:chi] - m) / np.linalg.norm(m)
    if kept_spread >= 1e-2:  # fully covered by one tuned pass
        iso = np.asarray(left) if dist == "right" else np.asarray(right).conj().T
        assert _ortho_err(iso) < 1e-4
        assert recon < max(1.2 * exact, 5e-6), (recon, exact)
    else:  # partial-isometry regime: bounded degradation (measured ~1.2e-3)
        assert recon < 2e-3, (recon, exact)


def test_subspace_newton_split_rank_deficient_harmless():
    """Padded product-state blocks (true rank far below chi): no NaN, exact
    reconstruction; the null padding may be a partial isometry (harmless)."""
    from yaqs_tpu.ops.decomp import split_matrix_subspace

    rng = np.random.default_rng(3)
    a = (rng.standard_normal((64, 2)) + 1j * rng.standard_normal((64, 2))).astype(np.complex64)
    b = (rng.standard_normal((2, 64)) + 1j * rng.standard_normal((2, 64))).astype(np.complex64)
    m = a @ b
    for iters in (1, 2):
        left, right, _, _ = split_matrix_subspace(
            jnp.asarray(m), 32, iters=iters, qr_method="newton"
        )
        out = np.asarray(left) @ np.asarray(right)
        assert np.isfinite(out).all()
        assert np.linalg.norm(out - m) / np.linalg.norm(m) < 1e-5


# ---------------------------------------------------------------- NS ladder
def _spread_matrix(spread, rows=24, cols=12, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((rows, cols)))
    s = np.logspace(0, np.log10(spread), cols)
    w, _ = np.linalg.qr(rng.standard_normal((cols, cols)))
    return u * s @ w


def _ortho_err(q):
    q = np.asarray(q)
    return np.linalg.norm(q.conj().T @ q - np.eye(q.shape[1]))


@pytest.mark.parametrize(
    "spread,passes,tol",
    [
        (1e-2, 1, 1e-5),   # 1 pass handles ~2 decades
        (1e-4, 2, 1e-6),   # 2 passes handle ~4 decades (the split's regime)
        (1e-6, 3, 1e-6),   # 3 passes handle ~6
    ],
)
def test_ns_pass_ladder(spread, passes, tol):
    q = newton_schulz_orthogonalize(_spread_matrix(spread), passes=passes)
    assert _ortho_err(q) < tol


def test_ns_extended_aggressive_lifts_in_float64():
    """More aggressive quintics DO extend coverage in float64 (no noise
    floor there) — this is the x64-only capability; complex64 use is
    forbidden by the measured e2e cliff (see the NS docstring)."""
    q = newton_schulz_orthogonalize(_spread_matrix(1e-4), passes=1, aggressive=7)
    assert _ortho_err(q) < 1e-5


def test_ns_one_pass_fails_wide_spread():
    """The defect mode: 1 pass on a 4-decade spread leaves a partial isometry
    (this is what produced the 1.9e-2 XXZ error)."""
    q = newton_schulz_orthogonalize(_spread_matrix(1e-4), passes=1)
    assert _ortho_err(q) > 0.1


def test_ns_rank_deficient_null_columns_preserved():
    """Zero columns stay exactly zero through any number of passes (TPU
    padded-state safety: no NaN, no garbage in the padding)."""
    rng = np.random.default_rng(1)
    y = np.concatenate(
        [np.linalg.qr(rng.standard_normal((24, 6)))[0], np.zeros((24, 6))], axis=1
    )
    for passes in (1, 2, 3):
        q = np.asarray(newton_schulz_orthogonalize(y, passes=passes))
        assert not np.isnan(q).any()
        assert np.linalg.norm(q[:, 6:]) == 0.0
        assert _ortho_err(q[:, :6].reshape(24, 6)) < 1e-6


def test_ns_isometry_is_fixed_point():
    rng = np.random.default_rng(2)
    q0, _ = np.linalg.qr(rng.standard_normal((16, 8)) + 1j * rng.standard_normal((16, 8)))
    for passes in (1, 2):
        q = np.asarray(newton_schulz_orthogonalize(q0, passes=passes))
        np.testing.assert_allclose(q, q0, atol=1e-10)
