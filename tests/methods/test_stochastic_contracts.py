"""Stochastic-machinery contracts: ordering invariance, normalization
bookkeeping, and rejection semantics.

Mirrors the reference's contract layer (/root/reference/tests/core/methods/
test_stochastic_process.py:331-585: order independence, zero/nonfinite weight
handling, non-adjacent non-Pauli rejection) with the stronger guarantees the
compiled-channel-table design makes possible: permuting the user's process
list changes NOTHING, bit for bit, because channels are emitted in canonical
site-sweep order (core/noise_model.py compile_noise docstring).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yaqs_tpu.analog.tjm import TrajectoryPlan, sample_key, tjm_trajectory, trajectory_key
from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.mpo_builders import ising_mpo
from yaqs_tpu.core.noise_model import NoiseModel, compile_noise
from yaqs_tpu.core.observables import compile_observables
from yaqs_tpu.core.sim_params import Observable
from yaqs_tpu.methods.dissipation import apply_dissipation
from yaqs_tpu.methods.tdvp import TDVPConfig
from yaqs_tpu.models.operators import lowering, pauli_x, pauli_z

L, CHI = 4, 8

PROCESSES = [
    {"name": "lowering", "sites": [1], "strength": 0.3},
    {"name": "z", "sites": [2], "strength": 0.2},
    {"name": "x", "sites": [0], "strength": 0.15},
    {"name": "crosstalk_zz", "sites": [1, 2], "strength": 0.1},
    {"name": "crosstalk_xy", "sites": [0, 3], "strength": 0.05},  # long-range factored
]


def _tables_equal(a, b) -> bool:
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def test_channel_table_is_process_order_canonical():
    """compile_noise emits channels in site-sweep order: every permutation of
    the user's process list compiles to the identical table."""
    want = compile_noise(NoiseModel([dict(p) for p in PROCESSES]), L, 2)
    for perm in itertools.permutations(range(len(PROCESSES))):
        got = compile_noise(
            NoiseModel([dict(PROCESSES[i]) for i in perm]), L, 2
        )
        assert _tables_equal(want, got), perm


def test_trajectory_bitwise_invariant_under_process_permutation():
    """End to end: the same seed gives the bit-identical trajectory whatever
    order the user listed the noise processes in (stronger than the
    reference's order-independence, which is per-jump semantic only)."""
    w = ising_mpo(L, 1.0, 0.5)
    t0 = mps_ops.named_product_state("x+", L, CHI)
    obs = compile_observables([Observable("z", i) for i in range(L)], L, 2)
    plan = TrajectoryPlan(
        dt=0.1,
        num_steps=3,
        order=2,
        sample_timesteps=True,
        evolution=TDVPConfig(krylov_dim=5, threshold=1e-9, max_bond_dim=CHI),
    )
    base = jax.random.PRNGKey(2)
    tk, sk = trajectory_key(base, 0), sample_key(base, 0)

    def run(process_order):
        noise = compile_noise(NoiseModel([dict(p) for p in process_order]), L, 2)
        cols, _, state = jax.jit(
            lambda tk, sk: tjm_trajectory(tk, sk, t0, w, noise, obs, plan)
        )(tk, sk)
        return np.asarray(cols), np.asarray(state)

    cols_a, state_a = run(PROCESSES)
    cols_b, state_b = run(list(reversed(PROCESSES)))
    np.testing.assert_array_equal(cols_a, cols_b)
    np.testing.assert_array_equal(state_a, state_b)


def test_zero_strength_model_compiles_to_none():
    nm = NoiseModel([{"name": "z", "sites": [0], "strength": 0.0}])
    assert compile_noise(nm, L, 2) is None
    assert compile_noise(None, L, 2) is None


def test_duplicate_processes_accumulate():
    """Listing a process twice doubles its rate: the dissipation norm decay
    of {gamma, gamma} matches a single {2 gamma} channel exactly."""
    single = NoiseModel([{"name": "lowering", "sites": [1], "strength": 0.4}])
    doubled = NoiseModel(
        [
            {"name": "lowering", "sites": [1], "strength": 0.2},
            {"name": "lowering", "sites": [1], "strength": 0.2},
        ]
    )
    t0 = mps_ops.named_product_state("ones", L, CHI)
    cfg = TDVPConfig(krylov_dim=4, threshold=1e-9, max_bond_dim=CHI)

    def decayed_norm(nm):
        noise = compile_noise(nm, L, 2)
        out = jax.jit(lambda: apply_dissipation(jnp.asarray(t0), noise, 0.3, cfg))()
        return float(np.sqrt(mps_ops.norm_squared(jnp.asarray(out))))

    np.testing.assert_allclose(decayed_norm(single), decayed_norm(doubled), atol=1e-10)


def test_dissipation_norm_deficit_equals_jump_weight():
    """TJM bookkeeping invariant: dissipation leaves the state unnormalized
    with norm^2 = <psi| exp(-dt sum_k gamma_k L_k^dag L_k) ... |psi> computed
    densely — the deficit IS the jump probability mass."""
    gamma_low, gamma_z = 0.35, 0.2
    nm = NoiseModel(
        [
            {"name": "lowering", "sites": [1], "strength": gamma_low},
            {"name": "z", "sites": [2], "strength": gamma_z},
        ]
    )
    noise = compile_noise(nm, L, 2)
    dt = 0.25
    t0 = mps_ops.named_product_state("ones", L, CHI)
    cfg = TDVPConfig(krylov_dim=4, threshold=1e-9, max_bond_dim=CHI)
    out = jax.jit(lambda: apply_dissipation(jnp.asarray(t0), noise, dt, cfg))()
    got = float(np.sqrt(mps_ops.norm_squared(jnp.asarray(out)))) ** 2

    # dense oracle: |ones> under exp(-dt/2 sum gamma L^dag L) per side
    import scipy.linalg

    from yaqs_tpu.analog.embedding import embed_one_site

    dim = 2**L
    psi = np.zeros(dim, dtype=complex)
    psi[-1] = 1.0  # |1111>, site 0 least significant
    h_eff = gamma_low * embed_one_site(
        lowering.conj().T @ lowering, 1, L
    ) + gamma_z * embed_one_site(pauli_z.conj().T @ pauli_z, 2, L)
    decayed = scipy.linalg.expm(-dt / 2 * h_eff) @ psi
    want = float(np.vdot(decayed, decayed).real)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_descending_factored_sites_normalized_to_ascending():
    """A long-range factored Pauli process given with descending sites equals
    the ascending-order spelling (factors swapped internally)."""
    asc = compile_noise(
        NoiseModel([{"name": "crosstalk_xy", "sites": [0, 3], "strength": 0.2}]), L, 2
    )
    desc = compile_noise(
        NoiseModel([{"name": "crosstalk_yx", "sites": [3, 0], "strength": 0.2}]), L, 2
    )
    assert _tables_equal(asc, desc)


def test_custom_full_matrix_descending_rejected():
    mat = np.kron(pauli_x, pauli_z)
    with pytest.raises(ValueError, match="ascending"):
        NoiseModel(
            [{"name": "custom", "sites": [2, 1], "strength": 0.1, "matrix": mat}]
        )


def test_non_adjacent_full_matrix_rejected():
    """Non-adjacent two-site processes must come as factors, not a full
    matrix (reference stochastic_process.py raises for non-Pauli long
    range)."""
    mat = np.kron(pauli_x, pauli_x)
    with pytest.raises(ValueError, match="[Nn]on-adjacent|factors"):
        NoiseModel(
            [{"name": "custom", "sites": [0, 3], "strength": 0.1, "matrix": mat}]
        )


def test_nonfinite_strength_rejected():
    for bad in (float("nan"), float("inf")):
        with pytest.raises(ValueError):
            NoiseModel([{"name": "z", "sites": [0], "strength": bad}])


def test_out_of_range_sites_rejected_at_compile():
    nm = NoiseModel([{"name": "z", "sites": [7], "strength": 0.1}])
    with pytest.raises((ValueError, IndexError)):
        compile_noise(nm, L, 2)
