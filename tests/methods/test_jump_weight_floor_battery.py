"""Jump-channel weight noise-floor regression battery (round-5 hardware fix).

In complex64 a channel whose TRUE weight is zero reads ~1e-7 moment noise;
sampling it applies a near-annihilating operator and the renormalization
cascade overflows (hardware: 3/128 non-finite L=200 trajectories before the
floor, 0/128 after).  These tests pin the floor's semantics on CPU: channels
with exactly-zero or sub-floor weight are never sampled, annihilating
channels never produce non-finite states, and physical jump statistics are
untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.noise_model import NoiseModel, compile_noise
from yaqs_tpu.methods.stochastic import stochastic_process
from yaqs_tpu.methods.tdvp import TDVPConfig


def _state(bits: str, chi=4):
    """Product basis state |bits> as padded tensors."""
    L = len(bits)
    t = np.zeros((L, 2, chi, chi), dtype=np.complex128)
    for i, b in enumerate(bits):
        t[i, int(b), 0, 0] = 1.0
    return jnp.asarray(t)


def _cfg():
    return TDVPConfig(krylov_dim=4, threshold=1e-9, max_bond_dim=4)


def test_annihilating_channel_never_selected_zero_state():
    """lowering on |0> has exactly zero weight: across many keys the step
    never applies it and every output stays finite and normalized."""
    L = 3
    noise = compile_noise(
        NoiseModel(
            [{"name": "lowering", "sites": [i], "strength": 5.0} for i in range(L)]
        ),
        L,
        2,
    )
    t = _state("000")
    for k in range(64):
        out, jumped = stochastic_process(t, noise, 0.5, jax.random.PRNGKey(k), _cfg())
        arr = np.asarray(out)
        assert np.isfinite(arr).all(), k
        psi = np.asarray(mps_ops.to_statevector(out))
        np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-9)
        # |000> is dark for pure lowering: the state must be unchanged
        np.testing.assert_allclose(abs(psi[0]), 1.0, atol=1e-9)
        assert not bool(np.asarray(jumped))


def test_mixed_dark_and_active_channels_select_only_active():
    """Site 1 in |1> (active), sites 0/2 in |0> (dark): jumps only ever hit
    the active channel; output finite and normalized."""
    L = 3
    noise = compile_noise(
        NoiseModel(
            [{"name": "lowering", "sites": [i], "strength": 3.0} for i in range(L)]
        ),
        L,
        2,
    )
    from yaqs_tpu.methods.dissipation import apply_dissipation

    # TJM semantics: the jump probability is the norm DEFICIT left by the
    # dissipative half-step — feed the dissipated (unnormalized) state
    t = apply_dissipation(_state("010"), noise, 0.3)
    jumped_any = False
    for k in range(64):
        out, jumped = stochastic_process(t, noise, 0.3, jax.random.PRNGKey(k), _cfg())
        psi = np.asarray(mps_ops.to_statevector(out))
        assert np.isfinite(psi).all()
        np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-9)
        if bool(np.asarray(jumped)):
            jumped_any = True
            # the only possible jump is lowering site 1: |010> -> |000>
            np.testing.assert_allclose(abs(psi[0]), 1.0, atol=1e-9)
    assert jumped_any  # with dt*gamma ~ 0.9 the jump fires often


def test_jump_statistics_unchanged_by_floor():
    """Physical channels (all weights comparable): the jump RATE matches the
    first-order norm-deficit expectation, floor or not."""
    L = 2
    gamma, dt = 0.8, 0.25
    noise = compile_noise(
        NoiseModel(
            [{"name": "z", "sites": [i], "strength": gamma} for i in range(L)]
        ),
        L,
        2,
    )
    # |++>: <Z^dag Z> = 1 per site -> dp = 1 - exp(-L*gamma*dt) after a
    # dissipative half step; here we feed the post-dissipation state directly
    from yaqs_tpu.methods.dissipation import apply_dissipation

    t0 = mps_ops.named_product_state("x+", L, 4).astype(np.complex128)
    t_diss = apply_dissipation(jnp.asarray(t0), noise, dt)
    n_jump = 0
    n_tot = 400
    for k in range(n_tot):
        _, jumped = stochastic_process(
            t_diss, noise, dt, jax.random.PRNGKey(k), _cfg()
        )
        n_jump += int(np.asarray(jumped))
    expected = 1.0 - np.exp(-L * gamma * dt)
    rate = n_jump / n_tot
    assert abs(rate - expected) < 4 * np.sqrt(expected * (1 - expected) / n_tot)


def test_all_dark_channels_step_is_identity_up_to_gauge():
    """Every channel dark: no jump can fire even when the uniform draw says
    jump (total weight 0 -> the floor suppresses the decision)."""
    L = 2
    noise = compile_noise(
        NoiseModel(
            [{"name": "lowering", "sites": [i], "strength": 10.0} for i in range(L)]
        ),
        L,
        2,
    )
    t = _state("00")
    psi0 = np.asarray(mps_ops.to_statevector(t))
    for k in range(32):
        out, jumped = stochastic_process(t, noise, 1.0, jax.random.PRNGKey(k), _cfg())
        assert not bool(np.asarray(jumped))
        psi = np.asarray(mps_ops.to_statevector(out))
        np.testing.assert_allclose(abs(np.vdot(psi0, psi)), 1.0, atol=1e-9)


def test_mcwf_dark_channels_never_produce_nonfinite():
    """The dense MCWF path carries the same floor: lowering channels on
    |0...0> are dark; trajectories stay finite and the state stays |0...0>
    for every seed."""
    from yaqs_tpu import AnalogSimParams, Hamiltonian, NoiseModel, Observable, Simulator, State

    L = 2
    p = AnalogSimParams(
        observables=[Observable("z", i) for i in range(L)],
        elapsed_time=0.5, dt=0.1, num_traj=8, random_seed=3,
        sample_timesteps=True,
    )
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 2.0} for i in range(L)]
    )
    res = Simulator().run(
        State(L, representation="vector"), Hamiltonian.ising(L, 0.0, 0.0), p, nm
    )
    ev = np.asarray(res.expectation_values)
    assert np.isfinite(ev).all()
    np.testing.assert_allclose(ev, 1.0, atol=1e-8)  # |00> stays dark
