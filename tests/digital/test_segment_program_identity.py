"""apply_segment (single program) vs make_half_layer_step (per-dispatch).

The TPU path drives half-layers one dispatch at a time because the tunneled
backend cannot lower a whole multi-half-layer segment (platform rule 8);
apply_segment remains the single-program variant.  Their documented contract
is IDENTICAL operation order — pinned here as bitwise identity on noisy and
noiseless segments, batched, across gate-count-varying layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yaqs_tpu.core import mps_ops
from yaqs_tpu.core.noise_model import NoiseModel, compile_noise
from yaqs_tpu.digital.circuit import Circuit
from yaqs_tpu.digital.compile import CompiledSegment, compile_circuit
from yaqs_tpu.digital.engine import (
    _channel_scope_masks,
    apply_segment,
    make_half_layer_step,
)
from yaqs_tpu.methods.tdvp import TDVPConfig


def _segment(n=4, layers=3):
    c = Circuit(n)
    for i in range(n):
        c.h(i)
    for layer in range(layers):
        for i in range(layer % 2, n - 1, 2):
            c.cx(i, i + 1)
        for i in range(n):
            c.rz(i, params=(0.2 + 0.1 * i,))
    compiled = compile_circuit(c)
    (plan,) = compiled.segments
    (seg,) = [s for s in plan.stages if isinstance(s, CompiledSegment)]
    return seg


@pytest.mark.parametrize("noisy", [False, True])
def test_segment_vs_half_layer_driving_bit_identical(noisy):
    n, chi, batch = 4, 8, 3
    seg = _segment(n)
    cfg = TDVPConfig(krylov_dim=4, threshold=1e-9, max_bond_dim=chi)
    noise = (
        compile_noise(
            NoiseModel(
                [{"name": "lowering", "sites": [i], "strength": 0.08} for i in range(n)]
            ),
            n,
            2,
        )
        if noisy
        else None
    )
    t0 = mps_ops.named_product_state("zeros", n, chi).astype(np.complex128)
    tensors_b = jnp.broadcast_to(jnp.asarray(t0)[None], (batch,) + t0.shape)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(5), i))(
        jnp.arange(batch)
    )

    scope, bond_masks = _channel_scope_masks(seg, noise)
    ch_scope = None if scope is None else jnp.asarray(scope)

    # single-program variant, vmapped over the batch with per-trajectory keys
    def one(t, k):
        return apply_segment(
            t,
            seg.mats1q,
            seg.bond_mats,
            jnp.asarray(seg.noise_site_mask),
            noise,
            ch_scope,
            k,
            cfg,
            noisy,
            None if bond_masks is None else jnp.asarray(bond_masks),
        )

    out_single = np.asarray(jax.vmap(one)(tensors_b, keys))

    # per-dispatch variant (the production TPU path)
    hl_full, hl_noiseless, hl_nobond = make_half_layer_step(noise, cfg, noisy)
    n_hl = seg.mats1q.shape[0]
    hl_keys = jax.vmap(lambda k: jax.random.split(k, n_hl))(keys)
    tb = tensors_b
    for h in range(n_hl):
        if not noisy:
            tb = hl_noiseless(
                tb, jnp.asarray(seg.mats1q[h]), jnp.asarray(seg.bond_mats[h]),
                hl_keys[:, h],
            )
        else:
            tb = hl_nobond(
                tb, jnp.asarray(seg.mats1q[h]), jnp.asarray(seg.bond_mats[h]),
                jnp.asarray(seg.noise_site_mask[h]), jnp.asarray(scope[h]),
                hl_keys[:, h],
            )
    out_stepped = np.asarray(tb)

    np.testing.assert_array_equal(out_single, out_stepped)
    assert np.isfinite(out_single).all()


def test_stepped_variant_statevector_matches_dense_noiseless():
    """And the shared operation order is CORRECT: noiseless replay equals
    the dense circuit unitary on the statevector."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_engine import run_dense

    n, chi = 4, 8
    c = Circuit(n)
    for i in range(n):
        c.h(i)
    c.cx(0, 1)
    c.cx(2, 3)
    c.cx(1, 2)
    for i in range(n):
        c.rz(i, params=(0.3,))
    compiled = compile_circuit(c)
    (seg,) = [
        s for s in compiled.segments[0].stages if isinstance(s, CompiledSegment)
    ]
    cfg = TDVPConfig(krylov_dim=4, threshold=1e-12, max_bond_dim=chi)
    hl_full, hl_noiseless, _ = make_half_layer_step(None, cfg, False)
    t0 = mps_ops.named_product_state("zeros", n, chi).astype(np.complex128)
    tb = jnp.asarray(t0)[None]
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    n_hl = seg.mats1q.shape[0]
    hl_keys = jax.vmap(lambda k: jax.random.split(k, n_hl))(keys)
    for h in range(n_hl):
        tb = hl_noiseless(
            tb, jnp.asarray(seg.mats1q[h]), jnp.asarray(seg.bond_mats[h]),
            hl_keys[:, h],
        )
    psi = np.asarray(mps_ops.to_statevector(tb[0]))
    psi0 = np.zeros(2**n, dtype=complex)
    psi0[0] = 1.0
    ref = run_dense(c, psi0)
    # global phase free
    ov = np.vdot(ref, psi)
    np.testing.assert_allclose(abs(ov), 1.0, atol=1e-9)
