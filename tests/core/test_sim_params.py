"""Simulation-parameter plumbing: presets, validation, fast-path knobs."""

from __future__ import annotations

import pytest

from yaqs_tpu.core.sim_params import (
    SIMULATION_PRESETS,
    AnalogSimParams,
    DigitalSimParams,
    Observable,
)


def test_presets_apply_and_override():
    p = AnalogSimParams(observables=[Observable("z", 0)], elapsed_time=0.2, dt=0.1)
    assert p.max_bond_dim == SIMULATION_PRESETS["balanced"]["max_bond_dim"]
    q = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.2, dt=0.1,
        preset="fast", num_traj=7, krylov_dim=3,
    )
    assert q.max_bond_dim == 16 and q.num_traj == 7 and q.krylov_dim == 3


def test_time_grid_validation():
    with pytest.raises(ValueError, match="integer multiple"):
        AnalogSimParams(observables=[], elapsed_time=0.25, dt=0.1)
    with pytest.raises(ValueError, match="dt"):
        AnalogSimParams(observables=[], elapsed_time=0.2, dt=-0.1)


def test_fast_path_knobs_thread_into_tdvp_config():
    p = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.2, dt=0.1,
        svd_method="subspace", subspace_iters=1, lanczos_reorth=False,
        subspace_qr="newton", canon_method="newton",
    )
    kw = p.fast_path_kwargs()
    from yaqs_tpu.methods.tdvp import TDVPConfig

    cfg = TDVPConfig(**kw)
    assert cfg.svd_method == "subspace"
    assert cfg.subspace_iters == 1
    assert cfg.lanczos_reorth is False
    assert cfg.subspace_qr == "newton"
    assert cfg.canon_method == "newton"
    # defaults reproduce the reference-exact linear algebra on CPU/x64
    d = DigitalSimParams(observables=[Observable("z", 0)])
    assert d.fast_path_kwargs() == {
        "svd_method": "exact",
        "subspace_iters": 2,
        "lanczos_reorth": True,
        "subspace_qr": "householder",
        "canon_method": "qr",
    }


def test_fast_path_auto_selects_validated_fast_config_on_tpu(monkeypatch):
    """Pin the backend auto-selection (accuracy guard for VERDICT item 5):
    a default-config run on TPU/complex64 must get the validated fast path
    (8.4e-5 vs x64 golden, docs/tpu_numerics.md); explicit knobs still win."""
    import jax

    import yaqs_tpu.core.sim_params as sp

    p = AnalogSimParams(observables=[Observable("z", 0)], elapsed_time=0.2, dt=0.1)
    orig_read = jax.config.read
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        jax.config,
        "read",
        lambda name: False if name == "jax_enable_x64" else orig_read(name),
    )
    assert p.fast_path_kwargs() == sp._FAST_PATH_TPU
    # user-set knobs are never overridden by the auto-selection
    q = AnalogSimParams(
        observables=[Observable("z", 0)], elapsed_time=0.2, dt=0.1,
        svd_method="exact", canon_method="qr",
    )
    kw = q.fast_path_kwargs()
    assert kw["svd_method"] == "exact"
    assert kw["canon_method"] == "qr"
    # unset knobs in the same params still resolve to the TPU defaults
    assert kw["subspace_qr"] == "newton"


def test_fast_path_validation():
    with pytest.raises(ValueError, match="svd_method"):
        AnalogSimParams(observables=[], elapsed_time=0.1, dt=0.1, svd_method="nope")
    with pytest.raises(ValueError, match="canon_method"):
        DigitalSimParams(observables=[], canon_method="nope")


def test_observable_sorting_user_order_restored():
    obs = [Observable("z", 3), Observable("x", 0), Observable("z", 1)]
    p = AnalogSimParams(observables=obs, elapsed_time=0.1, dt=0.1)
    srt = p.sorted_observables
    assert [o.site_list[0] for o in srt] == [0, 1, 3]
    idx = p.observable_sorted_indices
    # user order i maps to sorted row idx[i]
    for i, o in enumerate(obs):
        assert srt[idx[i]] is o
