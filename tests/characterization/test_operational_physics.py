"""Operational memory characterization: physics-level contracts.

Mirrors the reference's operational-memory run battery
(/root/reference/tests/characterization/memory/operational_memory/test_run.py
and backends/test_exact.py: delay geometry, backend interchangeability,
weight handling, trivial-dynamics oracles) with independent physics oracles:
decoupled dynamics must read zero memory, coherent cross-cut coupling must
not, and the exact backend and exhaustive process-tensor tomography must
agree on the same Hamiltonian.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import Hamiltonian
from yaqs_tpu.characterization.memory.exact import ExactBackend
from yaqs_tpu.characterization.memory.operational import (
    run_memory_characterization,
    sample_probes,
)
from yaqs_tpu.characterization.memory.process_tensor import build_process_tensor

CUT, K = 1, 3


def _entropy(backend, *, seed=0, delay=0, use_weights=False, n=24):
    return run_memory_characterization(
        backend=backend,
        cut=CUT,
        num_interventions=K,
        n_pasts=n,
        n_futures=n,
        rng=np.random.default_rng(seed),
        delay=delay,
        use_weights=use_weights,
    )


def test_decoupled_dynamics_has_zero_memory():
    """J=0 Ising: sites never talk, so the past cannot inform the future
    through the environment — operational entropy ~ 0."""
    ham = Hamiltonian.ising(3, 0.0, 0.9)
    res = _entropy(ExactBackend(ham, tau=0.5))
    assert res.entropy < 0.02, res.entropy
    assert res.modes <= 1


def test_coupled_dynamics_has_memory():
    ham = Hamiltonian.ising(3, 1.2, 0.5)
    res = _entropy(ExactBackend(ham, tau=0.5))
    assert res.entropy > 0.1, res.entropy


def test_zero_tau_is_memoryless():
    """tau=0: the propagator is the identity, environment correlations never
    build up between interventions."""
    ham = Hamiltonian.ising(3, 1.2, 0.5)
    res = _entropy(ExactBackend(ham, tau=0.0))
    assert res.entropy < 0.02, res.entropy


def test_delay_zero_matches_default_bitwise():
    ham = Hamiltonian.ising(3, 0.8, 0.4)
    backend = ExactBackend(ham, tau=0.4)
    a = _entropy(backend, seed=7, delay=0)
    b = run_memory_characterization(
        backend=backend,
        cut=CUT,
        num_interventions=K,
        n_pasts=24,
        n_futures=24,
        rng=np.random.default_rng(7),
    )
    np.testing.assert_array_equal(a.response_matrix, b.response_matrix)
    assert a.entropy == b.entropy


def test_delay_decays_memory():
    """Break slots between past and future let the environment correlations
    disperse: entropy at large delay <= entropy at zero delay (physically a
    monotone trend; asserted at the endpoints with slack)."""
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    backend = ExactBackend(ham, tau=0.35)
    e0 = _entropy(backend, seed=3, delay=0).entropy
    e3 = _entropy(backend, seed=3, delay=3).entropy
    assert e3 <= e0 + 0.05, (e0, e3)


def test_delay_requires_sequence_backend():
    ham = Hamiltonian.ising(2, 0.8, 0.4)
    pt = build_process_tensor(ham, num_interventions=K, tau=0.4)
    with pytest.raises(ValueError, match="delay"):
        _entropy(pt, delay=2)


def test_probe_set_mismatch_rejected():
    ham = Hamiltonian.ising(2, 0.8, 0.4)
    backend = ExactBackend(ham, tau=0.4)
    wrong = sample_probes(
        cut=CUT + 1,
        num_interventions=K + 1,
        n_pasts=4,
        n_futures=4,
        rng=np.random.default_rng(0),
    )
    with pytest.raises(ValueError, match="probe_set"):
        run_memory_characterization(
            backend=backend,
            cut=CUT,
            num_interventions=K,
            probe_set=wrong,
        )


def test_exact_and_process_tensor_backends_agree():
    """The same probes evaluated on the exact simulator and on the
    exhaustively tomographed process tensor must give the same response
    matrix (the PT is a lossless repackaging of the dynamics)."""
    ham = Hamiltonian.ising(2, 0.9, 0.6)
    tau = 0.45
    exact = ExactBackend(ham, tau)
    pt = build_process_tensor(ham, num_interventions=K, tau=tau)
    probes = sample_probes(
        cut=CUT,
        num_interventions=K,
        n_pasts=12,
        n_futures=12,
        rng=np.random.default_rng(5),
    )
    res_exact = run_memory_characterization(
        backend=exact, cut=CUT, num_interventions=K, probe_set=probes
    )
    res_pt = run_memory_characterization(
        backend=pt, cut=CUT, num_interventions=K, probe_set=probes
    )
    np.testing.assert_allclose(
        res_exact.response_matrix, res_pt.response_matrix, atol=1e-8
    )
    np.testing.assert_allclose(res_exact.entropy, res_pt.entropy, atol=1e-8)


def test_entropy_invariant_under_probe_relabeling():
    """Permuting past rows / future columns permutes the response matrix's
    rows/columns — the singular spectrum (and entropy) cannot move."""
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    backend = ExactBackend(ham, tau=0.4)
    probes = sample_probes(
        cut=CUT,
        num_interventions=K,
        n_pasts=10,
        n_futures=10,
        rng=np.random.default_rng(9),
    )
    base = run_memory_characterization(
        backend=backend, cut=CUT, num_interventions=K, probe_set=probes
    )
    perm = np.random.default_rng(1).permutation(10)
    import dataclasses

    shuffled = dataclasses.replace(
        probes,
        past_pairs=[probes.past_pairs[i] for i in perm],
        past_cut_meas=[probes.past_cut_meas[i] for i in perm],
    )
    res = run_memory_characterization(
        backend=backend, cut=CUT, num_interventions=K, probe_set=shuffled
    )
    np.testing.assert_allclose(
        np.sort(res.singular_values), np.sort(base.singular_values), atol=1e-9
    )
    np.testing.assert_allclose(res.entropy, base.entropy, atol=1e-9)


def test_weights_do_not_create_memory():
    """Branch-weighted assembly must not manufacture memory out of a
    decoupled process."""
    ham = Hamiltonian.ising(3, 0.0, 0.7)
    res = _entropy(ExactBackend(ham, tau=0.5), use_weights=True)
    assert res.entropy < 0.02, res.entropy


def test_markovian_noise_suppresses_memory():
    """Strong local dephasing between interventions destroys the coherent
    cross-cut correlations: entropy decreases vs the noiseless process."""
    from yaqs_tpu import NoiseModel

    ham = Hamiltonian.ising(2, 1.0, 0.5)
    nm = NoiseModel(
        [{"name": "z", "sites": [i], "strength": 4.0} for i in range(2)]
    )
    clean = _entropy(ExactBackend(ham, tau=0.5), seed=2)
    noisy = _entropy(ExactBackend(ham, tau=0.5, noise_model=nm), seed=2)
    assert noisy.entropy < clean.entropy + 1e-9, (clean.entropy, noisy.entropy)


def test_clifford_probe_style_detects_same_memory():
    """Entropy sign (zero vs nonzero) is probe-style independent."""
    coupled = Hamiltonian.ising(3, 1.2, 0.5)
    decoupled = Hamiltonian.ising(3, 0.0, 0.5)
    for ham, low in ((coupled, False), (decoupled, True)):
        res = run_memory_characterization(
            backend=ExactBackend(ham, tau=0.5),
            cut=CUT,
            num_interventions=K,
            n_pasts=24,
            n_futures=24,
            rng=np.random.default_rng(4),
            intervention_style="clifford",
        )
        if low:
            assert res.entropy < 0.02, res.entropy
        else:
            assert res.entropy > 0.1, res.entropy
