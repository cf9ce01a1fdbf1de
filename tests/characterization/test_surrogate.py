"""Transformer surrogate: trains to predict process responses."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from yaqs_tpu import Hamiltonian
from yaqs_tpu.characterization.memory.exact import ExactBackend
from yaqs_tpu.characterization.memory.interventions import sample_intervention
from yaqs_tpu.characterization.memory.surrogate import (
    pack_rho8,
    sample_dataset,
    train_surrogate,
    unpack_rho8,
)
from yaqs_tpu.memory_characterizer import MemoryCharacterizer


def test_rho8_roundtrip():
    rho = np.array([[0.7, 0.1 + 0.2j], [0.1 - 0.2j, 0.3]], dtype=complex)
    np.testing.assert_allclose(unpack_rho8(pack_rho8(rho)), rho, atol=1e-7)


def test_surrogate_learns_process():
    ham = Hamiltonian.ising(3, 1.0, 0.5)
    tau, k = 0.3, 2
    data = sample_dataset(ham, num_interventions=k, tau=tau, num_sequences=384, seed=0)
    surrogate = train_surrogate(data, epochs=100, seed=0)

    # evaluate on fresh sequences against the exact backend
    rng = np.random.default_rng(99)
    seqs = [[sample_intervention(rng) for _ in range(k)] for _ in range(32)]
    pred = surrogate.evaluate_probes(seqs)
    backend = ExactBackend(ham, tau)
    kraus = np.stack([[iv.kraus for iv in s] for s in seqs])
    exact = backend.evaluate_kraus_sequences(kraus)
    err = np.abs(pred - exact).max(axis=(1, 2))
    assert np.median(err) < 0.15, np.median(err)


def test_memory_characterizer_surrogate_workflow():
    ham = Hamiltonian.ising(2, 1.0, 0.5)
    mc = MemoryCharacterizer(preset="quick")
    data = mc.sample(ham, num_interventions=2, tau=0.3, num_sequences=128, seed=1)
    surrogate = mc.train(data, epochs=50, seed=1)
    res = mc.characterize(surrogate, seed=5)
    assert np.isfinite(res.entropy)
