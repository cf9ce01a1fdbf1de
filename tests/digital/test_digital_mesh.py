"""Digital engine on the device mesh: device-count / chunking invariance.

The digital trajectory batch is sharded over the ``traj`` mesh exactly like
the analog runtime (reference parity: digital workers run through the same
parallel pool as analog, simulator.py:853 + core/parallel_utils.py:331-391).
All RNG keys derive from the GLOBAL trajectory index, so observables,
trajectories, measurements, and counts must be bit-identical for any device
count and any ``batch_size`` chunking — the digital analogue of
tests/core/test_runtime.py.

Runs on the conftest's virtual 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from yaqs_tpu import DigitalSimParams, NoiseModel, Observable, Simulator, State
from yaqs_tpu.digital.circuit import Circuit


def _brickwork(n: int, layers: int = 3) -> Circuit:
    c = Circuit(n)
    for i in range(n):
        c.h(i)
    for layer in range(layers):
        for i in range(layer % 2, n - 1, 2):
            c.cx(i, i + 1)
        for i in range(n):
            c.rz(i, params=(0.3 + 0.1 * i,))
    c.measure()
    return c


def _noise(n: int) -> NoiseModel:
    return NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.08} for i in range(n)]
    )


def _params(**kw) -> DigitalSimParams:
    base = dict(
        observables=[Observable("z", i) for i in range(5)],
        num_traj=20,
        max_bond_dim=8,
        random_seed=11,
        shots=13,
        sample_layers=True,
    )
    base.update(kw)
    return DigitalSimParams(**base)


@pytest.fixture(scope="module")
def reference_run():
    n = 5
    sim = Simulator(parallel=True)
    return sim.run(State(n), _brickwork(n), _params(), _noise(n))


def test_mesh_uses_all_devices():
    assert len(jax.devices()) == 8, "conftest must provide the 8-device mesh"


def test_one_device_bit_identity(reference_run):
    n = 5
    res1 = Simulator(parallel=False).run(State(n), _brickwork(n), _params(), _noise(n))
    np.testing.assert_array_equal(reference_run.trajectories, res1.trajectories)
    np.testing.assert_array_equal(reference_run.measurements, res1.measurements)
    assert reference_run.counts == res1.counts


@pytest.mark.parametrize("batch_size", [3, 7, 8, 20])
def test_chunking_bit_identity(reference_run, batch_size):
    n = 5
    res = Simulator(parallel=True, batch_size=batch_size).run(
        State(n), _brickwork(n), _params(), _noise(n)
    )
    np.testing.assert_array_equal(reference_run.trajectories, res.trajectories)
    np.testing.assert_array_equal(reference_run.measurements, res.measurements)
    assert reference_run.counts == res.counts


def test_explicit_device_subset(reference_run):
    n = 5
    res = Simulator(devices=jax.devices()[:2]).run(
        State(n), _brickwork(n), _params(), _noise(n)
    )
    np.testing.assert_array_equal(reference_run.trajectories, res.trajectories)
    assert reference_run.counts == res.counts


def test_uneven_batch_padding(reference_run):
    """num_traj not a device multiple: padded dummies are sliced off."""
    n = 5
    p = _params(num_traj=13, shots=0)
    res8 = Simulator(parallel=True).run(State(n), _brickwork(n), p, _noise(n))
    res1 = Simulator(parallel=False).run(State(n), _brickwork(n), p, _noise(n))
    assert res8.trajectories.shape[0] == 13
    np.testing.assert_array_equal(res8.trajectories, res1.trajectories)


def test_shots_only_path_device_invariant():
    """Noisy shots-only (num_traj = shots): one shot per trajectory."""
    n = 4
    c = _brickwork(n, layers=2)
    p = DigitalSimParams(num_traj=1, max_bond_dim=8, random_seed=5, shots=19)
    r8 = Simulator(parallel=True).run(State(n), c, p, _noise(n))
    r1 = Simulator(parallel=False).run(State(n), c, p, _noise(n))
    assert sum(r8.counts.values()) == 19
    assert r8.counts == r1.counts
    np.testing.assert_array_equal(r8.measurements, r1.measurements)


def test_noiseless_single_trajectory_unsharded():
    """Noiseless runs collapse to one trajectory; mesh must be a no-op."""
    n = 5
    c = _brickwork(n)
    p = _params(shots=64, num_traj=50)  # num_traj ignored when noiseless
    r8 = Simulator(parallel=True).run(State(n), c, p, None)
    r1 = Simulator(parallel=False).run(State(n), c, p, None)
    assert r8.trajectories.shape[0] == 1
    np.testing.assert_array_equal(r8.trajectories, r1.trajectories)
    assert r8.counts == r1.counts


def test_gate_stage_path_device_invariant():
    """Long-range gates (GateStage pipeline) under the mesh."""
    n = 6
    c = Circuit(n)
    c.h(0)
    c.cx(0, n - 1)  # long-range -> mpo/window stage
    p = DigitalSimParams(
        observables=[Observable("z", i) for i in range(n)],
        num_traj=16,
        max_bond_dim=8,
        random_seed=3,
        gate_mode="mpo",
    )
    r8 = Simulator(parallel=True).run(State(n), c, p, _noise(n))
    r1 = Simulator(parallel=False).run(State(n), c, p, _noise(n))
    np.testing.assert_array_equal(r8.trajectories, r1.trajectories)


@pytest.mark.slow
def test_production_shape_bit_identity():
    """Bench-shape digital mesh coverage (VERDICT r4 #4): the BENCH config-3
    circuit at n=20, chi=32, 8-layer noisy brickwork with the mid-circuit
    observable column and gate_mode=swaps — 8-vs-1 bit identity through
    Simulator.run at a real workload, not a toy."""
    from yaqs_tpu.digital.circuit import GateOp, load_circuit

    n, layers = 20, 8
    lines = ["OPENQASM 2.0;", 'include "qelib1.inc";', f"qreg q[{n}];",
             f"creg c[{n}];"]
    for layer in range(layers):
        for q in range(n):
            lines.append(f"rx({0.3 + 0.01 * q}) q[{q}];")
        for q in range(layer % 2, n - 1, 2):
            lines.append(f"cx q[{q}],q[{q + 1}];")
    lines.append("measure q -> c;")
    circ = load_circuit("\n".join(lines))
    circ.ops.insert(len(circ.ops) // 2, GateOp("barrier", (), label="SAMPLE_OBSERVABLES"))
    noise = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.02} for i in range(n)]
    )

    def params():
        return DigitalSimParams(
            observables=[Observable("z", i) for i in range(n)],
            num_traj=8,
            shots=16,
            max_bond_dim=32,
            sample_layers=True,
            random_seed=3,
            gate_mode="swaps",
        )

    r8 = Simulator(parallel=True).run(State(n), circ, params(), noise)
    r1 = Simulator(parallel=False).run(State(n), circ, params(), noise)
    np.testing.assert_array_equal(r8.trajectories, r1.trajectories)
    np.testing.assert_array_equal(r8.measurements, r1.measurements)
    assert r8.counts == r1.counts
    assert np.all(np.isfinite(r8.trajectories))


def test_max_retries_accepted():
    n = 4
    p = _params(num_traj=8, shots=0)
    res = Simulator(parallel=True, max_retries=2).run(
        State(n), _brickwork(n, 2), p, _noise(n)
    )
    assert res.trajectories.shape[0] == 8
