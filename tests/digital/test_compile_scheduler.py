"""Digital compiler / half-layer scheduler unit tests.

Port of the reference's DAG-scheduling behaviors
(/root/reference/tests/digital/utils/test_dag_utils.py and the process_layer
suite in test_digital_tjm.py) onto the compiled half-layer representation:
disjoint-site batching, 1q-gate fusion, per-gate noise scoping, segment
splitting at SAMPLE_OBSERVABLES barriers, and window/MPO stage geometry.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.digital.circuit import Circuit, load_circuit
from yaqs_tpu.digital.compile import (
    CompiledSegment,
    GateStage,
    compile_circuit,
)
from yaqs_tpu.models.gates import gate_matrix


def only_segment(circ, mode="swaps") -> CompiledSegment:
    cc = compile_circuit(circ, mode)
    assert len(cc.segments) == 1
    segs = cc.segments[0].half_layer_stages
    assert len(segs) == 1
    return segs[0]


def test_disjoint_gates_share_half_layer():
    # cx(0,1) and cx(2,3) touch disjoint sites -> one half-layer
    c = Circuit(4)
    c.cx(0, 1)
    c.cx(2, 3)
    seg = only_segment(c)
    cx = gate_matrix("cx")
    np.testing.assert_allclose(seg.bond_mats[0, 0], cx, atol=1e-14)
    np.testing.assert_allclose(seg.bond_mats[0, 2], cx, atol=1e-14)
    # half-layer 1 is identity padding
    np.testing.assert_allclose(seg.bond_mats[1, 0], np.eye(4), atol=1e-14)


def test_overlapping_gates_stack_half_layers():
    c = Circuit(3)
    c.cx(0, 1)
    c.cx(1, 2)  # shares site 1 -> next half-layer
    seg = only_segment(c)
    cx = gate_matrix("cx")
    np.testing.assert_allclose(seg.bond_mats[0, 0], cx, atol=1e-14)
    np.testing.assert_allclose(seg.bond_mats[1, 1], cx, atol=1e-14)
    np.testing.assert_allclose(seg.bond_mats[0, 1], np.eye(4), atol=1e-14)


def test_consecutive_1q_gates_fuse():
    # h then s on the same site fuse into one matrix product (s @ h)
    c = Circuit(2)
    c.h(0)
    c.append("s", (0,))
    seg = only_segment(c)
    h, s = gate_matrix("h"), gate_matrix("s")
    np.testing.assert_allclose(seg.mats1q[0, 0], s @ h, atol=1e-14)


def test_1q_after_2q_lands_in_next_half_layer():
    c = Circuit(2)
    c.cx(0, 1)
    c.h(0)
    seg = only_segment(c)
    np.testing.assert_allclose(seg.mats1q[0, 0], np.eye(2), atol=1e-14)
    np.testing.assert_allclose(seg.mats1q[1, 0], gate_matrix("h"), atol=1e-14)


def test_noise_scope_per_gate():
    # noise mask marks exactly the sites of the 2q gates in each half-layer
    c = Circuit(4)
    c.cx(0, 1)
    c.cx(2, 3)
    c.cx(1, 2)
    cc = compile_circuit(c, "swaps")
    seg = cc.segments[0].half_layer_stages[0]
    np.testing.assert_allclose(seg.noise_site_mask[0], [1, 1, 1, 1])
    np.testing.assert_allclose(seg.noise_site_mask[1], [0, 1, 1, 0])
    assert seg.gate_scopes[0] == [(0, 1), (2, 3)]
    assert seg.gate_scopes[1] == [(1, 2)]


def test_sample_barrier_splits_segments():
    c = Circuit(3)
    c.h(0)
    c.sample_observables()
    c.cx(0, 1)
    cc = compile_circuit(c, "swaps")
    assert len(cc.segments) == 2


def test_leading_and_trailing_barriers_make_empty_segments():
    c = Circuit(2)
    c.sample_observables()
    c.h(0)
    c.sample_observables()
    cc = compile_circuit(c, "swaps")
    # column before the h, column after: 3 segments (first is empty)
    assert len(cc.segments) == 3


def test_measured_qubits_recorded():
    c = Circuit(3)
    c.h(0)
    c.measure([0, 2])
    cc = compile_circuit(c, "swaps")
    assert cc.measured_qubits == [0, 2]


def test_qasm_measure_all_records_all():
    qasm = """OPENQASM 2.0;
include "qelib1.inc";
qreg q[3];
creg c[3];
h q[0];
measure q -> c;
"""
    cc = compile_circuit(load_circuit(qasm), "swaps")
    assert sorted(cc.measured_qubits) == [0, 1, 2]


def test_long_range_swap_routing_layer_count():
    # cx(0,3) in swaps mode: routed with swap chains, all in layer stages
    c = Circuit(4)
    c.cx(0, 3)
    cc = compile_circuit(c, "swaps")
    stages = cc.segments[0].stages
    assert all(isinstance(s, CompiledSegment) for s in stages)
    # forward swaps (2), gate, backward swaps (2) -> at least 5 half-layers
    total_hl = sum(s.bond_mats.shape[0] for s in stages)
    assert total_hl >= 5


def test_window_stage_geometry():
    # tdvp mode on a long-range rzz: window spans [lo-1, hi+1] clamped
    c = Circuit(6)
    c.append("rzz", (1, 4), params=(0.5,))
    cc = compile_circuit(c, "tdvp")
    stages = [s for p in cc.segments for s in p.stages if isinstance(s, GateStage)]
    assert len(stages) == 1
    st = stages[0]
    assert st.kind == "window"
    assert st.w0 == 0  # 1-1
    assert st.mpo.shape[0] == 6  # sites 0..5
    assert st.noise_sites == (1, 4)


def test_window_clamps_at_chain_edges():
    c = Circuit(4)
    c.append("rzz", (0, 3), params=(0.5,))
    cc = compile_circuit(c, "tdvp")
    st = [s for p in cc.segments for s in p.stages if isinstance(s, GateStage)][0]
    assert st.w0 == 0
    assert st.mpo.shape[0] == 4


def test_mpo_stage_descending_qubits_permuted():
    # mpo mode with descending listed qubits must permute the matrix so the
    # stored window MPO reproduces the dense gate
    from yaqs_tpu.core.mpo_builders import mpo_to_matrix
    from yaqs_tpu.models.gates import permute_qubits

    c = Circuit(4)
    c.cx(3, 1)  # control above target
    cc = compile_circuit(c, "mpo")
    st = [s for p in cc.segments for s in p.stages if isinstance(s, GateStage)][0]
    assert st.kind == "mpo"
    assert st.w0 == 1
    got = mpo_to_matrix(st.mpo)
    # dense oracle on the 3-site window (sites 1..3), listed (3, 1)
    cx = gate_matrix("cx")
    expect = np.kron(np.eye(2), np.eye(8))  # placeholder shape
    # build: control = window site 2 (global 3), target = window site 0 (global 1)
    m = permute_qubits(cx, (1, 0))  # listed ascending (1, 3) -> target first
    # embed on window of 3 sites: qubits (0, 2) of the window, first listed most significant
    t = m.reshape(2, 2, 2, 2)
    full = np.einsum("abcd,ef->aebcfd", t, np.eye(2)).reshape(8, 8)
    # aebcfd: out (q2=b? ...) — verify against direct statevector application
    psi = np.random.default_rng(0).normal(size=8) + 0j
    from pathlib import Path
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_engine import dense_apply

    expect_psi = dense_apply(psi, cx, [2, 0], 3)
    np.testing.assert_allclose(got @ psi, expect_psi, atol=1e-12)


def test_three_qubit_gate_mpo_stage_matches_dense():
    from yaqs_tpu.core.mpo_builders import mpo_to_matrix
    from pathlib import Path
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_engine import dense_apply

    c = Circuit(5)
    c.append("ccx", (1, 2, 3))
    cc = compile_circuit(c, "swaps")  # 3q always routes to an MPO stage
    st = [s for p in cc.segments for s in p.stages if isinstance(s, GateStage)][0]
    assert st.kind == "mpo"
    got = mpo_to_matrix(st.mpo)
    psi = np.random.default_rng(1).normal(size=8) + 0j
    expect_psi = dense_apply(psi, gate_matrix("ccx"), [0, 1, 2], 3)
    np.testing.assert_allclose(got @ psi, expect_psi, atol=1e-12)


def test_unknown_gate_mode_raises():
    c = Circuit(2)
    with pytest.raises(ValueError, match="gate_mode"):
        compile_circuit(c, "warp")
