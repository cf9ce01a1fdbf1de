"""ASAP half-layer scheduler property battery (dense-unitary oracles).

The reference walks a qiskit DAG (tests/digital/utils/test_dag_utils.py); the
rebuild compiles circuits into fixed-shape half-layer programs
(yaqs_tpu/digital/compile.py).  These tests pin the *semantic contract* the
DAG layering guarantees there — gate order per qubit, commuting-reorder
safety, barrier fences, noise scoping — against exact dense unitaries:

- RECONSTRUCTION: replaying a compiled segment (per half-layer: 1q matrices,
  then the disjoint bond matrices — the engine's exact operation order,
  engine.py half_layer) must reproduce the sequential product of the
  circuit's gate embeddings to machine precision, for random circuits.
- STRUCTURE: within one half-layer all scheduled bonds are site-disjoint;
  per-qubit gate order is monotone in half-layer index.
- ROUTING: long-range/multi-qubit gates become the documented stage kinds
  per gate_mode (reference apply_two_qubit_gate routing, digital_tjm.py:394).
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu.digital.circuit import Circuit
from yaqs_tpu.digital.compile import (
    CompiledSegment,
    GateStage,
    compile_circuit,
)
from yaqs_tpu.models.gates import gate_matrix

# ---------------------------------------------------------------- dense oracle


def _embed_1q(m: np.ndarray, site: int, n: int) -> np.ndarray:
    out = np.array([[1.0]], dtype=complex)
    for s in range(n):
        out = np.kron(out, m if s == site else np.eye(2))
    return out


def _embed_bond(m4: np.ndarray, bond: int, n: int) -> np.ndarray:
    """(4,4) on sites (bond, bond+1), lower site most significant."""
    out = np.array([[1.0]], dtype=complex)
    s = 0
    while s < n:
        if s == bond:
            out = np.kron(out, m4)
            s += 2
        else:
            out = np.kron(out, np.eye(2))
            s += 1
    return out


def _embed_gate(name: str, qubits: tuple[int, ...], params, n: int) -> np.ndarray:
    """Embed a named gate on arbitrary (possibly descending) qubits; the gate
    matrix convention is first-listed-qubit-most-significant."""
    mat = gate_matrix(name, tuple(params))
    k = len(qubits)
    dim = 2**n
    full = np.zeros((dim, dim), dtype=complex)
    others = [q for q in range(n) if q not in qubits]
    for row in range(2**k):
        for col in range(2**k):
            amp = mat[row, col]
            if amp == 0:
                continue
            for rest in range(2 ** len(others)):
                bits_in = {}
                bits_out = {}
                for i, q in enumerate(qubits):  # first listed = most significant
                    bits_out[q] = (row >> (k - 1 - i)) & 1
                    bits_in[q] = (col >> (k - 1 - i)) & 1
                for i, q in enumerate(others):
                    b = (rest >> (len(others) - 1 - i)) & 1
                    bits_in[q] = b
                    bits_out[q] = b
                idx_in = sum(bits_in[q] << (n - 1 - q) for q in range(n))
                idx_out = sum(bits_out[q] << (n - 1 - q) for q in range(n))
                full[idx_out, idx_in] += amp
    return full


def _sequential_unitary(circ: Circuit, n: int) -> np.ndarray:
    u = np.eye(2**n, dtype=complex)
    for op in circ.ops:
        if op.name in {"barrier", "measure"}:
            continue
        u = _embed_gate(op.name, op.qubits, op.params, n) @ u
    return u


def _replay_segment(seg: CompiledSegment, n: int) -> np.ndarray:
    """The engine's operation order: per half-layer, 1q then bonds."""
    u = np.eye(2**n, dtype=complex)
    eye4 = np.eye(4)
    for h in range(seg.n_half_layers):
        layer1 = np.array([[1.0]], dtype=complex)
        for s in range(n):
            layer1 = np.kron(layer1, seg.mats1q[h, s])
        u = layer1 @ u
        for b in range(seg.bond_mats.shape[1]):
            if not np.allclose(seg.bond_mats[h, b], eye4):
                u = _embed_bond(seg.bond_mats[h, b], b, n) @ u
    return u


def _replay_compiled(circ: Circuit, n: int, gate_mode: str = "swaps") -> np.ndarray:
    compiled = compile_circuit(circ, gate_mode=gate_mode)
    u = np.eye(2**n, dtype=complex)
    for plan in compiled.segments:
        for stage in plan.stages:
            assert isinstance(stage, CompiledSegment), "pure-NN replay only"
            u = _replay_segment(stage, n) @ u
    return u


_GATE_POOL_1Q = [("h", 0), ("x", 0), ("s", 0), ("rx", 1), ("rz", 1), ("ry", 1)]
_GATE_POOL_2Q = [("cx", 0), ("cz", 0), ("swap", 0), ("rzz", 1), ("rxx", 1)]


def _random_nn_circuit(n: int, depth: int, rng) -> Circuit:
    c = Circuit(n)
    for _ in range(depth):
        if n > 1 and rng.random() < 0.5:
            name, np_ = _GATE_POOL_2Q[rng.integers(len(_GATE_POOL_2Q))]
            a = int(rng.integers(n - 1))
            pair = (a, a + 1) if rng.random() < 0.5 else (a + 1, a)
            c.append(name, list(pair), params=tuple(rng.uniform(0, 2 * np.pi, np_)))
        else:
            name, np_ = _GATE_POOL_1Q[rng.integers(len(_GATE_POOL_1Q))]
            c.append(name, [int(rng.integers(n))],
                     params=tuple(rng.uniform(0, 2 * np.pi, np_)))
    return c


# ------------------------------------------------------------- reconstruction
@pytest.mark.parametrize("seed", range(12))
def test_random_nn_circuit_reconstruction(seed):
    """ASAP reordering only ever commutes disjoint-support gates: the replayed
    half-layer program equals the sequential gate product exactly."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 6))
    circ = _random_nn_circuit(n, depth=int(rng.integers(6, 18)), rng=rng)
    np.testing.assert_allclose(
        _replay_compiled(circ, n), _sequential_unitary(circ, n), atol=1e-12
    )


def test_same_site_1q_composition_order():
    """Non-commuting 1q gates on one site compose later-on-the-left."""
    c = Circuit(1)
    c.rx(0, params=(0.7,))
    c.rz(0, params=(1.1,))
    expect = gate_matrix("rz", (1.1,)) @ gate_matrix("rx", (0.7,))
    np.testing.assert_allclose(_replay_compiled(c, 1), expect, atol=1e-14)


def test_noncommuting_bond_sandwich_order():
    """cx(0,1); rx(0); cx(0,1) — the 1q gate must land strictly between."""
    c = Circuit(2)
    c.cx(0, 1)
    c.rx(0, params=(0.9,))
    c.cx(0, 1)
    np.testing.assert_allclose(
        _replay_compiled(c, 2), _sequential_unitary(c, 2), atol=1e-13
    )


def test_descending_qubit_order_two_site_gates():
    """cx(1,0) (control below target) embeds with the exchange convention."""
    c = Circuit(2)
    c.h(0)
    c.cx(1, 0)
    np.testing.assert_allclose(
        _replay_compiled(c, 2), _sequential_unitary(c, 2), atol=1e-13
    )


def test_long_range_swap_chain_equals_dense_gate():
    """swaps mode routes a distant cx through a SWAP chain whose replay still
    equals the dense long-range embedding."""
    n = 5
    c = Circuit(n)
    c.cx(0, 4)
    np.testing.assert_allclose(
        _replay_compiled(c, n, gate_mode="swaps"),
        _embed_gate("cx", (0, 4), (), n),
        atol=1e-12,
    )
    c2 = Circuit(n)
    c2.cx(4, 1)  # descending long-range
    np.testing.assert_allclose(
        _replay_compiled(c2, n, gate_mode="swaps"),
        _embed_gate("cx", (4, 1), (), n),
        atol=1e-12,
    )


# ------------------------------------------------------------------ structure
def _segments(circ: Circuit, gate_mode="swaps"):
    return [
        s
        for plan in compile_circuit(circ, gate_mode=gate_mode).segments
        for s in plan.stages
        if isinstance(s, CompiledSegment)
    ]


@pytest.mark.parametrize("seed", range(6))
def test_half_layer_bonds_site_disjoint(seed):
    """No half-layer schedules two bond gates sharing a site."""
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(3, 8))
    circ = _random_nn_circuit(n, depth=25, rng=rng)
    eye4 = np.eye(4)
    for seg in _segments(circ):
        for h in range(seg.n_half_layers):
            active = [
                b
                for b in range(seg.bond_mats.shape[1])
                if not np.allclose(seg.bond_mats[h, b], eye4)
            ]
            for a, b in zip(active, active[1:]):
                assert b - a >= 2, f"adjacent bonds {a},{b} in half-layer {h}"


def test_per_qubit_order_monotone():
    """Three sequential cx on the same bond occupy strictly increasing
    half-layers (the avail[] dependency chain)."""
    c = Circuit(2)
    for _ in range(3):
        c.cx(0, 1)
    (seg,) = _segments(c)
    eye4 = np.eye(4)
    layers = [
        h for h in range(seg.n_half_layers) if not np.allclose(seg.bond_mats[h, 0], eye4)
    ]
    assert layers == [0, 1, 2]


def test_disjoint_gates_share_half_layer():
    """cx(0,1) and cx(2,3) pack into the same half-layer (ASAP width)."""
    c = Circuit(4)
    c.cx(0, 1)
    c.cx(2, 3)
    (seg,) = _segments(c)
    eye4 = np.eye(4)
    assert not np.allclose(seg.bond_mats[0, 0], eye4)
    assert not np.allclose(seg.bond_mats[0, 2], eye4)


def test_noise_mask_matches_gate_scopes():
    """Each half-layer's noise mask covers exactly the union of that layer's
    gate scopes (one jump decision per gate — reference
    create_local_noise_model scoping)."""
    c = Circuit(4)
    c.cx(0, 1)
    c.cx(2, 3)
    c.cx(1, 2)
    (seg,) = _segments(c)
    for h in range(seg.n_half_layers):
        scope_union = set()
        for scope in seg.gate_scopes[h]:
            scope_union |= set(scope)
        mask_sites = {s for s in range(4) if seg.noise_site_mask[h, s] > 0}
        assert mask_sites == scope_union
    assert seg.gate_scopes[0] == [(0, 1), (2, 3)]
    assert seg.gate_scopes[1] == [(1, 2)]


# -------------------------------------------------------------------- fences
def test_sample_barrier_splits_segments():
    c = Circuit(3)
    c.h(0)
    c.sample_observables()
    c.cx(0, 1)
    c.sample_observables()
    c.cx(1, 2)
    compiled = compile_circuit(c)
    assert len(compiled.segments) == 3
    u_total = np.eye(8, dtype=complex)
    for plan in compiled.segments:
        for stage in plan.stages:
            u_total = _replay_segment(stage, 3) @ u_total
    np.testing.assert_allclose(u_total, _sequential_unitary(c, 3), atol=1e-13)


def test_plain_barrier_does_not_split():
    c = Circuit(2)
    c.h(0)
    c.barrier()
    c.cx(0, 1)
    assert len(compile_circuit(c).segments) == 1


def test_foreign_label_barrier_does_not_split():
    c = Circuit(2)
    c.h(0)
    c.barrier(label="whatever")
    c.cx(0, 1)
    assert len(compile_circuit(c).segments) == 1


def test_trailing_sample_barrier_yields_empty_final_segment():
    c = Circuit(2)
    c.cx(0, 1)
    c.sample_observables()
    compiled = compile_circuit(c)
    assert len(compiled.segments) == 2
    final = compiled.segments[-1].stages
    assert len(final) == 1
    np.testing.assert_allclose(_replay_segment(final[0], 2), np.eye(4), atol=1e-15)


def test_mid_circuit_measure_rejected():
    """QASM-parsed measure OPS before later gates are rejected at compile;
    builder-API measures set the has_mid_circuit_measurements flag instead
    (the builder records measured qubits, not ops)."""
    from yaqs_tpu.digital.circuit import GateOp, load_circuit

    qasm = (
        'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[2]; creg c[2];\n'
        "h q[0];\nmeasure q[0] -> c[0];\ncx q[0],q[1];\n"
    )
    circ = load_circuit(qasm)
    if any(op.name == "measure" for op in circ.ops):
        with pytest.raises(ValueError, match="mid-circuit measurement"):
            compile_circuit(circ)
    else:  # parser flags instead of emitting ops
        assert circ.has_mid_circuit_measurements

    c = Circuit(2)
    c.h(0)
    c.measure([0])
    c.cx(0, 1)
    assert c.has_mid_circuit_measurements


def test_terminal_measure_collects_qubits():
    c = Circuit(3)
    c.h(0)
    c.measure([2, 0])
    compiled = compile_circuit(c)
    assert sorted(compiled.measured_qubits) == [0, 2]


def test_unknown_gate_mode_rejected():
    with pytest.raises(ValueError, match="gate_mode"):
        compile_circuit(Circuit(2), gate_mode="teleport")


# ------------------------------------------------------------- stage routing
def _stages(circ: Circuit, gate_mode: str):
    return [
        s
        for plan in compile_circuit(circ, gate_mode=gate_mode).segments
        for s in plan.stages
    ]


def test_long_range_routing_per_mode():
    n = 6

    def lr_circuit():
        c = Circuit(n)
        c.cx(0, 4)
        return c

    # swaps: pure half-layer segments, no GateStage
    assert all(isinstance(s, CompiledSegment) for s in _stages(lr_circuit(), "swaps"))
    # tdvp: generator window stage
    kinds = [s.kind for s in _stages(lr_circuit(), "tdvp") if isinstance(s, GateStage)]
    assert kinds == ["window"]
    # mpo: gate-MPO stage
    kinds = [s.kind for s in _stages(lr_circuit(), "mpo") if isinstance(s, GateStage)]
    assert kinds == ["mpo"]
    # full-tdvp: window even for NEAREST neighbors
    c = Circuit(n)
    c.cx(0, 1)
    kinds = [s.kind for s in _stages(c, "full-tdvp") if isinstance(s, GateStage)]
    assert kinds == ["window"]


def test_window_stage_clamped_at_edges():
    n = 5
    c = Circuit(n)
    c.cx(0, n - 1)
    (stage,) = [s for s in _stages(c, "tdvp") if isinstance(s, GateStage)]
    assert stage.w0 == 0
    assert stage.mpo.shape[0] == n  # [0-1 clamped, n-1+1 clamped] -> whole chain
    assert stage.noise_sites == (0, n - 1)


def test_window_stage_interior_window():
    n = 8
    c = Circuit(n)
    c.cx(3, 5)
    (stage,) = [s for s in _stages(c, "tdvp") if isinstance(s, GateStage)]
    assert stage.w0 == 2
    assert stage.mpo.shape[0] == 5  # sites 2..6
    assert stage.mpo.shape[3] == stage.mpo.shape[4] == 1  # product generator


def test_multi_qubit_gate_routing():
    n = 5
    c = Circuit(n)
    c.append("ccx", [0, 1, 2])
    # swaps mode has no 3q TEBD path: MPO stage (reference digital_tjm.py:418)
    kinds = [s.kind for s in _stages(c, "swaps") if isinstance(s, GateStage)]
    assert kinds == ["mpo"]


def test_gate_mpo_stage_matrix_content():
    """The mpo-stage tensors contract back to the dense gate on its window."""
    n = 4
    c = Circuit(n)
    c.cx(0, 2)
    (stage,) = [s for s in _stages(c, "mpo") if isinstance(s, GateStage)]
    w = stage.mpo.shape[0]
    assert w == 3 and stage.w0 == 0
    # contract the MPO chain to a dense (2^w, 2^w)
    dense = None
    for i in range(w):
        t = stage.mpo[i]  # (d, d, Dl, Dr)
        if dense is None:
            dense = t
        else:
            dense = np.einsum("abxk,cdky->acbdxy",
                              dense.reshape(dense.shape[0], dense.shape[1], dense.shape[2], dense.shape[3]),
                              t)
            dense = dense.reshape(dense.shape[0] * dense.shape[1],
                                  dense.shape[2] * dense.shape[3],
                                  dense.shape[4], dense.shape[5])
    dense = dense[:, :, 0, 0]
    np.testing.assert_allclose(dense, _embed_gate("cx", (0, 2), (), 3), atol=1e-12)
