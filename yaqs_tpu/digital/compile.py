"""Circuit -> static half-layer schedule (host-side compilation).

The reference simulates circuits by mutating a Qiskit DAG while peeling front
layers (mqt-yaqs digital/digital_tjm.py:95-163).  On TPU the circuit must be a
*static* schedule: this compiler performs ASAP scheduling of the flat gate
list into **half-layers**, each holding

- a per-site stack of composed one-qubit matrices (applied first, one einsum);
- a set of disjoint-bond two-qubit gates (applied in one sweep — even/odd
  brickwork emerges naturally, arbitrary disjoint sets are allowed);
- the per-gate noise scope (sites of logical two-qubit gates finishing in this
  half-layer, reference create_local_noise_model semantics).

Distant two-qubit gates are routed with adjacent SWAP chains (swap in, gate,
swap back — reference apply_two_qubit_gate SWAP insertion, digital_tjm.py:302)
with the noise scope attached to the original logical sites after the
back-swaps complete.  The engine runs each half-layer as one L→R sweep and
recanonicalizes to site 0 afterwards.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..models.gates import gate_matrix, two_qubit_exchange
from .circuit import Circuit, GateOp

__all__ = ["CompiledSegment", "CompiledCircuit", "compile_circuit"]

_SWAP = gate_matrix("swap")


@dataclasses.dataclass
class CompiledSegment:
    """One jit-compilable chunk between sampling points.

    ``mats1q (n_hl, L, 2, 2)``, ``bond_mats (n_hl, L-1, 4, 4)``,
    ``noise_site_mask (n_hl, L)`` float; the half-layer count is circuit-dependent.
    """

    mats1q: np.ndarray
    bond_mats: np.ndarray
    noise_site_mask: np.ndarray

    @property
    def n_half_layers(self) -> int:
        return self.mats1q.shape[0]


@dataclasses.dataclass
class CompiledCircuit:
    num_qubits: int
    segments: list[CompiledSegment]
    measured_qubits: list[int]


class _Scheduler:
    def __init__(self, length: int):
        self.length = length
        self.avail = [0] * length
        self.ops_1q: dict[tuple[int, int], np.ndarray] = {}  # (h, site) -> mat
        self.ops_2q: dict[tuple[int, int], np.ndarray] = {}  # (h, bond) -> mat
        self.noise_sites: dict[int, set[int]] = {}
        self.n_hl = 0

    def add_1q(self, site: int, mat: np.ndarray) -> None:
        h = self.avail[site]
        key = (h, site)
        prev = self.ops_1q.get(key)
        self.ops_1q[key] = mat @ prev if prev is not None else mat
        self.n_hl = max(self.n_hl, h + 1)

    def add_bond(self, bond: int, mat: np.ndarray, noise_sites=()) -> None:
        h = max(self.avail[bond], self.avail[bond + 1])
        self.ops_2q[(h, bond)] = mat
        self.avail[bond] = self.avail[bond + 1] = h + 1
        if noise_sites:
            self.noise_sites.setdefault(h, set()).update(noise_sites)
        self.n_hl = max(self.n_hl, h + 1)

    def finish(self) -> CompiledSegment:
        n_hl = self.n_hl
        length = self.length
        eye2 = np.eye(2, dtype=np.complex128)
        eye4 = np.eye(4, dtype=np.complex128)
        mats1q = np.tile(eye2, (max(n_hl, 2), length, 1, 1))
        bond_mats = np.tile(eye4, (max(n_hl, 2), max(length - 1, 1), 1, 1))
        mask = np.zeros((max(n_hl, 2), length))
        for (h, s), m in self.ops_1q.items():
            mats1q[h, s] = m
        for (h, b), m in self.ops_2q.items():
            bond_mats[h, b] = m
        for h, sites in self.noise_sites.items():
            for s in sites:
                mask[h, s] = 1.0
        return CompiledSegment(mats1q, bond_mats, mask)


def compile_circuit(circuit: Circuit) -> CompiledCircuit:
    length = circuit.num_qubits
    segments: list[CompiledSegment] = []
    sched = _Scheduler(length)

    for op in circuit.ops:
        if op.name == "barrier":
            if op.label is not None and str(op.label).upper() == "SAMPLE_OBSERVABLES":
                segments.append(sched.finish())
                sched = _Scheduler(length)
            continue
        if op.name == "measure":
            continue
        qubits = op.qubits
        if len(qubits) == 1:
            sched.add_1q(qubits[0], op.resolved_matrix())
        elif len(qubits) == 2:
            _schedule_two_qubit(sched, qubits, op)
        else:
            msg = (
                f"{len(qubits)}-qubit gate {op.name!r} is not supported by the "
                "TEBD path yet (decompose to 1q/2q gates)"
            )
            raise NotImplementedError(msg)

    segments.append(sched.finish())
    return CompiledCircuit(length, segments, list(circuit.measured_qubits))


def _schedule_two_qubit(sched: _Scheduler, qubits: tuple[int, int], op: GateOp) -> None:
    a, b = qubits
    mat = op.resolved_matrix()  # first listed qubit = most significant
    lo, hi = min(a, b), max(a, b)
    if a > b:  # reorder so the lower site is the most significant factor
        mat = two_qubit_exchange(mat)
    if hi - lo == 1:
        sched.add_bond(lo, mat, noise_sites=(lo, hi))
        return
    # SWAP-route: bubble the low qubit up next to the high one, apply, return.
    for bond in range(lo, hi - 1):
        sched.add_bond(bond, _SWAP)
    sched.add_bond(hi - 1, mat)
    for bond in range(hi - 2, lo - 1, -1):
        sched.add_bond(bond, _SWAP)
    # noise scope: the logical gate sites, after the chain completes
    h = max(sched.avail[lo], sched.avail[hi]) - 1
    sched.noise_sites.setdefault(h, set()).update((lo, hi))
