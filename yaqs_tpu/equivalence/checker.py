"""Circuit equivalence checking via an intermediary MPO (``U2^dag U1 ~ I``).

Reference behavior: mqt-yaqs equivalence_checker.py — the MPO backend
contracts gates of circuit 1 from below and adjoint gates of circuit 2 from
above into an identity-seeded MPO, checking the identity fidelity
``|Tr O| / d^L``; a dense matrix backend covers small circuits (default
cutover at 7 qubits, equivalence_checker.py:45).

TPU-native redesign: the evolving MPO is represented as a **vectorized
d^2-MPS** — operator site tensors ``(o, i)`` fused into one physical index —
so the entire fixed-shape MPS stack (bond sweeps, truncated splits,
canonicalization, entropies) is reused verbatim.  Gates-from-below become
``U (x) I`` one/two-site operators on the doubled space, gates-from-above
``I (x) conj(V)``; half-layers of the two circuits are interleaved to keep
the operator close to the identity (the reference's causal-cone layering
serves the same purpose).  Truncation loss is tracked as an accumulated norm
factor entering the fidelity.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.host import to_device

from ..core import mps_ops
from ..digital.circuit import Circuit, load_circuit
from ..digital.compile import CompiledSegment, compile_circuit
from ..digital.engine import bond_sweep_ltr
from ..methods.tdvp import TDVPConfig

__all__ = ["EquivalenceChecker", "EquivalenceCheckResult"]

DEFAULT_MATRIX_MAX_QUBITS = 7


@dataclasses.dataclass
class EquivalenceCheckResult:
    equivalent: bool
    fidelity: float
    method: str
    elapsed_time: float
    schmidt_values: np.ndarray | None = None  # (L-1, chi) operator Schmidt spectra
    entanglement_entropies: np.ndarray | None = None  # (L-1,) operator entropies
    kept_weight: float = 1.0  # Frobenius weight surviving MPO truncation
    conclusive: bool = True  # False when truncation dominated the verdict
    bond_dim_used: int | None = None


# ---------------------------------------------------------------------------
# Doubled-space operator embeddings (host-side)
# ---------------------------------------------------------------------------


def _double_1q_below(u: np.ndarray) -> np.ndarray:
    """``O -> U O`` as an operator on the fused (o, i) index: ``U (x) I``."""
    d = u.shape[0]
    return np.kron(u, np.eye(d))


def _double_1q_above(v: np.ndarray) -> np.ndarray:
    """``O -> O V^dag`` : acts on the input index as ``conj(V)``."""
    d = v.shape[0]
    return np.kron(np.eye(d), v.conj())


def _double_2q(u4: np.ndarray, below: bool, d: int = 2) -> np.ndarray:
    """Two-site doubled operator with fused per-site indices.

    Site ordering: two-site doubled index ((o1 i1),(o2 i2)); the gate acts on
    (o1 o2) (below) or conj on (i1 i2) (above).
    """
    eye = np.eye(d * d)
    if below:
        big = np.kron(u4, eye)  # indices (o1 o2),(i1 i2)
    else:
        big = np.kron(eye, u4.conj())
    # reorder from (o1 o2 i1 i2) to ((o1 i1)(o2 i2))
    t = big.reshape(d, d, d, d, d, d, d, d)  # o1 o2 i1 i2 | o1' o2' i1' i2'
    t = t.transpose(0, 2, 1, 3, 4, 6, 5, 7)
    return t.reshape(d * d * d * d, d * d * d * d)


def _double_segment(seg: CompiledSegment, below: bool, d: int = 2) -> CompiledSegment:
    n_hl, length = seg.mats1q.shape[:2]
    mats1q = np.tile(np.eye(d * d, dtype=np.complex128), (n_hl, length, 1, 1))
    bond_mats = np.tile(
        np.eye((d * d) ** 2, dtype=np.complex128), (n_hl, max(length - 1, 1), 1, 1)
    )
    for h in range(n_hl):
        for s in range(length):
            m = seg.mats1q[h, s]
            if not np.allclose(m, np.eye(d)):
                mats1q[h, s] = _double_1q_below(m) if below else _double_1q_above(m)
        for b in range(length - 1):
            g = seg.bond_mats[h, b]
            if not np.allclose(g, np.eye(d * d)):
                bond_mats[h, b] = _double_2q(g, below, d)
    return CompiledSegment(mats1q, bond_mats, np.zeros((n_hl, length)))


def _identity_doubled_mps(length: int, chi: int, d: int = 2) -> np.ndarray:
    """vec(I)/sqrt(d) product state on the fused index (normalized)."""
    v = np.eye(d).reshape(-1) / np.sqrt(d)
    return mps_ops.product_state_tensors([v] * length, chi, d=d * d)


# ---------------------------------------------------------------------------
# Checker
# ---------------------------------------------------------------------------


class EquivalenceChecker:
    """Compares two circuits; see class docstring for backends."""

    def __init__(self, *, matrix_max_qubits: int = DEFAULT_MATRIX_MAX_QUBITS) -> None:
        self.matrix_max_qubits = matrix_max_qubits

    def check(
        self,
        circuit1,
        circuit2,
        *,
        threshold: float = 1e-6,
        method: str = "auto",
        max_bond_dim: int = 64,
        max_auto_bond_dim: int = 256,
        svd_threshold: float = 1e-13,
    ) -> EquivalenceCheckResult:
        t0 = time.perf_counter()
        c1 = load_circuit(circuit1)
        c2 = load_circuit(circuit2)
        if c1.num_qubits != c2.num_qubits:
            msg = "circuits must have the same width"
            raise ValueError(msg)
        for c in (c1, c2):
            # final measurements are stripped (the checker compares the
            # unitary parts); mid-circuit measurements make the circuit a
            # channel, which the fidelity verdict cannot represent
            # (reference equivalence_checker mid-circuit rejection)
            gates = [op for op in c.ops if op.name != "barrier"]
            tail = 0
            for op in reversed(gates):
                if op.name != "measure":
                    break
                tail += 1
            if any(op.name == "measure" for op in gates[: len(gates) - tail]):
                msg = "mid-circuit measurements are not supported by the equivalence checker"
                raise ValueError(msg)
        if method == "auto":
            method = "matrix" if c1.num_qubits <= self.matrix_max_qubits else "mpo"
        if method == "matrix":
            fid = self._matrix_fidelity(c1, c2)
            return EquivalenceCheckResult(
                equivalent=bool(1.0 - fid <= threshold),
                fidelity=float(fid),
                method=method,
                elapsed_time=time.perf_counter() - t0,
            )
        if method != "mpo":
            msg = f"unknown method {method!r}"
            raise ValueError(msg)

        # Every doubled gate is unitary on the (o, i) fused space, so any
        # norm loss during the layered contraction is truncation.  A low
        # fidelity with low kept weight is therefore INCONCLUSIVE (the bond
        # dimension could not represent the intermediate operator) — retry
        # with a doubled cap up to ``max_auto_bond_dim``.
        chi = int(max_bond_dim)
        while True:
            fid, schmidt, entropies, kept = self._mpo_fidelity(
                c1, c2, chi, svd_threshold
            )
            equivalent = bool(1.0 - fid <= threshold)
            conclusive = equivalent or (kept >= 1.0 - 10 * threshold)
            if conclusive or chi * 2 > int(max_auto_bond_dim):
                break
            chi *= 2
        return EquivalenceCheckResult(
            equivalent=equivalent,
            fidelity=float(fid),
            method=method,
            elapsed_time=time.perf_counter() - t0,
            schmidt_values=schmidt,
            entanglement_entropies=entropies,
            kept_weight=float(kept),
            conclusive=bool(conclusive),
            bond_dim_used=chi,
        )

    # -- dense backend -----------------------------------------------------
    @staticmethod
    def _circuit_unitary(circ: Circuit) -> np.ndarray:
        from ..digital.engine import run_digital  # noqa: F401  (doc anchor)

        length = circ.num_qubits
        dim = 2**length
        u = np.eye(dim, dtype=complex)
        for op in circ.ops:
            if op.name in {"barrier", "measure"}:
                continue
            u = _dense_gate_matrix(op, length) @ u
        return u

    def _matrix_fidelity(self, c1: Circuit, c2: Circuit) -> float:
        u1 = self._circuit_unitary(c1)
        u2 = self._circuit_unitary(c2)
        dim = u1.shape[0]
        return abs(np.trace(u2.conj().T @ u1)) / dim

    # -- MPO backend ---------------------------------------------------------
    def _mpo_fidelity(self, c1: Circuit, c2: Circuit, chi: int, svd_threshold: float):
        length = c1.num_qubits
        d = 2
        cfg = TDVPConfig(
            trunc_mode="discarded_weight", threshold=svd_threshold, max_bond_dim=chi
        )

        # swaps mode keeps every gate inside half-layer segments (no MPO /
        # window stages), which is what the doubled-layer contraction needs
        segs1 = [s for plan in compile_circuit(c1, "swaps").segments for s in plan.stages]
        segs2 = [s for plan in compile_circuit(c2, "swaps").segments for s in plan.stages]
        halves1 = _split_half_layers(segs1)
        halves2 = _split_half_layers(segs2)

        doubled: list[CompiledSegment] = []
        # interleave proportionally by applied two-qubit-gate weight so both
        # circuits advance through the same circuit *fraction* together (the
        # intermediate stays near identity when the circuits are equivalent);
        # half-layer counts alone misalign when gate density differs
        def _weight(seg: CompiledSegment) -> int:
            eye = np.eye(seg.bond_mats.shape[-1])
            w = sum(
                0 if np.allclose(g, eye) else 1 for g in seg.bond_mats[0]
            )
            return max(w, 1)

        w1 = [_weight(h) for h in halves1]
        w2 = [_weight(h) for h in halves2]
        tot1 = max(sum(w1), 1)
        tot2 = max(sum(w2), 1)
        n1, n2 = len(halves1), len(halves2)
        i = j = 0
        a1 = a2 = 0
        while i < n1 or j < n2:
            if j >= n2 or (i < n1 and a1 * tot2 <= a2 * tot1):
                doubled.append(_double_segment(halves1[i], below=True, d=d))
                a1 += w1[i]
                i += 1
            else:
                doubled.append(_double_segment(halves2[j], below=False, d=d))
                a2 += w2[j]
                j += 1

        # numpy operands into jitted calls only: eager complex device ops
        # are unsupported on the tunneled TPU platform
        tensors = to_device(_identity_doubled_mps(length, chi, d))
        log_norm = 0.0
        for seg in doubled:
            tensors, nrm = _apply_doubled_half_layer(
                tensors, to_device(seg.mats1q[0]), to_device(seg.bond_mats[0]), cfg
            )
            log_norm += float(np.log(max(float(np.asarray(nrm)), 1e-300)))

        # overlap with the normalized identity state: |<vecI | O>| * prod(norms)
        ident = _identity_doubled_mps(length, chi, d)
        overlap_abs = jax.jit(
            lambda i, t: jnp.abs(mps_ops.scalar_product(i, t))
        )(to_device(ident), tensors)
        fid = float(np.asarray(overlap_abs)) * float(np.exp(log_norm))
        # doubled gates are unitary -> all norm decay is truncation loss
        kept_weight = float(np.exp(2.0 * min(log_norm, 0.0)))

        spectra, entropies = jax.jit(mps_ops.bond_spectra)(tensors)
        return fid, np.asarray(spectra), np.asarray(entropies), kept_weight


def _split_half_layers(segments: list[CompiledSegment]) -> list[CompiledSegment]:
    out = []
    for seg in segments:
        if not isinstance(seg, CompiledSegment):  # GateStage (>=3-qubit gate)
            msg = (
                "the MPO equivalence backend supports 1- and 2-qubit gates; "
                "decompose larger gates first (or use the matrix backend)"
            )
            raise NotImplementedError(msg)
        for h in range(seg.n_half_layers):
            out.append(
                CompiledSegment(
                    seg.mats1q[h : h + 1],
                    seg.bond_mats[h : h + 1],
                    seg.noise_site_mask[h : h + 1],
                )
            )
    return out


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("cfg",))
def _apply_doubled_half_layer(tensors, mats1q, bond_mats, cfg: TDVPConfig):
    tensors = jnp.einsum("iab,iblr->ialr", mats1q.astype(tensors.dtype), tensors)
    tensors = bond_sweep_ltr(tensors, bond_mats, cfg)
    tensors, nrm = mps_ops.normalize_canonical(tensors)
    return tensors, nrm




def _dense_gate_matrix(op, length: int) -> np.ndarray:
    """Full 2^L unitary of one gate (site 0 least significant)."""
    mat = op.resolved_matrix()
    qubits = list(op.qubits)
    k = len(qubits)
    dim = 2**length
    t = mat.reshape([2] * (2 * k))
    # contract the gate's input legs into the corresponding axes of an
    # identity tensor (site L-1 ... site 0, column)
    eye = np.eye(dim, dtype=complex).reshape([2] * length + [dim])
    axes = [length - 1 - q for q in qubits]
    out = np.tensordot(t, eye, axes=(list(range(k, 2 * k)), axes))
    remaining = [ax for ax in range(length) if ax not in axes]
    current = axes + remaining + [length]  # original position of each out-axis
    perm = [current.index(i) for i in range(length + 1)]
    return out.transpose(perm).reshape(dim, dim)
