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
            mid_ops = any(op.name == "measure" for op in gates[: len(gates) - tail])
            if c.has_mid_circuit_measurements or mid_ops:
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
        """Doubled-MPS contraction of ``U2^dag U1`` vs identity.

        Pinned to the CPU backend in float64, by measurement: the checker is
        a host-side analysis tool (the reference's runs on CPU) and its
        per-op program is a sequential chain of small QR/SVDs — the opposite
        of MXU-shaped work.  A TPU c64 first pass was re-measured on hardware
        after the lazy-permutation redesign (2026-08-20, QFT-20 chi=32): the
        chunk program now lowers and runs (the 2026-08-18 worker crash was
        the old per-half-layer program), but cold compile costs 256 s, the
        warm pass is only 2.0x faster than CPU x64 (6.9 s vs 13.8 s), and
        c64 norm drift across the ~5k-op stream reads fidelity 1.109 for a
        truly-equivalent pair — every verdict near 1 would need an x64
        escalation anyway, making the TPU pass pure overhead.
        ``jax.devices("cpu")`` is available even when the default platform is
        the axon TPU; x64 is forced locally because c64 roundoff already
        exceeds the 1e-6 default verdict threshold on an 8-qubit smoke.
        """
        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0), jax.enable_x64(True):
            return self._mpo_fidelity_impl(c1, c2, chi, svd_threshold)

    def _mpo_fidelity_impl(self, c1: Circuit, c2: Circuit, chi: int, svd_threshold: float):
        length = c1.num_qubits
        d = 2
        cfg = TDVPConfig(
            trunc_mode="discarded_weight", threshold=svd_threshold, max_bond_dim=chi
        )

        # per-gate LOCAL op streams: one-site ops absorb in place, two-site
        # gates update only their own bond (merge -> matrix -> truncated
        # split), long-range gates route via fused-index SWAPs.  This replaces
        # the earlier full-chain half-layer sweeps, whose O(L) cost per gate
        # made QFT-class circuits (O(n^2) long-range gates) scale as n^4 —
        # measured 101 s at n=12 / 267 s at n=16, extrapolating to ~8 h at
        # the BASELINE config-4 size n=50; the local engine runs n=50 in
        # minutes (the reference's local checkerboard pair updates,
        # contraction_utils.py:271-341, have the same per-gate locality).
        # Routing is LAZY (one shared site permutation, no per-gate restore;
        # see _route_stream): the trace |Tr O| is invariant under the qubit
        # relabeling P O P^dag, so only the closing restore walk is needed
        # to report bond spectra in physical order.
        units1 = _emit_logical_units(c1, below=True, d=d)
        units2 = _emit_logical_units(c2, below=False, d=d)
        stream = _route_stream(_interleave_units(units1, units2), length, d)

        # center-planning pass: faithful truncation requires the
        # orthogonality center AT the split bond (local singular values in an
        # arbitrary gauge reflect representation rank, not state rank — a
        # chi cap then discards real weight even for product states), so the
        # host plans explicit center walks: kind 2/3 = QR shift right/left,
        # kind 1/4 = bond op splitting right/left (center follows the next
        # bond op's direction).  The center starts at 0 (identity product
        # state is canonical everywhere) and flows monotonically through
        # each gate's SWAP walk, so shifts add O(1) amortized per op.
        stream = _plan_center_walks(stream, d)

        # fixed-size scan chunks, one compiled program; no normalization
        # between chunks (it would move the center) — the single closing
        # canonicalization captures all truncation loss, which is the only
        # norm change (every doubled op is unitary, shifts are exact)
        chunk = max(2 * length, 16)
        # gateless circuits: run one chunk of identity no-ops so the closing
        # normalize/spectra path still sees a contracted state
        pad = (-len(stream)) % chunk if stream else chunk
        stream = stream + [(0, 0, np.eye((d * d) ** 2, dtype=np.complex128))] * pad
        kinds = np.asarray([k for k, _, _ in stream], dtype=np.int32)
        idxs = np.asarray([i for _, i, _ in stream], dtype=np.int32)
        mats = np.stack([m for _, _, m in stream]).astype(np.complex128)

        # numpy operands into jitted calls only: eager complex device ops
        # are unsupported on the tunneled TPU platform
        tensors = to_device(_identity_doubled_mps(length, chi, d))
        for c0 in range(0, len(stream), chunk):
            sl = slice(c0, c0 + chunk)
            tensors = _apply_doubled_ops_chunk(
                tensors,
                to_device(kinds[sl]),
                to_device(idxs[sl]),
                to_device(mats[sl]),
                cfg,
            )
        tensors, nrm = jax.jit(mps_ops.normalize_canonical)(tensors)
        log_norm = float(np.log(max(float(np.asarray(nrm)), 1e-300)))

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


_SWAP_2Q = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=complex
)


def _fused_swap(d: int = 2) -> np.ndarray:
    """SWAP of two fused ``d^2``-dim sites (routes BOTH operator layers)."""
    dd = d * d
    return (
        np.eye(dd * dd).reshape(dd, dd, dd, dd).transpose(1, 0, 2, 3).reshape(dd * dd, dd * dd)
    )


def _emit_logical_units(circ: Circuit, below: bool, d: int = 2):
    """Host-side LOGICAL unit stream for one circuit layer.

    Returns ``[(weight, qubits, payload)]`` — one unit per circuit gate
    (``qubits`` = the gate's logical qubits, for the per-qubit interleaving
    clocks).  Payloads: ``("1q", q, dm)`` with ``dm (d^2, d^2)`` and
    ``("2q", (a, b), dm)`` with ``a < b`` and ``dm (d^4, d^4)`` whose FIRST
    fused site is ``a``.  Routing to physical bonds happens later against
    the shared lazy layout (:func:`_route_stream`).
    """
    units: list = []
    for op in circ.ops:
        if op.name in {"barrier", "measure"}:
            continue
        qs = list(op.qubits)
        m = op.resolved_matrix()
        if len(qs) == 1:
            dm = _double_1q_below(m) if below else _double_1q_above(m)
            units.append((0, tuple(qs), ("1q", qs[0], dm)))
        elif len(qs) == 2:
            a, b = qs
            if a > b:
                # first-listed qubit is most significant; reorder ascending
                perm = [0, 2, 1, 3]
                m = m[np.ix_(perm, perm)]
                a, b = b, a
            units.append((1, (a, b), ("2q", (a, b), _double_2q(m, below, d))))
        else:
            msg = (
                "the MPO equivalence backend supports 1- and 2-qubit gates; "
                "decompose larger gates first (or use the matrix backend)"
            )
            raise NotImplementedError(msg)
    return units


def _route_stream(units, length: int, d: int = 2):
    """Lower interleaved logical units onto bonds via a LAZY shared layout.

    One site permutation evolves across the whole interleaved stream: a
    two-site gate routes its qubits adjacent via fused-index SWAPs and does
    NOT restore positions (the old per-unit restore walk made QFT-class
    circuits O(n^3) in local ops; lazy routing collapses the repeated
    shared-control walks to the O(n^2) "caravan" pattern).  Correctness:
    the evolved MPS then represents ``P O P^dag`` for the accumulated qubit
    relabeling ``P``; the identity-fidelity ``|Tr O|/d^L`` is relabeling-
    invariant, and a single closing restore walk returns to physical order
    so the reported bond spectra/entropies mean physical cuts.

    Mover heuristic: when the NEXT two-site unit shares exactly one qubit
    with the current gate, move the shared qubit next to its partner (it is
    about to travel anyway — the QFT control caravan); otherwise move the
    left qubit rightwards.
    """
    dd2 = (d * d) ** 2
    fswap = _fused_swap(d)
    perm = list(range(length))  # position -> logical qubit
    pos = list(range(length))  # logical qubit -> position
    ops: list = []

    def pad1(m: np.ndarray) -> np.ndarray:
        out = np.eye(dd2, dtype=np.complex128)
        out[: d * d, : d * d] = m
        return out

    def swap_bond(p: int) -> None:
        ops.append((1, p, fswap))
        qa, qb = perm[p], perm[p + 1]
        perm[p], perm[p + 1] = qb, qa
        pos[qa], pos[qb] = p + 1, p

    def move_adjacent(mover: int, anchor: int) -> None:
        while abs(pos[mover] - pos[anchor]) > 1:
            p = pos[mover]
            swap_bond(p if pos[anchor] > p else p - 1)

    # lookahead: for each 2q unit, the next 2q unit's qubit set
    next_2q: list = [None] * len(units)
    nxt = None
    for k in range(len(units) - 1, -1, -1):
        next_2q[k] = nxt
        if units[k][0] == 1:
            nxt = set(units[k][1])

    for k, (w, qs, payload) in enumerate(units):
        if payload[0] == "1q":
            _, q, m = payload
            ops.append((0, pos[q], pad1(m)))
            continue
        _, (a, b), m = payload
        look = next_2q[k]
        shared = (look & {a, b}) if look else set()
        mover, anchor = (a, b)
        if len(shared) == 1:
            mover = shared.pop()
            anchor = b if mover == a else a
        move_adjacent(mover, anchor)
        p = min(pos[a], pos[b])
        if perm[p] != a:  # layout holds b left of a: conjugate by the SWAP
            m = fswap @ m @ fswap
        ops.append((1, p, m))

    # closing restore walk: adjacent-swap selection sort back to identity
    for target in range(length):
        while pos[target] > target:
            swap_bond(pos[target] - 1)
    return ops


def _interleave_units(units1, units2):
    """Merge below/above unit streams with per-qubit progress clocks.

    The intermediate operator stays near identity (for equivalent pairs)
    only when the applied prefixes correspond to the same physical gates.
    A single global progress fraction drifts when the two circuits decompose
    gates with different op counts (e.g. cp -> 2 CX but swap -> 3 CX): the
    constant-fraction mismatch window then holds O(n^2-scaled) unmatched
    long-range gates whose operator rank grows exponentially — measured on
    exact QFT-16 pairs: chi=48 still inconclusive.  Per-QUBIT fractional
    clocks (progress of each stream normalized by its own per-qubit totals)
    are invariant under per-gate decomposition factors, so streams align at
    gate-correspondence boundaries exactly: the same pair is conclusive at
    chi=16.  Units are LOGICAL here; bond routing happens afterwards against
    the shared lazy layout (:func:`_route_stream`).
    """
    from collections import Counter, defaultdict

    def totals(units):
        t = Counter()
        for w, qs, _ in units:
            if w:
                for q in qs:
                    t[q] += 1
        return t

    t1, t2 = totals(units1), totals(units2)
    f1, f2 = defaultdict(float), defaultdict(float)

    def next_2q(units, i):
        while i < len(units) and units[i][0] == 0:
            i += 1
        return i

    merged = []
    i = j = 0
    n1, n2 = len(units1), len(units2)
    while i < n1 or j < n2:
        i2, j2 = next_2q(units1, i), next_2q(units2, j)
        if i2 >= n1 and j2 >= n2:
            # only trailing one-site units remain
            merged.extend(units1[i:])
            merged.extend(units2[j:])
            break
        take1 = j2 >= n2
        if not take1 and i2 < n1:
            # deficit: how far each stream's next gate is AHEAD of the other
            # on its own qubits; apply the stream that is further behind
            q1s, q2s = units1[i2][1], units2[j2][1]
            d1 = sum(f1[q] - f2[q] for q in q1s) / max(len(q1s), 1)
            d2 = sum(f2[q] - f1[q] for q in q2s) / max(len(q2s), 1)
            take1 = d1 <= d2
        if take1:
            merged.extend(units1[i : i2 + 1])
            for q in units1[i2][1]:
                f1[q] += 1.0 / t1[q]
            i = i2 + 1
        else:
            merged.extend(units2[j : j2 + 1])
            for q in units2[j2][1]:
                f2[q] += 1.0 / t2[q]
            j = j2 + 1
    return merged


def _plan_center_walks(stream, d: int = 2):
    """Insert center shifts so every bond op splits at the center.

    Input ops: kind 0 (one-site, gauge-preserving — all doubled 1q ops are
    unitary) and kind 1 (bond op at ``idx``).  Output adds kind 2 (QR shift
    right at site ``idx``: center idx -> idx+1), kind 3 (LQ shift left at
    site ``idx``: center idx -> idx-1), and re-kinds bond ops to 1
    (split right, center -> idx+1) or 4 (split left, center -> idx) chosen
    by the FOLLOWING bond op's position, so walks cost no extra shifts.
    """
    eye = np.eye((d * d) ** 2, dtype=np.complex128)
    bonds_ahead = []
    nxt = None
    for kind, idx, _ in reversed(stream):
        bonds_ahead.append(nxt)
        if kind == 1:
            nxt = idx
    bonds_ahead.reverse()

    out = []
    c = 0
    for (kind, idx, m), nb in zip(stream, bonds_ahead):
        if kind == 0:
            out.append((0, idx, m))
            continue
        while c < idx:
            out.append((2, c, eye))
            c += 1
        while c > idx + 1:
            out.append((3, c, eye))
            c -= 1
        if nb is not None and nb < idx:
            out.append((4, idx, m))
            c = idx
        else:
            out.append((1, idx, m))
            c = idx + 1
    return out


from functools import partial  # noqa: E402

from ..ops.decomp import merge_two_site, split_two_site_truncated  # noqa: E402


@partial(jax.jit, static_argnames=("cfg",))
def _apply_doubled_ops_chunk(tensors, kinds, idxs, mats, cfg: TDVPConfig):
    """Scan a chunk of local doubled ops with a center-following gauge.

    The caller guarantees (``_plan_center_walks``) that each bond op arrives
    with the orthogonality center inside its pair, so the local split's
    singular values are the state's true Schmidt values across that bond and
    truncation is faithful.  Shifts and one-site ops are exact; splits only
    ever reduce the norm (truncation), captured by the caller's closing
    canonicalization.
    """
    length, dd, chi, _ = tensors.shape
    # rank-safety noise for the shift QRs: the identity doubled MPS is a
    # padded product state — exactly the rank-deficient case where XLA:TPU's
    # Householder QR emits NaN columns (core/mps_ops._qr_rank_noise)
    qr_noise = mps_ops._qr_rank_noise((dd * chi, chi), tensors.dtype)

    def _safe_qr(a2):
        if qr_noise is not None:
            scale = (
                mps_ops._QR_EPS32 * jnp.linalg.norm(a2) + 1e-16
            ).astype(a2.dtype)
            a2 = a2 + scale * jnp.asarray(qr_noise, dtype=a2.dtype)
        return jnp.linalg.qr(a2)

    def _split(t, idx, m, distribution):
        a = jax.lax.dynamic_index_in_dim(t, idx, 0, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(t, idx + 1, 0, keepdims=False)
        theta = merge_two_site(a, b)
        th = (m.astype(t.dtype) @ theta.reshape(dd * dd, chi * chi)).reshape(
            dd, dd, chi, chi
        )
        a2, b2, _, _ = split_two_site_truncated(
            th,
            chi,
            mode=cfg.trunc_mode,
            threshold=cfg.threshold,
            max_bond_dim=cfg.max_bond_dim,
            min_keep=1,
            svd_distribution=distribution,
        )
        t = jax.lax.dynamic_update_index_in_dim(t, a2, idx, 0)
        return jax.lax.dynamic_update_index_in_dim(t, b2, idx + 1, 0)

    def body(t, xs):
        kind, idx, m = xs
        # bond/shift branches index idx+1 / idx-1; clamps keep the untaken
        # branches in-range at trace time
        ib = jnp.minimum(idx, length - 2)
        il = jnp.maximum(idx, 1)

        def one_site(t):
            a = jax.lax.dynamic_index_in_dim(t, idx, 0, keepdims=False)
            a = jnp.einsum("ab,blr->alr", m[:dd, :dd].astype(t.dtype), a)
            return jax.lax.dynamic_update_index_in_dim(t, a, idx, 0)

        def bond_right(t):
            return _split(t, ib, m, "right")

        def bond_left(t):
            return _split(t, ib, m, "left")

        def shift_right(t):
            a = jax.lax.dynamic_index_in_dim(t, ib, 0, keepdims=False)
            q, r = _safe_qr(a.reshape(dd * chi, chi))
            t = jax.lax.dynamic_update_index_in_dim(
                t, q.reshape(dd, chi, chi), ib, 0
            )
            nxt = jax.lax.dynamic_index_in_dim(t, ib + 1, 0, keepdims=False)
            nxt = jnp.einsum("lm,smr->slr", r, nxt)
            return jax.lax.dynamic_update_index_in_dim(t, nxt, ib + 1, 0)

        def shift_left(t):
            a = jax.lax.dynamic_index_in_dim(t, il, 0, keepdims=False)
            m2 = jnp.transpose(a, (1, 0, 2)).reshape(chi, dd * chi)
            qh, rh = _safe_qr(m2.conj().T)
            q = qh.conj().T.reshape(chi, dd, chi).transpose(1, 0, 2)
            t = jax.lax.dynamic_update_index_in_dim(t, q, il, 0)
            prev = jax.lax.dynamic_index_in_dim(t, il - 1, 0, keepdims=False)
            prev = jnp.einsum("slr,rm->slm", prev, rh.conj().T)
            return jax.lax.dynamic_update_index_in_dim(t, prev, il - 1, 0)

        return (
            jax.lax.switch(
                kind, [one_site, bond_right, shift_right, shift_left, bond_left], t
            ),
            None,
        )

    tensors, _ = jax.lax.scan(body, tensors, (kinds, idxs, mats))
    return tensors




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
