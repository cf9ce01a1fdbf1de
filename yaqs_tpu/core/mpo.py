"""User-facing MPO class (reference API parity over the padded array).

Reference: mqt-yaqs core/data_structures/mpo.py.  Factories delegate to the
suffix-automaton builders; application/composition to
:mod:`yaqs_tpu.methods.mpo_ops`; the operator-analysis methods (Schmidt
spectrum, operator entanglement, identity fidelity) reuse the vectorized
d^2-MPS view shared with the equivalence checker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..methods.mpo_ops import mpo_adjoint, mpo_apply_mps, mpo_compose, mpo_to_doubled_mps
from ..models.hamiltonians import (
    bose_hubbard_mpo,
    coupled_transmon_mpo,
    fermi_hubbard_1d_mpo,
    trapped_ion_mpo,
)
from ..utils.host import fetch, to_device
from . import mps_ops
from .mpo_builders import (
    gate_product_terms,
    heisenberg_mpo,
    identity_mpo,
    ising_mpo,
    mpo_from_pauli_sum,
    mpo_from_terms,
    mpo_to_matrix,
    mpo_to_sparse_matrix,
    pad_mpo,
)

__all__ = ["MPO"]


class MPO:
    """Padded-array matrix product operator ``(L, d, d, Dw, Dw)``."""

    def __init__(self, tensors: np.ndarray | None = None) -> None:
        self.tensors = None if tensors is None else np.asarray(tensors)

    # -- factories (reference mpo.py:249-1154) ------------------------------
    @classmethod
    def ising(cls, length: int, J: float, g: float) -> MPO:
        return cls(ising_mpo(length, J, g))

    @classmethod
    def heisenberg(cls, length: int, Jx: float, Jy: float, Jz: float, h: float = 0.0) -> MPO:
        return cls(heisenberg_mpo(length, Jx, Jy, Jz, h))

    @classmethod
    def identity(cls, length: int, d: int = 2) -> MPO:
        return cls(identity_mpo(length, d))

    @classmethod
    def fermi_hubbard_1d(cls, length: int, t: float, u: float, *, jordan_wigner: bool = False) -> MPO:
        return cls(fermi_hubbard_1d_mpo(length, t, u, jordan_wigner=jordan_wigner))

    @classmethod
    def coupled_transmon(cls, *args, **kwargs) -> MPO:
        return cls(coupled_transmon_mpo(*args, **kwargs))

    @classmethod
    def bose_hubbard(cls, *args, **kwargs) -> MPO:
        return cls(bose_hubbard_mpo(*args, **kwargs))

    @classmethod
    def trapped_ion(cls, *args, **kwargs) -> MPO:
        return cls(trapped_ion_mpo(*args, **kwargs))

    @classmethod
    def from_pauli_sum(cls, terms, length: int, d: int = 2) -> MPO:
        return cls(mpo_from_pauli_sum(terms, length, d))

    @classmethod
    def pauli(
        cls,
        length: int,
        two_body: list[tuple[complex, str, str]] | None = None,
        one_body: list[tuple[complex, str]] | None = None,
        bc: str = "open",
    ) -> MPO:
        """Generic nearest-neighbor two-body + one-body Pauli Hamiltonian
        (reference MPO.pauli, mpo.py:249-327): interaction lists expand into
        Pauli strings; ``bc`` adds the periodic wrap bond.

        Raises:
            ValueError: nonpositive length, invalid boundary condition, or an
                operator label outside {I, X, Y, Z}.
        """
        if length <= 0:
            msg = f"length must be positive, got {length}"
            raise ValueError(msg)
        if bc not in {"open", "periodic"}:
            msg = f"bc must be 'open' or 'periodic', got {bc!r}"
            raise ValueError(msg)
        valid = {"I", "X", "Y", "Z"}

        def op(label: object) -> str:
            lab = str(label).upper()
            if lab not in valid:
                msg = f"Invalid operator {label!r}; expected one of {sorted(valid)}"
                raise ValueError(msg)
            return lab

        terms: list[tuple[complex, str]] = []
        bonds = range(length) if bc == "periodic" else range(length - 1)
        for c, a, b in two_body or []:
            a_op, b_op = op(a), op(b)
            for i in bonds:
                j = (i + 1) % length
                terms.append((c, f"{a_op}{i} {b_op}{j}"))
        for c, a in one_body or []:
            a_op = op(a)
            terms.extend((c, f"{a_op}{i}") for i in range(length))
        return cls(mpo_from_pauli_sum(terms, length, 2))

    @classmethod
    def from_terms(cls, terms, length: int, d: int = 2) -> MPO:
        return cls(mpo_from_terms(terms, length, d))

    @classmethod
    def from_gate(cls, matrix: np.ndarray, sites: list[int], length: int, d: int = 2) -> MPO:
        """MPO of a k-site gate embedded at ``sites`` (identities elsewhere).

        The gate matrix uses the first listed site as the most significant
        index (reference MPO.from_gate, mpo.py:1031).
        """
        sites_sorted = sorted(sites)
        k = len(sites)
        if sites != sites_sorted:
            msg = "from_gate requires ascending site order"
            raise ValueError(msg)
        # operator-Schmidt factorize the k-site gate into a chain of terms
        if k == 1:
            return cls(mpo_from_terms([(1.0, [(sites[0], matrix)])], length, d))
        terms = [
            (1.0, list(zip(sites, factors)))
            for factors in gate_product_terms(matrix, k, d)
        ]
        return cls(mpo_from_terms(terms, length, d))

    @classmethod
    def custom(cls, tensors, *, transpose: bool = True) -> MPO:
        """Custom MPO from a list of per-site tensors (reference MPO.custom,
        mpo.py:1131-1154).

        Tensors are ``(wl, wr, sigma, sigma')`` when ``transpose`` is True
        (the reference's input convention) or already
        ``(sigma, sigma', wl, wr)`` when False; ragged bond dims are padded to
        a uniform ``Dw`` in the fixed-shape layout.
        """
        ts = [np.asarray(t, dtype=np.complex128) for t in tensors]
        if transpose:
            ts = [np.transpose(t, (2, 3, 0, 1)) for t in ts]
        length = len(ts)
        d = ts[0].shape[0]
        dw = max(max(t.shape[2], t.shape[3]) for t in ts)
        out = np.zeros((length, d, d, dw, dw), dtype=np.complex128)
        for i, t in enumerate(ts):
            if t.shape[0] != d or t.shape[1] != d:
                msg = "custom MPO tensors must share the physical dimension"
                raise ValueError(msg)
            out[i, :, :, : t.shape[2], : t.shape[3]] = t
        return cls(out)

    @classmethod
    def finite_state_machine(
        cls,
        length: int,
        left_bound: np.ndarray,
        inner: np.ndarray,
        right_bound: np.ndarray,
    ) -> MPO:
        """MPO from finite-state-machine boundary/bulk tensors (reference
        MPO.finite_state_machine, mpo.py:1104-1129): tensors are given as
        ``(wl, wr, sigma, sigma')`` and the chain is
        ``left_bound, inner * (length-2), right_bound``.
        """
        if length < 2:
            msg = "finite_state_machine requires length >= 2"
            raise ValueError(msg)
        ts = [left_bound] + [inner] * (length - 2) + [right_bound]
        return cls.custom(ts, transpose=True)

    @classmethod
    def from_matrix(cls, matrix: np.ndarray, length: int, d: int = 2, chi: int | None = None) -> MPO:
        """Dense operator -> MPO by successive SVD factorization
        (site 0 least significant; reference mpo.py:1804)."""
        dim = d**length
        m = np.asarray(matrix, dtype=np.complex128)
        if m.shape != (dim, dim):
            msg = f"matrix shape {m.shape} != ({dim},{dim})"
            raise ValueError(msg)
        # reorder to site-major tensor (o_0, i_0, o_1, i_1, ...)
        t = m.reshape([d] * length + [d] * length)
        perm = []
        for site in range(length):
            perm += [length - 1 - site, 2 * length - 1 - site]
        t = t.transpose(perm)  # (o0, i0, o1, i1, ...)
        tensors = []
        left = 1
        mat = t.reshape(left * d * d, -1)
        max_chi = chi or dim
        for site in range(length - 1):
            u, s, vh = np.linalg.svd(mat, full_matrices=False)
            keep = min(int(np.sum(s > 1e-14 * s[0])), max_chi) if s[0] > 0 else 1
            keep = max(keep, 1)
            u = u[:, :keep]
            tensors.append(u.reshape(left, d, d, keep).transpose(1, 2, 0, 3))
            mat = (np.diag(s[:keep]) @ vh[:keep]).reshape(keep * d * d, -1)
            left = keep
        tensors.append(mat.reshape(left, d, d, 1).transpose(1, 2, 0, 3))
        dw = max(max(x.shape[2], x.shape[3]) for x in tensors)
        out = np.zeros((length, d, d, dw, dw), dtype=np.complex128)
        for i, x in enumerate(tensors):
            out[i, :, :, : x.shape[2], : x.shape[3]] = x
        return cls(out)

    # -- properties ---------------------------------------------------------
    @property
    def length(self) -> int:
        return self.tensors.shape[0]

    @property
    def physical_dimension(self) -> int:
        return self.tensors.shape[1]

    @property
    def bond_dimension(self) -> int:
        return self.tensors.shape[-1]

    # -- operations ---------------------------------------------------------
    def multiply(self, other, chi_out: int | None = None, threshold: float = 0.0,
                 start_site: int = 0):
        """Apply to an MPS (returns MPS) or compose with an MPO (returns MPO).

        A shorter MPO ``other`` is embedded at ``start_site`` (identities
        elsewhere) before composing (reference MPO.multiply start_site,
        mpo.py:1517-1577).
        """
        from .mps import MPS

        if not isinstance(other, (MPS, MPO)):
            msg = f"cannot multiply MPO with {type(other).__name__}"
            raise TypeError(msg)
        other_len = other.length
        if start_site < 0 or start_site + other_len > self.length:
            msg = (
                f"cannot embed length-{other_len} operand at start_site="
                f"{start_site} in MPO of length {self.length}"
            )
            raise ValueError(msg)
        if other_len != self.length:
            if isinstance(other, MPS):
                msg = "MPS operand must match the MPO length"
                raise ValueError(msg)
            eye = identity_mpo(self.length, self.physical_dimension,
                               dw=other.bond_dimension)
            eye[start_site : start_site + other_len] = other.tensors
            other = MPO(eye)
        if isinstance(other, MPS):
            # jit: eager complex device compute is unsupported on the
            # tunneled TPU platform (same below)
            run = jax.jit(
                lambda w, t: mpo_apply_mps(
                    w, t, chi_out=chi_out, threshold=threshold
                )
            )
            return MPS(tensors=fetch(run(to_device(self.tensors), to_device(other.tensors))))
        if isinstance(other, MPO):
            return MPO(fetch(jax.jit(mpo_compose)(to_device(self.tensors), to_device(other.tensors))))
        msg = f"cannot multiply MPO with {type(other).__name__}"
        raise TypeError(msg)

    def rotate(self) -> MPO:
        """Adjoint MPO (reference mpo.rotate, mpo.py:1579)."""
        return MPO(fetch(jax.jit(mpo_adjoint)(to_device(self.tensors))))

    def __add__(self, other: MPO) -> MPO:
        """Direct-sum bond stacking (reference __add__/mpo_sum, mpo.py:1928)."""
        a, b = self.tensors, other.tensors
        if a.shape[:3] != b.shape[:3]:
            msg = "MPO addition requires matching length and physical dims"
            raise ValueError(msg)
        length, d, _, da, _ = a.shape
        db = b.shape[-1]
        out = np.zeros((length, d, d, da + db, da + db), dtype=np.complex128)
        if length == 1:
            # single site: both boundary legs are index 0 — plain tensor sum
            out[0, :, :, 0, 0] = a[0, :, :, 0, 0] + b[0, :, :, 0, 0]
            return MPO(out)
        out[:, :, :, :da, :da] = a
        out[:, :, :, da:, da:] = b
        # boundary: both summands' boundary index 0 must merge on the edges
        first = np.zeros_like(out[0])
        first[:, :, 0, :da] = a[0][:, :, 0, :]
        first[:, :, 0, da:] = b[0][:, :, 0, :]
        out[0] = first
        last = np.zeros_like(out[-1])
        last[:, :, :da, 0] = a[-1][:, :, :, 0]
        last[:, :, da:, 0] = b[-1][:, :, :, 0]
        out[-1] = last
        return MPO(out)

    def to_matrix(self) -> np.ndarray:
        return mpo_to_matrix(self.tensors)

    def to_sparse_matrix(self):
        return mpo_to_sparse_matrix(self.tensors)

    def to_mps(self):
        """Vectorized d^2-MPS view (operator legs fused)."""
        from .mps import MPS

        return MPS(tensors=fetch(jax.jit(mpo_to_doubled_mps)(to_device(self.tensors))))

    def pad(self, dw: int) -> MPO:
        return MPO(pad_mpo(self.tensors, dw))

    def apply_local_operator(self, op: np.ndarray, site: int, side: str = "left") -> MPO:
        """Left- or right-multiply a one-site operator onto the MPO."""
        t = np.asarray(self.tensors).copy()
        if side == "left":
            t[site] = np.einsum("ab,bsmn->asmn", op, t[site])
        else:
            t[site] = np.einsum("tbmn,ba->tamn", t[site], op)
        return MPO(t)

    def partial_trace_site(self, site: int) -> np.ndarray:
        """Trace the physical legs of one site, returning its bond matrix
        ``M[wl, wr] = sum_s T[s, s, wl, wr]`` (reference MPO.partial_trace_site,
        mpo.py:157-174, which stores a ``(1, 1, wl, wr)`` placeholder; the
        fixed-shape layout returns the matrix instead — see
        :meth:`partial_trace_sites` for the composed reduced operator).
        """
        t = np.asarray(self.tensors[site])
        return np.einsum("ssab->ab", t)

    def partial_trace_sites(self, keep_sites: list[int]) -> MPO:
        """Reduced MPO over ``keep_sites`` with all other sites traced out
        (reference MPO.partial_trace_sites, mpo.py:176-206).

        Traced sites contribute their bond matrices, which are absorbed into
        the neighboring kept site, so the result is an MPO of length
        ``len(keep_sites)`` acting on the kept subspace (the reference keeps
        placeholder ``(1,1)``-leg sites instead; the operators agree).
        """
        if not keep_sites:
            msg = "keep_sites must be non-empty."
            raise ValueError(msg)
        keep = sorted(set(keep_sites))
        length = self.length
        if keep[0] < 0 or keep[-1] >= length:
            msg = f"keep_sites indices {keep} out of range for MPO length {length}."
            raise ValueError(msg)
        dw = self.bond_dimension
        d = self.physical_dimension
        out: list[np.ndarray] = []
        carry = np.eye(dw, dtype=np.complex128)  # pending left-bond transform
        for i in range(length):
            if i in keep:
                out.append(np.einsum("ab,stbc->stac", carry, self.tensors[i]))
                carry = np.eye(dw, dtype=np.complex128)
            else:
                m = self.partial_trace_site(i)
                if out and i > keep[0]:
                    # absorb into the previous kept site from the right
                    out[-1] = np.einsum("stab,bc->stac", out[-1], m)
                else:
                    carry = carry @ m
        return MPO(np.stack(out))

    # -- analysis (shared with the equivalence checker) --------------------
    def _normalized_doubled(self):
        run = jax.jit(
            lambda w: mps_ops.normalize_canonical(mpo_to_doubled_mps(w))
        )
        return run(to_device(self.tensors))

    def compute_identity_fidelity(self) -> float:
        """``|Tr O| / (d^L)`` normalized by the operator norm (reference
        mpo.py:1702 on unitary-like operators)."""
        length, d = self.length, self.physical_dimension
        canon, nrm = self._normalized_doubled()
        v = np.eye(d).reshape(-1) / np.sqrt(d)
        ident = mps_ops.product_state_tensors([v] * length, int(canon.shape[-1]), d=d * d)
        run = jax.jit(lambda i, c: jnp.abs(mps_ops.scalar_product(i, c)))
        overlap_abs = float(np.asarray(run(to_device(ident), canon)))
        return float(overlap_abs * np.asarray(nrm) / (d ** (length / 2)))

    def compute_schmidt_spectrum(self, cut: int) -> np.ndarray:
        """Operator Schmidt singular values across an integer bond cut
        (reference MPO.compute_schmidt_spectrum, mpo.py:1637-1661).

        ``cut`` lies in ``[0, length]``; internal cuts use bond
        ``(cut - 1, cut)`` and return UNNORMALIZED values (their squares sum
        to the squared Frobenius norm); boundary cuts return
        ``[||O||_F]``.
        """
        if isinstance(cut, bool) or not isinstance(cut, (int, np.integer)):
            msg = f"cut must be int, got {cut!r}"
            raise TypeError(msg)
        cut = int(cut)
        if cut < 0 or cut > self.length:
            msg = f"cut out of range: {cut} for length={self.length}"
            raise ValueError(msg)
        _, nrm = self._normalized_doubled()
        fro = float(np.asarray(nrm))
        if cut in {0, self.length}:
            return np.array([fro], dtype=np.float64)
        s = np.asarray(self.operator_schmidt_spectrum(cut - 1), dtype=np.float64)
        s = np.sort(s[s > np.finfo(np.float64).tiny])[::-1]
        return s * fro

    def compute_entanglement_entropy(self, cut: int, *, base: float = np.e) -> float:
        """Von Neumann entropy of the normalized Schmidt spectrum at ``cut``
        (reference MPO.compute_entanglement_entropy, mpo.py:1663-1700)."""
        import math

        base_float = float(base)
        if (
            not np.isfinite(base_float)
            or base_float <= 0.0
            or math.isclose(base_float, 1.0)
        ):
            msg = f"Entropy base must be finite, >0, and !=1; got {base!r}"
            raise ValueError(msg)
        s = self.compute_schmidt_spectrum(cut)
        if s.size == 0:
            return 0.0
        smax = float(np.max(np.abs(s)))
        if not np.isfinite(smax) or smax <= 0.0:
            return 0.0
        p = np.square(s / smax)
        z = float(np.sum(p, dtype=np.float64))
        if z <= 0.0:
            return 0.0
        p /= z
        nz = p > np.finfo(np.float64).tiny
        ent = -np.sum(p[nz] * np.log(p[nz]), dtype=np.float64) / math.log(base_float)
        return float(max(ent, 0.0))

    def check_if_identity(self, fidelity: float) -> bool:
        """True when the identity fidelity reaches ``fidelity`` (reference
        MPO.check_if_identity, mpo.py:2028-2040)."""
        return self.compute_identity_fidelity() >= fidelity

    def _check_bond(self, bond: int) -> None:
        if not 0 <= bond < self.length - 1:
            msg = f"bond {bond} out of range for MPO of length {self.length}"
            raise ValueError(msg)

    def operator_schmidt_spectrum(self, bond: int) -> np.ndarray:
        self._check_bond(bond)
        canon, _ = self._normalized_doubled()
        spectra, _ = jax.jit(mps_ops.bond_spectra)(canon)
        return np.asarray(spectra)[bond]

    def operator_entanglement_entropy(self, bond: int) -> float:
        self._check_bond(bond)
        canon, _ = self._normalized_doubled()
        _, ents = jax.jit(mps_ops.bond_spectra)(canon)
        return float(np.asarray(ents)[bond])

    def compress(self, threshold: float = 0.0, max_bond_dim: int | None = None) -> MPO:
        """SVD-compress the MPO via its doubled-MPS view (norm preserved)."""
        run = jax.jit(
            lambda w: mps_ops.compress(
                mpo_to_doubled_mps(w), threshold=threshold, max_bond_dim=max_bond_dim
            )
        )
        out = run(to_device(self.tensors))
        length, dd, chi, _ = out.shape
        d = self.physical_dimension
        arr = fetch(out).reshape(length, d, d, chi, chi)
        # slice the surviving rank off the padding so bond_dimension reports
        # it (reference MPO.compress shrinks its tensors the same way).  Rank
        # comes from the bond spectra (gauge-invariant — canonical-gauge
        # column occupancy says nothing about weight); kept directions occupy
        # the leading slots, the same contract chi_out slicing relies on.
        if length > 1:
            spectra, _ = jax.jit(mps_ops.bond_spectra)(out)
            spectra = np.asarray(spectra)
            smax = max(float(np.max(spectra)), 1e-300)
            eff = int(np.max(np.sum(spectra > 1e-12 * smax, axis=1)))
            eff = max(eff, 1)
            if eff < chi:
                arr = arr[:, :, :, :eff, :eff]
        self.tensors = np.ascontiguousarray(arr)
        return self

    def check_if_valid_mpo(self) -> bool:
        return self.tensors is not None and self.tensors.ndim == 5
