"""User-facing MPS class (reference API parity over the functional core).

Reference: mqt-yaqs core/data_structures/mps.py.  This class is a host-side
convenience wrapper around the padded-array functional kernels in
:mod:`yaqs_tpu.core.mps_ops`: it owns one padded ``(L, d, chi, chi)`` array,
exposes the reference's preset constructors, canonicalization, expectation,
measurement, entropy, and conversion methods, and stays out of the jitted hot
path (engines operate on the raw arrays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.host import fetch, to_device
from . import mps_ops

__all__ = ["MPS"]

# Jitted wrappers: the class is a host-side convenience layer, but its
# compute must still run as compiled programs — eager complex device ops are
# UNIMPLEMENTED on the tunneled TPU platform (see yaqs_tpu.utils.host).
_normalize_j = jax.jit(mps_ops.normalize_canonical, static_argnames=("method",))
_canonicalize_j = jax.jit(mps_ops.canonicalize_right, static_argnames=("method",))
_scalar_j = jax.jit(mps_ops.scalar_product)
_norm2_j = jax.jit(mps_ops.norm_squared)
_site_expectations_j = jax.jit(mps_ops.site_expectations)
_left_envs_j = jax.jit(mps_ops.left_gram_environments)
_site_expectation_j = jax.jit(mps_ops.site_expectation)
_apply_one_j = jax.jit(mps_ops.apply_one_site_operator)
_bond_entropies_j = jax.jit(mps_ops.bond_entropies)
# one-site basis rotation on every physical leg (global-basis measurement)
_rotate_all_j = jax.jit(
    lambda t, u: jnp.einsum("ab,lbij->laij", u.astype(t.dtype), t)
)


class MPS:
    """Padded-array matrix product state with tracked padding metadata."""

    def __init__(
        self,
        length: int | None = None,
        tensors=None,
        state: str = "zeros",
        chi: int = 16,
        physical_dimensions: int | list[int] | None = None,
        pad: int | None = None,
        basis_string: str | None = None,
        rng: np.random.Generator | None = None,
    ) -> None:
        """Build from a preset name or explicit tensors.

        Args:
            length: number of sites (required unless tensors given).
            tensors: padded ``(L, d, chi, chi)`` array or list of ragged
                ``(d, chi_l, chi_r)`` site tensors.
            state: preset product state (zeros/ones/x+/x-/y+/y-/Neel/wall) or
                ``random`` (Haar product) when tensors is None.
            chi: padded bond dimension for preset construction.
            physical_dimensions: local dimension(s); max is the padding.
            pad: alias for chi (reference keyword).
        """
        if pad is not None:
            chi = pad
        if isinstance(physical_dimensions, (list, tuple)):
            d = max(physical_dimensions)
        elif physical_dimensions is not None:
            d = int(physical_dimensions)
        else:
            d = 2
        if tensors is not None:
            if isinstance(tensors, (list, tuple)):
                length = len(tensors)
                d = max(int(t.shape[0]) for t in tensors)
                chi_needed = max(max(int(t.shape[1]), int(t.shape[2])) for t in tensors)
                chi = max(chi, chi_needed)
                arr = np.zeros((length, d, chi, chi), dtype=np.complex128)
                for i, t in enumerate(tensors):
                    tt = np.asarray(t, dtype=np.complex128)
                    arr[i, : tt.shape[0], : tt.shape[1], : tt.shape[2]] = tt
                self.tensors = arr
            else:
                self.tensors = np.asarray(tensors)
                length, d, chi, _ = self.tensors.shape
        else:
            if length is None:
                msg = "MPS requires a length or explicit tensors"
                raise ValueError(msg)
            if basis_string is not None and state == "zeros":
                state = "basis"  # a basis string implies the basis preset
            self.tensors = mps_ops.named_product_state(
                state, length, chi, d, basis_string=basis_string, rng=rng
            )
        self.length = int(length)
        self.physical_dimensions = (
            list(physical_dimensions)
            if isinstance(physical_dimensions, (list, tuple))
            else [d] * self.length
        )

    # -- basic properties ---------------------------------------------------
    @property
    def d(self) -> int:
        return self.tensors.shape[1]

    @property
    def chi(self) -> int:
        return self.tensors.shape[-1]

    def _j(self) -> jnp.ndarray:
        return to_device(self.tensors)

    # -- gauge / norm -------------------------------------------------------
    def normalize(self, form: str = "B") -> float:
        """Canonicalize at site 0 and scale to unit norm; returns the norm."""
        del form
        canon, nrm = _normalize_j(self._j())
        self.tensors = fetch(canon)
        return float(nrm)

    def set_canonical_form(self, center: int = 0) -> None:
        if center != 0:
            msg = "only canonical center 0 is supported in the padded layout"
            raise NotImplementedError(msg)
        self.tensors = fetch(_canonicalize_j(self._j()))

    def norm(self) -> float:
        """Squared norm <psi|psi> (reference MPS.norm semantics)."""
        return float(_norm2_j(self._j()))

    def scalar_product(self, other: MPS) -> complex:
        # zero padding is overlap-neutral (boundary-bond-0 convention), so
        # mismatched padded chis — e.g. after a two-site apply_local doubled
        # one side — are reconciled by padding the smaller operand
        bra, ket = self, other
        if bra.chi != ket.chi:
            common = max(bra.chi, ket.chi)
            bra = bra.copy().pad_bond_dimension(common)
            ket = ket.copy().pad_bond_dimension(common)
        return complex(fetch(_scalar_j(bra._j(), to_device(ket.tensors))))

    # -- expectation / measurement -----------------------------------------
    def expect(self, op, site: int) -> float:
        """One-site expectation (state is canonicalized + normalized first)."""
        canon, _ = _normalize_j(self._j())
        ops = to_device(np.asarray(op, dtype=np.complex128)[None])
        val = _site_expectations_j(canon, ops, jnp.asarray([site]))[0]
        return float(np.asarray(jnp.real(val)))

    def local_expect(self, op, site: int) -> complex:
        """<psi|O_site|psi> without normalization."""
        t = self._j()
        envs = _left_envs_j(t)
        return complex(
            fetch(_site_expectation_j(t, envs, to_device(np.asarray(op, dtype=np.complex128)), site))
        )

    def mixed_expectation(self, bra: MPS, op, site: int | None = None) -> complex:
        """Mixed matrix element ``<bra|O|ket>`` with ``self`` as the ket
        (reference MPS.mixed_expectation, mps.py:1157-1172: apply the local
        observable to a copy of the ket, then contract with the bra).

        ``op`` is a local operator matrix applied at ``site``, or an
        Observable-like object carrying ``matrix`` and ``site_list``.
        """
        if site is None:
            sites = list(getattr(op, "site_list"))
            matrix = np.asarray(getattr(op, "matrix"), dtype=np.complex128)
            if len(sites) == 1:
                site = sites[0]
                op = matrix
            elif len(sites) == 2:
                # two-site observables follow apply_local conventions
                # (reference mixed_expectation accepts one- OR two-site ops)
                ket = self.copy().apply_local(matrix, tuple(int(s) for s in sites))
                return bra.scalar_product(ket)
            else:
                msg = "mixed_expectation supports one- or two-site observables"
                raise NotImplementedError(msg)
        elif isinstance(site, (list, tuple)):
            ket = self.copy().apply_local(np.asarray(op, dtype=np.complex128), tuple(site))
            return bra.scalar_product(ket)
        ket = self.copy().apply_local(op, site)
        return bra.scalar_product(ket)

    def measure_shots(
        self, shots: int, basis: str = "Z", *, seed: int | None = None
    ) -> dict[int, int]:
        """Projective sampling in a global X/Y/Z basis; returns basis-state
        counts (site 0 least significant).  Reference MPS.measure_shots
        (mps.py:1347-1413): rotate every site into the measurement basis,
        then Z-sample."""
        from ..digital.engine import counts_from_samples, sample_bitstrings

        canon, _ = _normalize_j(self._j())
        u = self._measurement_rotation(basis)
        if u is not None:
            canon = _rotate_all_j(canon, to_device(u))
        key = jax.random.PRNGKey(0 if seed is None else seed)
        samples = np.asarray(sample_bitstrings(canon, key, shots))
        return counts_from_samples(samples, self.d)

    def measure_single_shot(
        self, basis: str = "Z", *, seed: int | None = None
    ) -> int:
        return next(iter(self.measure_shots(1, basis=basis, seed=seed)))

    def _measurement_rotation(self, basis: str) -> np.ndarray | None:
        """Map a basis name to the bra-row rotation (|b_k> -> |k>); None
        means the computational basis (no rotation needed)."""
        basis = str(basis).upper()
        if basis == "Z":
            return None
        if basis not in ("X", "Y"):
            msg = f"Invalid basis {basis!r}; use X, Y, or Z."
            raise ValueError(msg)
        if self.d != 2:
            msg = "X/Y measurements require qubits"
            raise ValueError(msg)
        if basis == "X":
            return np.array([[1, 1], [1, -1]], dtype=np.complex128) / np.sqrt(2)
        return np.array([[1, -1j], [1, 1j]], dtype=np.complex128) / np.sqrt(2)

    def measure(self, site: int, basis: str = "Z", rng=None) -> int:
        """In-place projective measurement of one site (reference MPS.measure,
        mps.py:1415-1489): rotate to the basis, sample the outcome from the
        local reduced density, project, renormalize.  Returns the outcome."""
        if site < 0 or site >= self.length:
            msg = f"Invalid site {site} for MPS of length {self.length}."
            raise ValueError(msg)
        u = self._measurement_rotation(basis)
        if u is not None:
            # rows of u are the measurement-basis bras <b_k|, so applying u
            # maps |b_k> -> |k>: measurement basis -> computational
            self.apply_local(u, site)
        canon, _ = _normalize_j(self._j())
        envs = _left_envs_j(canon)
        probs = []
        for k in range(self.d):
            proj = np.zeros((self.d, self.d), dtype=np.complex128)
            proj[k, k] = 1.0
            p = float(
                np.real(fetch(_site_expectation_j(canon, envs, to_device(proj), site)))
            )
            probs.append(max(p, 0.0))
        probs = np.asarray(probs)
        probs = probs / probs.sum()
        rng = rng or np.random.default_rng()
        outcome = int(rng.choice(self.d, p=probs))
        proj = np.zeros((self.d, self.d), dtype=np.complex128)
        proj[outcome, outcome] = 1.0
        out = _apply_one_j(canon, to_device(proj), site)
        out, _ = _normalize_j(out)
        self.tensors = fetch(out)
        if u is not None:
            self.apply_local(u.conj().T, site)  # rotate back
        return outcome

    def project_onto_bitstring(self, bitstring: str) -> float:
        """PVM probability of a computational basis string (site 0 first char)."""
        psi = mps_ops.to_statevector_np(self.tensors)
        idx = sum(int(b) * self.d**i for i, b in enumerate(bitstring))
        n2 = np.vdot(psi, psi).real
        return float(abs(psi[idx]) ** 2 / n2)

    # -- entropy / diagnostics ---------------------------------------------
    def get_entropy(self, bond: int) -> float:
        canon, _ = _normalize_j(self._j())
        return float(np.asarray(_bond_entropies_j(canon))[bond])

    def get_schmidt_spectrum(self, bond: int) -> np.ndarray:
        def run(t):
            canon, _ = mps_ops.normalize_canonical(t)
            spectra, _ = mps_ops.bond_spectra(canon)
            return spectra

        return np.asarray(jax.jit(run)(self._j())[bond])

    def bond_dimensions(self, tol: float = 1e-10) -> list[int]:
        """Effective (numerical-rank) bond dimensions at each of the ``L-1``
        internal bonds (reference MPS.bond_dimensions; in the padded layout
        this counts Schmidt values above ``tol`` relative to the largest)."""
        def run(t):
            canon, _ = mps_ops.normalize_canonical(t)
            spectra, _ = mps_ops.bond_spectra(canon)
            return spectra

        spectra = np.asarray(jax.jit(run)(self._j()))
        out = []
        for s in spectra:
            smax = float(np.max(s)) if s.size else 0.0
            out.append(int(np.sum(s > tol * smax)) if smax > 0 else 1)
        return out

    def check_if_valid_mps(self) -> bool:
        """Shape/bond consistency of the padded layout (reference
        MPS.check_if_valid_mps): rank-4 padded array, square uniform bonds,
        finite entries, nonzero norm."""
        t = np.asarray(self.tensors)
        return (
            t.ndim == 4
            and t.shape[0] == self.length
            and t.shape[2] == t.shape[3]
            and bool(np.isfinite(t).all())
            and float(np.vdot(t[0], t[0]).real) > 0.0
        )

    def check_canonical_form(self, tol: float = 1e-8) -> bool:
        """True when the state is right-canonical with center at site 0 (the
        gauge discipline every engine entry point expects; reference
        MPS.check_canonical_form returns the center sites instead — here the
        center is fixed by design)."""
        t = np.asarray(self.tensors)
        length, _, chi, _ = t.shape
        del chi
        for i in range(length - 1, 0, -1):
            a = t[i]
            # right-canonical: sum_s A[s] A[s]^dag == P (projector onto the
            # active left-bond subspace); padded rows are zero, so check
            # idempotency + hermiticity instead of strict identity
            g = np.einsum("sab,scb->ac", a, a.conj())
            if not np.allclose(g, g.conj().T, atol=tol):
                return False
            if not np.allclose(g @ g, g, atol=tol):
                return False
        return True

    def almost_equal(self, other: MPS, tol: float = 1e-8) -> bool:
        """Physical-state equality up to global phase: ``|<a|b>|`` within
        ``tol`` of both norms (reference MPS.almost_equal)."""
        if self.length != other.length or self.d != other.d:
            return False
        ov = abs(self.scalar_product(other))
        na = float(np.sqrt(self.norm()))
        nb = float(np.sqrt(other.norm()))
        return bool(abs(ov - na * nb) <= tol * max(na * nb, 1.0))

    def get_max_bond(self) -> int:
        return self.chi

    def get_total_bond(self) -> int:
        return self.chi * (self.length - 1)

    def get_cost(self) -> int:
        """Contraction-cost heuristic sum(chi^3) (reference mps.py:549-602)."""
        return (self.length - 1) * self.chi**3

    # -- manipulation -------------------------------------------------------
    def apply_local(self, op, site: int | list[int] | tuple[int, int]) -> MPS:
        """Apply a one- or two-site operator in place.

        Two-site support mirrors the reference (MPS.apply_local,
        mps.py:1045-1155): adjacent pairs via merged exact SVD, the periodic
        wrap ``(L-1, 0)`` via bubble-SWAPs (gate given in ``|q_{L-1}, q_0>``
        ordering), plus general distant pairs via SWAP routing.  The padded
        bond dimension is doubled first so the exact split loses nothing;
        call :meth:`compress` afterwards to trim.
        """
        if isinstance(site, (list, tuple)):
            if len(site) == 1:
                site = site[0]
            elif len(site) == 2:
                for s_ in site:
                    if not 0 <= int(s_) < self.length:
                        msg = f"site {s_} outside [0, {self.length})"
                        raise ValueError(msg)
                return self._apply_two_site(np.asarray(op, dtype=np.complex128), *site)
            else:
                msg = "apply_local supports one- or two-site operators"
                raise ValueError(msg)
        if not 0 <= int(site) < self.length:
            msg = f"site {site} outside [0, {self.length})"
            raise ValueError(msg)
        self.tensors = fetch(
            _apply_one_j(self._j(), to_device(np.asarray(op, dtype=np.complex128)), site)
        )
        return self

    def _apply_two_site(self, op4: np.ndarray, i: int, j: int) -> MPS:
        from ..ops.decomp import merge_two_site, split_two_site_truncated

        length, d = self.length, self.d
        if op4.shape != (d * d, d * d):
            msg = f"two-site operator must be ({d * d}, {d * d})"
            raise ValueError(msg)
        wrap = (i, j) == (length - 1, 0)
        if wrap:
            # reference ordering |q_{L-1}, q_0>: permute to merged |q_0, q_{L-1}>
            perm = np.zeros((d * d, d * d))
            for a in range(d):
                for b in range(d):
                    perm[d * b + a, d * a + b] = 1.0
            op4 = perm.T @ op4 @ perm
            i, j = 0, length - 1
        swapped = i > j
        if swapped:
            # reorder so i < j; swap the operator's qubit significance
            op4 = op4.reshape(d, d, d, d).transpose(1, 0, 3, 2).reshape(d * d, d * d)
            i, j = j, i
        # the merged bond's exact rank can reach d*chi (2*chi only for
        # qubits) — pad to d*chi so the split below stays exact for qudits
        self.pad_bond_dimension(self.d * self.chi)
        t = self._j()
        chi = t.shape[-1]

        @jax.jit
        def nn(t, left, mat4):
            theta = merge_two_site(t[left], t[left + 1])
            th = jnp.asarray(mat4, t.dtype) @ theta.reshape(d * d, chi * chi)
            a, b, _, _ = split_two_site_truncated(
                th.reshape(d, d, chi, chi), chi,
                mode="relative", threshold=0.0, min_keep=1,
                svd_distribution="right",
            )
            return t.at[left].set(a).at[left + 1].set(b)

        sw = np.eye(d * d).reshape(d, d, d, d).transpose(1, 0, 2, 3).reshape(d * d, d * d)
        sw_d = to_device(sw.astype(np.complex128))
        op4_d = to_device(op4)
        # route j down to i+1 with SWAPs, apply, route back
        for k in range(j - 1, i, -1):
            t = nn(t, k, sw_d)
        t = nn(t, i, op4_d)
        for k in range(i + 1, j):
            t = nn(t, k, sw_d)
        self.tensors = fetch(t)
        return self

    def compress(self, threshold: float = 0.0, max_bond_dim: int | None = None) -> MPS:
        run = jax.jit(
            lambda t: mps_ops.compress(
                t, threshold=threshold, max_bond_dim=max_bond_dim
            )
        )
        self.tensors = fetch(run(self._j()))
        return self

    def pad_bond_dimension(self, chi: int) -> MPS:
        cur = self.chi
        if chi < cur:
            msg = "pad_bond_dimension cannot shrink; use compress"
            raise ValueError(msg)
        if chi > cur:
            self.tensors = np.pad(
                np.asarray(self.tensors),
                ((0, 0), (0, 0), (0, chi - cur), (0, chi - cur)),
            )
        return self

    def to_vec(self) -> np.ndarray:
        return mps_ops.to_statevector_np(self.tensors)

    def copy(self) -> MPS:
        out = MPS(tensors=np.array(self.tensors, copy=True))
        out.physical_dimensions = list(self.physical_dimensions)
        return out
