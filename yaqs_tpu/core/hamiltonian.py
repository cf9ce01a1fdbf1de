"""User-facing Hamiltonian specification with MPO / dense / sparse encodings.

Reference parity: mqt-yaqs core/data_structures/hamiltonian.py — factories
delegate to the MPO builders; dense/sparse forms are cached for the
small-system backends; dense/sparse sources are factorized into an MPO on
demand (``ensure_mpo``) so every representation can drive every engine; the
backend is chosen by the *State's* representation.
"""

from __future__ import annotations

import warnings

import numpy as np

from .mpo_builders import (
    heisenberg_mpo,
    identity_mpo,
    ising_mpo,
    mpo_from_pauli_sum,
    mpo_from_terms,
    mpo_to_matrix,
    mpo_to_sparse_matrix,
)

__all__ = ["Hamiltonian"]

# warn before densifying/factorizing operators above this Hilbert dimension
# (reference hamiltonian.py large-conversion warnings)
_LARGE_DENSE_DIM = 4096


def _is_sparse(m: object) -> bool:
    return hasattr(m, "tocsr") and hasattr(m, "toarray")


class Hamiltonian:
    """Operator spec holding a padded MPO array, a dense matrix, and/or a
    scipy-sparse matrix; encodings are derived and cached on demand."""

    def __init__(
        self,
        mpo: np.ndarray | None = None,
        matrix=None,
        length: int | None = None,
        d: int = 2,
    ):
        if mpo is None and matrix is None:
            msg = "Hamiltonian requires an MPO or a (dense or sparse) matrix."
            raise ValueError(msg)
        if d <= 0:
            msg = f"physical dimension must be positive, got {d}"
            raise ValueError(msg)
        self._mpo = None if mpo is None else np.asarray(mpo)
        self._sparse = None
        self._matrix = None
        if matrix is not None:
            if _is_sparse(matrix):
                self._sparse = matrix.tocsr()
                shape = self._sparse.shape
            else:
                self._matrix = np.asarray(matrix, dtype=np.complex128)
                shape = self._matrix.shape
            if len(shape) != 2 or shape[0] != shape[1]:
                msg = f"Hamiltonian matrix must be square, got shape {shape}"
                raise ValueError(msg)
        if self._mpo is not None:
            self.length = int(self._mpo.shape[0])
            self.d = int(self._mpo.shape[1])
        else:
            dim = shape[0]
            if length is None:
                length = int(round(np.log(dim) / np.log(d)))
            if d**length != dim:
                msg = (
                    f"matrix dimension {dim} is not d**length "
                    f"(d={d}, length={length})"
                )
                raise ValueError(msg)
            self.length = int(length)
            self.d = int(d)

    # -- factories (reference hamiltonian.py:176-315) ----------------------

    @classmethod
    def ising(cls, length: int, J: float = 1.0, g: float = 0.5) -> Hamiltonian:
        return cls(mpo=ising_mpo(length, J, g))

    @classmethod
    def heisenberg(
        cls, length: int, Jx: float = 1.0, Jy: float = 1.0, Jz: float = 1.0, h: float = 0.0
    ) -> Hamiltonian:
        return cls(mpo=heisenberg_mpo(length, Jx, Jy, Jz, h))

    @classmethod
    def pauli(
        cls,
        length: int,
        two_body: list[tuple[complex, str, str]] | None = None,
        one_body: list[tuple[complex, str]] | None = None,
        bc: str = "open",
    ) -> Hamiltonian:
        """Generic nearest-neighbor two-body + one-body Pauli Hamiltonian
        (reference mpo.pauli, mpo.py:249)."""
        if length <= 0:
            msg = f"length must be positive, got {length}"
            raise ValueError(msg)
        if bc not in {"open", "periodic"}:
            msg = f"bc must be 'open' or 'periodic', got {bc!r}"
            raise ValueError(msg)
        terms: list[tuple[complex, list[tuple[int, object]]]] = []
        bonds = range(length) if bc == "periodic" else range(length - 1)
        for c, a, b in two_body or []:
            for i in bonds:
                j = (i + 1) % length
                if j < i:  # periodic wrap term: keep ascending site order
                    terms.append((c, [(j, b), (i, a)]))
                else:
                    terms.append((c, [(i, a), (j, b)]))
        for c, a in one_body or []:
            terms.extend((c, [(i, a)]) for i in range(length))
        return cls(mpo=mpo_from_terms(terms, length))

    @classmethod
    def from_pauli_sum(cls, terms: list[tuple[complex, str]], length: int) -> Hamiltonian:
        return cls(mpo=mpo_from_pauli_sum(terms, length))

    @classmethod
    def from_mpo(cls, mpo: np.ndarray) -> Hamiltonian:
        return cls(mpo=np.asarray(mpo))

    @classmethod
    def from_matrix(cls, matrix, length: int | None = None, d: int = 2) -> Hamiltonian:
        """Dense or scipy-sparse square matrix."""
        return cls(matrix=matrix, length=length, d=d)

    @classmethod
    def identity(cls, length: int, d: int = 2) -> Hamiltonian:
        return cls(mpo=identity_mpo(length, d))

    @classmethod
    def fermi_hubbard_1d(
        cls, length: int, t: float, u: float, *, jordan_wigner: bool = False
    ) -> Hamiltonian:
        from ..models.hamiltonians import fermi_hubbard_1d_mpo

        return cls(mpo=fermi_hubbard_1d_mpo(length, t, u, jordan_wigner=jordan_wigner))

    @classmethod
    def coupled_transmon(
        cls,
        length: int,
        qubit_dim: int,
        resonator_dim: int,
        qubit_freq: float,
        resonator_freq: float,
        anharmonicity: float,
        coupling: float,
    ) -> Hamiltonian:
        from ..models.hamiltonians import coupled_transmon_mpo

        return cls(
            mpo=coupled_transmon_mpo(
                length, qubit_dim, resonator_dim, qubit_freq, resonator_freq,
                anharmonicity, coupling,
            )
        )

    @classmethod
    def trapped_ion(cls, positions, masses, omega, **kwargs) -> Hamiltonian:
        from ..models.hamiltonians import trapped_ion_mpo

        return cls(mpo=trapped_ion_mpo(positions, masses, omega, **kwargs))

    @classmethod
    def bose_hubbard(
        cls, length: int, local_dim: int, omega: float, hopping_j: float, hubbard_u: float
    ) -> Hamiltonian:
        from ..models.hamiltonians import bose_hubbard_mpo

        return cls(mpo=bose_hubbard_mpo(length, local_dim, omega, hopping_j, hubbard_u))

    # -- encodings ---------------------------------------------------------

    def ensure_mpo(self) -> np.ndarray:
        """MPO encoding; dense/sparse sources are SVD-factorized on demand
        (reference hamiltonian ensure_mpo conversion path) with a warning
        above the large-system threshold."""
        if self._mpo is None:
            from .mpo import MPO

            dim = self.d**self.length
            if dim > _LARGE_DENSE_DIM:
                warnings.warn(
                    f"Factorizing a dense {dim}x{dim} operator into an MPO; "
                    "this is exponential in system size — prefer an MPO "
                    "factory for large systems.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            self._mpo = MPO.from_matrix(
                self.ensure_matrix(), self.length, self.d
            ).tensors
        return self._mpo

    def ensure_matrix(self) -> np.ndarray:
        if self._matrix is None:
            if self._sparse is not None:
                dim = self._sparse.shape[0]
                if dim > _LARGE_DENSE_DIM:
                    warnings.warn(
                        f"Densifying a sparse {dim}x{dim} operator.",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                self._matrix = np.asarray(
                    self._sparse.toarray(), dtype=np.complex128
                )
            else:
                self._matrix = mpo_to_matrix(self._mpo)
        return self._matrix

    def ensure_sparse(self):
        """CSR form (reference hamiltonian.ensure_sparse, hamiltonian.py:364);
        built from the MPO channels without a dense intermediate."""
        if self._sparse is None:
            if self._mpo is not None:
                self._sparse = mpo_to_sparse_matrix(self._mpo)
            else:
                import scipy.sparse as sp

                self._sparse = sp.csr_matrix(self._matrix)
        return self._sparse
