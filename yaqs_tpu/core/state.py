"""User-facing initial-state specification.

Reference parity: mqt-yaqs core/data_structures/state.py — three
representations selecting the backend (``mps`` -> TJM, ``vector`` -> MCWF,
``density_matrix`` -> Lindblad), manual data (tensors / vector /
density_matrix) inferring the representation, lazy encoding, and cross-
encoding MPS -> vector -> rho.
"""

from __future__ import annotations

import numpy as np

from . import mps_ops

__all__ = ["State"]

_REPRESENTATIONS = ("mps", "vector", "density_matrix")


class State:
    """Initial-state spec: preset product states or explicit data.

    Args:
        length: Number of sites (required unless explicit data is given).
        state: Preset name (``zeros/ones/x+/x-/y+/y-/Neel/wall``) used when no
            explicit data is provided.
        representation: ``"mps"`` (default), ``"vector"``, or
            ``"density_matrix"``; inferred from explicit data when omitted.
        tensors: Explicit MPS tensors — either a padded ``(L, d, chi, chi)``
            array or a list of ``(d, chi_l, chi_r)`` site tensors.
        vector: Explicit dense state vector (site 0 least significant).
        density_matrix: Explicit density matrix.
        physical_dimensions: Per-site local dimensions (uniform padding applies).
    """

    def __init__(
        self,
        length: int | None = None,
        state: str = "zeros",
        representation: str | None = None,
        tensors=None,
        vector=None,
        density_matrix=None,
        physical_dimensions: list[int] | int | None = None,
        basis_string: str | None = None,
        initial: str | None = None,
    ) -> None:
        if initial is not None:
            # reference keyword parity: mqt-yaqs names the preset ``initial``
            # (state.py:54); this build's positional name is ``state``
            state = initial
        n_data = sum(x is not None for x in (tensors, vector, density_matrix))
        if n_data > 1:
            msg = "Provide at most one of tensors/vector/density_matrix."
            raise ValueError(msg)
        inferred = None
        if tensors is not None:
            inferred = "mps"
        elif vector is not None:
            inferred = "vector"
        elif density_matrix is not None:
            inferred = "density_matrix"
        if representation is None:
            representation = inferred or "mps"
        if representation not in _REPRESENTATIONS:
            msg = f"Unknown representation {representation!r}"
            raise ValueError(msg)
        if inferred is not None and representation != inferred and inferred != "mps":
            # cross-encoding handled lazily; mps tensors can encode to vector
            pass

        self.representation = representation
        if basis_string is not None and state == "zeros":
            # providing a basis string implies the computational-basis preset
            state = "basis"
        self.state = state
        self.basis_string = basis_string
        self.tensors = tensors
        self.vector = None if vector is None else np.asarray(vector, dtype=np.complex128)
        self.density_matrix = (
            None if density_matrix is None else np.asarray(density_matrix, dtype=np.complex128)
        )

        if isinstance(physical_dimensions, int):
            self.d = physical_dimensions
            self._phys_dims = None
        elif physical_dimensions is not None:
            self._phys_dims = [int(x) for x in physical_dimensions]
            self.d = max(self._phys_dims)
            if length is None:
                length = len(self._phys_dims)
        else:
            self.d = 2
            self._phys_dims = None

        if length is None:
            if self.vector is not None:
                length = int(round(np.log(self.vector.size) / np.log(self.d)))
            elif self.density_matrix is not None:
                length = int(round(np.log(self.density_matrix.shape[0]) / np.log(self.d)))
            elif tensors is not None:
                length = len(tensors)
            else:
                msg = "State requires a length or explicit data."
                raise ValueError(msg)
        self.length = int(length)

    @classmethod
    def from_mps(cls, mps) -> State:
        """Wrap an MPS (class instance or padded ``(L, d, chi, chi)`` array)
        as an ``mps``-representation State (reference state.py:176)."""
        tensors = np.asarray(getattr(mps, "tensors", mps))
        return cls(length=tensors.shape[0], tensors=tensors,
                   physical_dimensions=int(tensors.shape[1]))

    @property
    def mps(self):
        """The state as an :class:`~yaqs_tpu.core.mps.MPS` (reference
        state.py:243), materializing the encoding on first access."""
        from .mps import MPS

        return MPS(tensors=self.ensure_encoded("mps").tensors)

    def ensure_encoded(self, representation: str | None = None) -> State:
        """Materialize the requested representation's data in place and
        return ``self`` (reference State.ensure_encoded, state.py:167)."""
        rep = representation or self.representation
        if rep not in _REPRESENTATIONS:
            msg = f"Unknown representation {rep!r}"
            raise ValueError(msg)
        if rep == "vector":
            if self.vector is None:
                self.vector = self.to_vector()
        elif rep == "density_matrix":
            if self.density_matrix is None:
                self.density_matrix = self.to_density_matrix()
        elif self.tensors is None:
            chi = (
                1
                if self.state not in {"haar-random"} and self.vector is None
                else min(2 ** (self.length // 2), 64)
            )
            self.tensors = self.to_padded_mps(max(chi, 1))
        return self

    @property
    def physical_dimensions(self) -> list[int]:
        """Per-site local dimensions (reference state.py metadata contract)."""
        if self._phys_dims is not None:
            return list(self._phys_dims)
        return [self.d] * self.length

    # -- encodings ---------------------------------------------------------

    def to_padded_mps(self, chi: int) -> np.ndarray:
        """Padded ``(L, d, chi, chi)`` numpy tensors, normalized, canonical at 0."""
        if self.tensors is not None:
            arr = self.tensors
            if isinstance(arr, (list, tuple)):
                out = np.zeros((self.length, self.d, chi, chi), dtype=np.complex128)
                for i, t in enumerate(arr):
                    t = np.asarray(t, dtype=np.complex128)
                    dd, dl, dr = t.shape
                    if dl > chi or dr > chi or dd > self.d:
                        msg = f"site tensor {i} shape {t.shape} exceeds padding (d={self.d}, chi={chi})"
                        raise ValueError(msg)
                    out[i, :dd, :dl, :dr] = t
                arr = out
            else:
                arr = np.asarray(arr, dtype=np.complex128)
                if arr.shape[-1] < chi:
                    pad = chi - arr.shape[-1]
                    arr = np.pad(arr, [(0, 0), (0, 0), (0, pad), (0, pad)])
                elif arr.shape[-1] > chi:
                    msg = f"tensors padded to {arr.shape[-1]} exceed requested chi={chi}"
                    raise ValueError(msg)
            import jax

            from ..utils.host import fetch, to_device

            canon, _ = jax.jit(mps_ops.normalize_canonical)(to_device(arr))
            return fetch(canon)
        if self.vector is not None:
            psi = self.vector / np.linalg.norm(self.vector)
            return mps_ops.statevector_to_mps(psi, self.length, chi, self.d)
        if self.density_matrix is not None:
            msg = "density_matrix states cannot encode to MPS (mixed state)"
            raise ValueError(msg)
        return mps_ops.named_product_state(
            self.state, self.length, chi, self.d, basis_string=self.basis_string
        )

    def to_vector(self) -> np.ndarray:
        """Dense normalized state vector (site 0 least significant)."""
        if self.vector is not None:
            return self.vector / np.linalg.norm(self.vector)
        if self.density_matrix is not None:
            msg = "density_matrix states have no pure-state vector"
            raise ValueError(msg)
        if self.tensors is None:
            # materialize (and cache) the SAME mps encoding the engines use:
            # a preset whose draw depends on the padding shape (haar-random)
            # must give every representation the identical state
            self.ensure_encoded("mps")
        chi = max(16, 2 ** (self.length // 2))
        arr = self.to_padded_mps(min(chi, 256))
        psi = mps_ops.to_statevector_np(arr)
        return psi / np.linalg.norm(psi)

    def to_density_matrix(self) -> np.ndarray:
        if self.density_matrix is not None:
            rho = self.density_matrix
            return rho / np.trace(rho)
        psi = self.to_vector()
        return np.outer(psi, psi.conj())
