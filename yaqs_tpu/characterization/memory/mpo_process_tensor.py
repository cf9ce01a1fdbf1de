"""Process-tensor MPO built leg-by-leg without 16^k tomography.

Reference parity: mqt-yaqs characterization/memory/backends/tomography/
direct.py (build_process_tensor_direct) and process_tensors.py
(MPOProcessTensor) — the scalable alternative to exhaustive Choi tomography.

TPU-native redesign: instead of tracking an ensemble of pure-state branches
with per-branch intervention *histories* and accumulating rank-1 MPO terms
(the reference's scheme, which approximates merged-branch histories by the
dominant one), the construction here is a tensor-train sketch:

- the MPO bond IS the compressed branch ensemble.  At leg ``t`` every branch
  density matrix is extended by all 16 Choi-basis interventions in one
  vmapped device batch, the ``(16 chi, dim^2)`` extension matrix is SVD
  compressed, and the isometry becomes the leg's transfer tensor.  The
  resulting comb reproduces the process EXACTLY up to the discarded singular
  values — no history bookkeeping, no rank-1 accumulation sweeps.
- branches are density matrices, so legs may be noisy (Lindblad) — the
  reference's direct construction is restricted to noiseless evolution.

Leg tensor convention: ``W_t[x, y, b, beta]`` contracts a probe intervention
with Choi matrix ``F`` (``C = |p><p| (x) (|m><m|)^T``, the same convention as
:func:`..interventions.choi_features`) via ``sum_xy W[x,y,b,beta] F[x,y]``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.host import to_device
import scipy.linalg

from ...analog.lindblad import build_liouvillian, noise_model_jump_ops
from .interventions import MPIntervention
from .process_tensor import DenseProcessTensor

__all__ = [
    "MPOProcessTensor",
    "build_process_tensor_mpo",
    "get_basis_states",
    "choi_basis_and_duals",
]


# ---------------------------------------------------------------------------
# Choi basis (reference basis.py:52-187 semantics)
# ---------------------------------------------------------------------------


def get_basis_states(basis: str = "tetrahedral", seed: int | None = None) -> list[np.ndarray]:
    """Four single-qubit kets whose 16 prep/meas pairs span CP-map space."""
    if basis == "random":
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(4):
            z = rng.standard_normal(2) + 1j * rng.standard_normal(2)
            out.append((z / np.linalg.norm(z)).astype(np.complex128))
        return out
    if basis == "standard":
        s2 = 1 / np.sqrt(2)
        return [
            np.array([1, 0], dtype=np.complex128),
            np.array([0, 1], dtype=np.complex128),
            np.array([s2, s2], dtype=np.complex128),
            np.array([s2, 1j * s2], dtype=np.complex128),
        ]
    if basis == "tetrahedral":
        # Bloch vectors of a regular tetrahedron; the corresponding pure kets
        bloch = np.array(
            [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], dtype=float
        ) / np.sqrt(3)
        sx = np.array([[0, 1], [1, 0]], dtype=np.complex128)
        sy = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
        sz = np.array([[1, 0], [0, -1]], dtype=np.complex128)
        kets = []
        for r in bloch:
            rho = 0.5 * (np.eye(2) + r[0] * sx + r[1] * sy + r[2] * sz)
            evals, evecs = np.linalg.eigh(rho)
            psi = evecs[:, int(np.argmax(evals))]
            kets.append((psi / np.linalg.norm(psi)).astype(np.complex128))
        return kets
    msg = f"unknown tomography basis {basis!r}"
    raise ValueError(msg)


def choi_basis_and_duals(
    basis: str = "tetrahedral", seed: int | None = None
) -> tuple[np.ndarray, list[tuple[int, int]], np.ndarray, np.ndarray]:
    """16 Choi matrices ``C_(p,m) = |p><p| (x) (|m><m|)^T``, their index
    pairs, the dual frame ``D`` with ``Tr(D_i^dag C_j) = delta_ij``, and the
    basis kets ``(4, 2)``."""
    kets = get_basis_states(basis, seed)
    chois = []
    pairs = []
    for p in range(4):
        for m in range(4):
            rho_p = np.outer(kets[p], kets[p].conj())
            e_m = np.outer(kets[m], kets[m].conj())
            chois.append(np.kron(rho_p, e_m.T))
            pairs.append((p, m))
    frame = np.column_stack([c.reshape(-1) for c in chois])  # (16, 16)
    dual = np.linalg.pinv(frame).conj().T  # columns are dual vectors
    duals = np.stack([dual[:, i].reshape(4, 4) for i in range(16)])
    return np.stack(chois), pairs, duals, np.stack(kets)


# ---------------------------------------------------------------------------
# Batched branch extension (device)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("env_dim", "mode"))
def _extend_branches(prop, rhos, meas, prep, env_dim: int, mode: str):
    """Extend every branch rho by every (meas, prep) intervention + evolution.

    ``rhos (nb, dim, dim)``, ``meas/prep (16, 2)`` -> ``(nb, 16, dim, dim)``.
    """
    d = meas.shape[-1]
    dim = env_dim * d

    def evolve(rho):
        if mode == "unitary":
            return prop @ rho @ prop.conj().T
        return (prop @ rho.reshape(-1)).reshape(dim, dim)

    def one(rho, m, p):
        r = rho.reshape(env_dim, d, env_dim, d)
        env = jnp.einsum("s,esft,t->ef", m.conj(), r, m)
        out = jnp.einsum("ef,s,t->esft", env, p, p.conj()).reshape(dim, dim)
        return evolve(out)

    return jax.vmap(
        lambda rho: jax.vmap(lambda m, p: one(rho, m, p))(meas, prep)
    )(rhos)


# ---------------------------------------------------------------------------
# The comb
# ---------------------------------------------------------------------------


class MPOProcessTensor:
    """Tensor-train process tensor over ``k`` intervention legs.

    ``leg_tensors[t] (4, 4, b_in, b_out)``; ``final_tensor (2, 2, b_k)``.
    Evaluation semantics match :class:`DenseProcessTensor`: probes return the
    *unnormalized* final system density matrix (trace = sequence weight).
    """

    def __init__(
        self,
        leg_tensors: list[np.ndarray],
        final_tensor: np.ndarray,
        timesteps: list[float],
        initial_rho: np.ndarray,
        d: int = 2,
    ) -> None:
        self.leg_tensors = leg_tensors
        self.final_tensor = final_tensor
        self.timesteps = list(timesteps)
        self.initial_rho = initial_rho
        self.d = d
        self.k = len(leg_tensors)

    @property
    def bond_dims(self) -> list[int]:
        return [w.shape[-1] for w in self.leg_tensors]

    def _num_interventions_for_probe(self) -> int:
        return self.k

    # -- probing -----------------------------------------------------------
    @staticmethod
    def _choi(iv) -> np.ndarray:
        """Choi of the step map (MP pair or unitary): the rank-1 matrix
        ``J[(c,a),(e,b)] = K[c,a] conj(K[e,b])``."""
        kmat = np.asarray(iv.kraus, dtype=np.complex128)
        d = kmat.shape[0]
        return np.einsum("ca,eb->caeb", kmat, kmat.conj()).reshape(d * d, d * d)

    def evaluate_probe(self, interventions: list[MPIntervention]) -> np.ndarray:
        if len(interventions) != self.k:
            msg = f"expected {self.k} interventions, got {len(interventions)}"
            raise ValueError(msg)
        v = np.ones((1,), dtype=np.complex128)
        for w, iv in zip(self.leg_tensors, interventions):
            f = self._choi(iv)
            v = np.einsum("b,xybB,xy->B", v, w, f)
        return np.einsum("stB,B->st", self.final_tensor, v)

    def evaluate_probes(self, sequences: list[list[MPIntervention]]) -> np.ndarray:
        return np.stack([self.evaluate_probe(seq) for seq in sequences])

    # -- conversion --------------------------------------------------------
    def to_dense(self) -> DenseProcessTensor:
        """Contract the train into the exhaustive multi-time Choi tensor
        (leg groups ``(a, b, ap, bp)`` per step + final ``(s, s')``),
        compatible with :class:`DenseProcessTensor` information measures."""
        d = self.d
        acc = np.ones((1,), dtype=np.complex128)  # trailing bond axis
        for w in self.leg_tensors:
            # W[x, y, b, B] with x = (c, a) [prep-row, meas-col-T], y = (e, b)
            g = w.reshape(d, d, d, d, w.shape[2], w.shape[3])
            g = g.transpose(1, 3, 0, 2, 4, 5)  # (a, b, c, e, b_in, b_out)
            acc = np.tensordot(acc, g, axes=([acc.ndim - 1], [4]))
        t = np.tensordot(acc, self.final_tensor, axes=([acc.ndim - 1], [2]))
        return DenseProcessTensor(t, self.k, d)

    def qmi(self, cut: int) -> float:
        return self.to_dense().qmi(cut)

    def cmi(self, cut1: int, cut2: int) -> float:
        return self.to_dense().cmi(cut1, cut2)


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


def _propagator(h, liou, duration: float, mode: str) -> np.ndarray:
    if mode == "unitary":
        return scipy.linalg.expm(-1j * duration * h)
    return scipy.linalg.expm(duration * liou)


def build_process_tensor_mpo(
    hamiltonian,
    *,
    num_interventions: int | None = None,
    tau: float | None = None,
    timesteps: list[float] | None = None,
    noise_model=None,
    basis: str = "tetrahedral",
    basis_seed: int | None = None,
    max_bond_dim: int | None = 64,
    tol: float = 1e-12,
    d: int = 2,
) -> MPOProcessTensor:
    """Leg-by-leg process-tensor MPO; ``16 * chi`` simulations per leg.

    Either pass ``timesteps`` (length ``k + 1``: initial evolution + one
    duration per leg) or ``num_interventions`` + ``tau`` (uniform schedule).
    """
    if timesteps is None:
        if num_interventions is None or tau is None:
            msg = "pass timesteps= or num_interventions= and tau="
            raise ValueError(msg)
        timesteps = [float(tau)] * (int(num_interventions) + 1)
    k = len(timesteps) - 1
    if k < 1:
        msg = "need at least one intervention leg"
        raise ValueError(msg)

    h = hamiltonian.ensure_matrix()
    dim = h.shape[0]
    env_dim = dim // d
    if noise_model is None or not noise_model.processes:
        mode = "unitary"
        liou = None
    else:
        mode = "lindblad"
        jumps = noise_model_jump_ops(noise_model, hamiltonian.length, d)
        liou = build_liouvillian(h, jumps)

    _, _, duals, kets = choi_basis_and_duals(basis, basis_seed)
    pairs = [(p, m) for p in range(4) for m in range(4)]
    meas = np.stack([kets[m] for _, m in pairs])  # (16, 2)
    prep = np.stack([kets[p] for p, _ in pairs])

    # initial evolution from |0...0>
    psi0 = np.zeros(dim, dtype=np.complex128)
    psi0[0] = 1.0
    rho = np.outer(psi0, psi0.conj())
    prop0 = _propagator(h, liou, timesteps[0], mode)
    if mode == "unitary":
        rho = prop0 @ rho @ prop0.conj().T
    else:
        rho = (prop0 @ rho.reshape(-1)).reshape(dim, dim)

    r0 = rho.reshape(env_dim, d, env_dim, d)
    initial_rho = np.einsum("eset->st", r0)
    initial_rho = initial_rho / np.trace(initial_rho)

    branches = rho.reshape(1, dim, dim)
    leg_tensors: list[np.ndarray] = []
    prop_cache: dict[float, np.ndarray] = {}

    for leg in range(1, k + 1):
        duration = float(timesteps[leg])
        if duration not in prop_cache:
            prop_cache[duration] = _propagator(h, liou, duration, mode)
        prop = prop_cache[duration]

        # numpy operands straight into the jitted call (eager complex
        # jnp.asarray is unsupported on the tunneled TPU platform)
        ext = _extend_branches(
            to_device(prop),
            to_device(branches),
            to_device(np.asarray(meas, dtype=np.complex128)),
            to_device(np.asarray(prep, dtype=np.complex128)),
            env_dim,
            mode,
        )
        ext = np.asarray(jnp.real(ext)) + 1j * np.asarray(jnp.imag(ext))
        nb = branches.shape[0]
        mat = ext.reshape(nb * 16, dim * dim)

        u, s, vh = np.linalg.svd(mat, full_matrices=False)
        keep = int(np.sum(s > tol * max(s[0], 1e-300)))
        if max_bond_dim is not None:
            keep = min(keep, int(max_bond_dim))
        keep = max(keep, 1)
        transfer = u[:, :keep].reshape(nb, 16, keep)  # T[b, a, beta]
        branches = (s[:keep, None] * vh[:keep]).reshape(keep, dim, dim)

        # W[x, y, b, beta] = sum_a conj(D_a[x, y]) T[b, a, beta]
        leg_tensors.append(np.einsum("axy,baB->xybB", duals.conj(), transfer))

    # final leg: site-0 reduced density matrix of each branch (trace the env)
    final = np.einsum("Beset->stB", branches.reshape(-1, env_dim, d, env_dim, d))
    return MPOProcessTensor(leg_tensors, final, timesteps, initial_rho, d)
