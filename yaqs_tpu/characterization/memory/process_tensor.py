"""Multi-time Choi process tensor: tomographic build, probing, QMI/CMI.

Reference: mqt-yaqs characterization/memory/backends/tomography — the
``DenseProcessTensor`` built by exhaustive Choi-basis tomography
(process_tensors.py:333) with quantum mutual information / conditional mutual
information computed from partial traces and von Neumann entropies
(:128-265).

Representation: the k-step process with final readout is the multilinear map

    ``rho_final = sum  Y[a_1 b_1 a'_1 b'_1, ..., s s']  prod_t T_t[a b a' b']``

with ``T_t[a,b,a',b'] = <m|a><b|m> p[a'] conj(p[b'])`` for an MP intervention.
Reordering unprimed/primed legs gives the (PSD) Choi *state* over
``(x)_t (H_in (x) H_out) (x) H_final`` whose entropies across leg cuts define
the memory measures.  Tomography runs as ONE vmapped batch of all ``d^{4k}``
elementary-matrix-unit sequences on the exact backend.
"""

from __future__ import annotations

import itertools

import numpy as np

from .exact import ExactBackend
from .interventions import MPIntervention

__all__ = ["DenseProcessTensor", "build_process_tensor"]


def _entropy(rho: np.ndarray) -> float:
    w = np.linalg.eigvalsh(rho)
    w = w[w > 1e-14]
    return float(-np.sum(w * np.log(w)))


class DenseProcessTensor:
    """Exhaustive multi-time Choi tensor for ``k`` interventions on a qubit.

    ``tensor`` has shape ``(d,)*(4k) + (d, d)``: per step the legs
    ``(a_t, b_t, ap_t, bp_t)``, then the final ``(s, s')``.
    """

    def __init__(self, tensor: np.ndarray, k: int, d: int = 2) -> None:
        self.tensor = tensor
        self.k = k
        self.d = d

    def _num_interventions_for_probe(self) -> int:
        return self.k

    # -- probing -----------------------------------------------------------
    def evaluate_probe(self, interventions: list[MPIntervention]) -> np.ndarray:
        """Final unnormalized system rho for one intervention sequence
        (MP pairs or unitaries — any object exposing a ``kraus`` matrix)."""
        if len(interventions) != self.k:
            msg = f"expected {self.k} interventions, got {len(interventions)}"
            raise ValueError(msg)
        t = self.tensor
        for iv in interventions:
            kmat = np.asarray(iv.kraus, dtype=np.complex128)
            # rho_out[c,e] = K[c,a] rho[a,b] conj(K[e,b])
            coeff = np.einsum("ca,eb->abce", kmat, kmat.conj())
            t = np.tensordot(coeff, t, axes=([0, 1, 2, 3], [0, 1, 2, 3]))
        return t  # (d, d)

    def evaluate_probes(self, sequences: list[list[MPIntervention]]) -> np.ndarray:
        return np.stack([self.evaluate_probe(seq) for seq in sequences])

    # -- information measures ----------------------------------------------
    def choi_state(self) -> np.ndarray:
        """Choi density matrix over ``k`` (in, out) leg pairs + final leg.

        Row index = (a_1, ap_1, ..., a_k, ap_k, s); column = primed; trace
        normalized.
        """
        d, k = self.d, self.k
        t = self.tensor.reshape([d] * (4 * k) + [d, d])
        # current order: (a1 b1 ap1 bp1, ..., s s') -> rows (a1 ap1 ... s), cols (b1 bp1 ... s')
        row_axes = []
        col_axes = []
        for step in range(k):
            base = 4 * step
            row_axes += [base, base + 2]
            col_axes += [base + 1, base + 3]
        row_axes.append(4 * k)
        col_axes.append(4 * k + 1)
        perm = row_axes + col_axes
        dim = d ** (2 * k + 1)
        rho = t.transpose(perm).reshape(dim, dim)
        tr = np.trace(rho)
        return rho / tr

    def _leg_dims(self):
        # fine-grained legs in row ordering: [in_1, out_1, ..., in_k, out_k, final]
        return [self.d] * (2 * self.k + 1)

    def _reduced(self, keep: list[int]) -> np.ndarray:
        dims = self._leg_dims()
        n = len(dims)
        rho = self.choi_state().reshape(dims + dims)
        traced = [i for i in range(n) if i not in keep]
        for idx in sorted(traced, reverse=True):
            rho = np.trace(rho, axis1=idx, axis2=idx + rho.ndim // 2)
        keep_dim = int(np.prod([dims[i] for i in keep])) if keep else 1
        return rho.reshape(keep_dim, keep_dim)

    def qmi(self, cut: int) -> float:
        """Quantum mutual information across the operational cut at step
        ``cut``: past = legs up to and including the cut *measurement* leg
        ``in_cut``; future = the cut *preparation* leg onward.  Zero for
        memoryless (environment-free) processes: the intervention severs the
        system channel, so only environment-mediated correlations survive.
        """
        n = 2 * self.k + 1
        if not 1 <= cut <= self.k:
            msg = f"cut must be in [1, {self.k}] for a {self.k}-step process tensor, got {cut}"
            raise ValueError(msg)
        split = 2 * cut - 1  # legs [0, split) = past (through in_cut)
        past = list(range(split))
        future = list(range(split, n))
        s_a = _entropy(self._reduced(past))
        s_b = _entropy(self._reduced(future))
        s_ab = _entropy(self.choi_state())
        return s_a + s_b - s_ab

    def cmi(self, cut1: int, cut2: int) -> float:
        """Conditional mutual information I(A:C|B) across two operational
        cuts: A = legs before in_cut1 (inclusive), B = legs between the cuts,
        C = the rest including the final leg."""
        n = 2 * self.k + 1
        if not 1 <= cut1 < cut2 <= self.k:
            msg = (
                f"cmi cuts must satisfy 1 <= cut1 < cut2 <= {self.k} "
                f"(got {cut1}, {cut2})"
            )
            raise ValueError(msg)
        s1, s2 = 2 * cut1 - 1, 2 * cut2 - 1
        a = list(range(s1))
        b = list(range(s1, s2))
        c = list(range(s2, n))
        s_ab = _entropy(self._reduced(a + b))
        s_bc = _entropy(self._reduced(b + c))
        s_b = _entropy(self._reduced(b)) if b else 0.0
        s_abc = _entropy(self.choi_state())
        return s_ab + s_bc - s_b - s_abc


def build_process_tensor(
    hamiltonian, *, num_interventions: int, tau: float, noise_model=None, d: int = 2
) -> DenseProcessTensor:
    """Exhaustive tomography: all ``d^{4k}`` matrix-unit sequences in one
    vmapped batch on the exact backend."""
    k = int(num_interventions)
    backend = ExactBackend(hamiltonian, tau, noise_model, d)
    basis = np.eye(d, dtype=np.complex128)
    combos = list(itertools.product(range(d), repeat=4 * k))
    n = len(combos)
    meas_l = np.zeros((n, k, d), dtype=np.complex128)
    meas_r = np.zeros((n, k, d), dtype=np.complex128)
    prep_l = np.zeros((n, k, d), dtype=np.complex128)
    prep_r = np.zeros((n, k, d), dtype=np.complex128)
    for i, combo in enumerate(combos):
        for t in range(k):
            a, b, ap, bp = combo[4 * t : 4 * t + 4]
            meas_l[i, t] = basis[a]
            meas_r[i, t] = basis[b]
            prep_l[i, t] = basis[ap]
            prep_r[i, t] = basis[bp]
    outs = backend.evaluate_general(meas_l, meas_r, prep_l, prep_r)  # (n, d, d)
    tensor = outs.reshape([d] * (4 * k) + [d, d])
    return DenseProcessTensor(tensor, k, d)
