"""Compiled observable evaluation (fixed shape, all engines).

Reference behavior: MPS.evaluate_observables dispatches per observable kind —
one-site expectations, two-site correlators, entropy / Schmidt-spectrum
pseudo-observables, and PVM bitstring projectors (mqt-yaqs mps.py:1174-1276).

TPU design: observables compile host-side into :class:`CompiledObservables`,
a pytree of term tables evaluated in a few shared scans:

- one-site rows share a single left-Gram-environment scan (O(L chi^3));
- multi-site (k >= 2, possibly distant, arbitrary site order) observables are
  MPO-decomposed by iterated operator-Schmidt SVDs into sums of products of
  local factors ``coeff * A_{s1} B_{s2} ... K_{sk}`` evaluated by per-term
  transfer scans (vmapped); the reference caps observables at two sites
  (analog/utils.py:480-482) — this generalizes it;
- entropy rows reuse the bond-entropy sweep;
- PVM rows evaluate ``|<b|psi>|^2`` with a projector transfer scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import mps_ops

__all__ = [
    "CompiledObservables",
    "compile_observables",
    "evaluate_observables",
    "evaluate_observables_gauge_free",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompiledObservables:
    # one-site fast path
    ops1: np.ndarray  # (n1, d, d)
    sites1: np.ndarray  # (n1,)
    rows1: np.ndarray  # (n1,)
    # multi-site product terms (K = max factor count; identity padding at
    # site -1, which never matches a chain index)
    t_coeff: np.ndarray  # (nt,) real
    t_sites: np.ndarray  # (nt, K)
    t_ops: np.ndarray  # (nt, K, d, d)
    t_rows: np.ndarray  # (nt,)
    # entropy rows (bond index)
    e_bonds: np.ndarray  # (ne,)
    e_rows: np.ndarray  # (ne,)
    # Schmidt-spectrum rows (bond index): evaluated as chi extra output rows
    # per observable, appended after the scalar rows (reference
    # SchmidtSpectrum pseudo-observable, aggregated by concatenation —
    # simulation_parameters.py aggregate_trajectories)
    s_bonds: np.ndarray  # (ns,)
    s_rows: np.ndarray  # (ns,)
    # PVM rows (full bitstrings)
    pvm_bits: np.ndarray  # (np_, L)
    pvm_rows: np.ndarray  # (np_,)
    num_rows: int = dataclasses.field(metadata={"static": True})

    @property
    def only_one_site(self) -> bool:
        return (
            self.t_coeff.shape[0] == 0
            and self.e_bonds.shape[0] == 0
            and self.s_bonds.shape[0] == 0
            and self.pvm_bits.shape[0] == 0
        )


def product_terms(m, sites, d0: int) -> list[list[tuple[int, np.ndarray]]]:
    """Decompose a k-site operator into a sum of products of local factors.

    ``m`` is the ``d0^k x d0^k`` matrix with row/column multi-indices ordered
    as ``sites`` (arbitrary order, arbitrary gaps).  Iterated operator-Schmidt
    SVDs build an operator-MPO over the ascending-site order; expanding its
    bond indices yields at most ``(d0^2)^(k-1)`` product terms, each a list of
    ``(site, (d0, d0) matrix)`` factors.  For k=2 this is exactly the
    operator-Schmidt decomposition.  Generalizes the reference's two-site cap
    (analog/utils.py:480-482).
    """
    k = len(sites)
    m = np.asarray(m, dtype=np.complex128)
    order = list(np.argsort(np.asarray(sites)))
    sorted_sites = [int(sites[o]) for o in order]
    if len(set(sorted_sites)) != k:
        msg = f"observable sites must be distinct, got {sites!r}"
        raise ValueError(msg)
    t = m.reshape([d0] * (2 * k))
    # axes: (out legs in given order, in legs in given order) -> per ascending
    # site (out_i, in_i) pairs
    perm = []
    for o in order:
        perm += [o, k + o]
    t = t.transpose(perm)
    # sequential SVD: cores W_i (r_prev, d0, d0, r_next)
    cores = []
    rest = t.reshape(1, -1)  # (r_prev * (d0 d0)^k-block row)
    r_prev = 1
    for i in range(k - 1):
        mat = rest.reshape(r_prev * d0 * d0, -1)
        u, s, vh = np.linalg.svd(mat, full_matrices=False)
        keep = int(np.sum(s > 1e-14 * max(s[0], 1e-300))) or 1
        cores.append((u[:, :keep] * s[:keep]).reshape(r_prev, d0, d0, keep))
        rest = vh[:keep]
        r_prev = keep
    cores.append(rest.reshape(r_prev, d0, d0, 1))
    # expand bond indices into explicit product terms
    terms: list[list[tuple[int, np.ndarray]]] = []

    def expand(i, b_prev, factors):
        core = cores[i]
        for b in range(core.shape[-1]):
            fac = core[b_prev, :, :, b]
            if i == k - 1:
                terms.append(factors + [(sorted_sites[i], fac)])
            else:
                expand(i + 1, b, factors + [(sorted_sites[i], fac)])

    expand(0, 0, [])
    return terms


def compile_observables(observables, length: int, d: int) -> CompiledObservables:
    """Compile sorted observables into term tables (host-side)."""
    ops1, sites1, rows1 = [], [], []
    t_coeff, t_sites, t_ops, t_rows = [], [], [], []
    e_bonds, e_rows = [], []
    s_bonds, s_rows = [], []
    pvm_bits, pvm_rows = [], []

    def pad_op(m):
        m = np.asarray(m, dtype=np.complex128)
        if m.shape[0] < d:
            out = np.zeros((d, d), dtype=np.complex128)
            out[: m.shape[0], : m.shape[1]] = m
            return out
        return m

    for row, obs in enumerate(observables):
        sites = obs.site_list
        if obs.name == "pvm":
            bits = [int(b) for b in obs.bitstring]
            if len(bits) != length:
                msg = f"PVM bitstring length {len(bits)} != chain length {length}"
                raise ValueError(msg)
            pvm_bits.append(bits)
            pvm_rows.append(row)
        elif obs.name in {"entropy", "schmidt_spectrum"}:
            if len(sites) != 2 or abs(sites[1] - sites[0]) != 1:
                msg = "entropy observables act on a nearest-neighbor pair"
                raise ValueError(msg)
            if obs.name == "entropy":
                e_bonds.append(min(sites))
                e_rows.append(row)
            else:
                s_bonds.append(min(sites))
                s_rows.append(row)
        elif len(sites) == 1:
            ops1.append(pad_op(obs.matrix))
            sites1.append(sites[0])
            rows1.append(row)
        else:
            m = np.asarray(obs.matrix, dtype=np.complex128)
            d0 = int(round(m.shape[0] ** (1.0 / len(sites))))
            for factors in product_terms(m, sites, d0):
                t_coeff.append(1.0)
                t_sites.append([s for s, _ in factors])
                t_ops.append([pad_op(f) for _, f in factors])
                t_rows.append(row)

    # pad factor lists to the max count with identity at site -1
    kmax = max((len(s) for s in t_sites), default=2)
    eye = np.eye(d, dtype=np.complex128)
    for s_list, o_list in zip(t_sites, t_ops):
        while len(s_list) < kmax:
            s_list.append(-1)
            o_list.append(eye)

    def arr(x, dtype, shape_tail):
        if x:
            return np.asarray(x, dtype=dtype)
        return np.zeros((0,) + shape_tail, dtype=dtype)

    return CompiledObservables(
        ops1=arr(ops1, np.complex128, (d, d)),
        sites1=arr(sites1, np.int32, ()),
        rows1=arr(rows1, np.int32, ()),
        t_coeff=arr(t_coeff, np.float64, ()),
        t_sites=arr(t_sites, np.int32, (kmax,)),
        t_ops=arr(t_ops, np.complex128, (kmax, d, d)),
        t_rows=arr(t_rows, np.int32, ()),
        e_bonds=arr(e_bonds, np.int32, ()),
        e_rows=arr(e_rows, np.int32, ()),
        s_bonds=arr(s_bonds, np.int32, ()),
        s_rows=arr(s_rows, np.int32, ()),
        pvm_bits=arr(pvm_bits, np.int32, (length,)) if pvm_bits else np.zeros((0, length), np.int32),
        pvm_rows=arr(pvm_rows, np.int32, ()),
        num_rows=len(observables),
    )


def _term_values(tensors, co: CompiledObservables):
    """Multi-site product terms via vmapped transfer scans."""
    length, d, chi, _ = tensors.shape
    kmax = co.t_sites.shape[1]

    def one_term(term_sites, term_ops):
        env0 = jnp.eye(chi, dtype=tensors.dtype)

        def step(env, xs):
            i, a = xs
            op = jnp.eye(d, dtype=a.dtype)
            for j in range(kmax):  # sites are distinct; at most one matches
                op = jnp.where(term_sites[j] == i, term_ops[j].astype(a.dtype), op)
            ak = jnp.einsum("ab,blr->alr", op, a)
            return mps_ops.transfer_right(env, a, ak), None

        env, _ = jax.lax.scan(step, env0, (jnp.arange(length), tensors))
        return jnp.trace(env)

    return jax.vmap(one_term)(co.t_sites, co.t_ops)


def _pvm_values(tensors, co: CompiledObservables):
    """``|<b|psi>|^2`` via projector transfer (normalized state)."""
    length, d, chi, _ = tensors.shape

    def one(bits):
        env0 = jnp.eye(chi, dtype=tensors.dtype)

        def step(env, xs):
            b, a = xs
            proj = (
                jnp.zeros((d, d), dtype=a.dtype).at[b, b].set(1.0)
            )
            ak = jnp.einsum("ab,blr->alr", proj, a)
            return mps_ops.transfer_right(env, a, ak), None

        env, _ = jax.lax.scan(step, env0, (bits, tensors))
        return jnp.real(jnp.trace(env))

    return jax.vmap(one)(co.pvm_bits)


def evaluate_observables_gauge_free(
    tensors: jnp.ndarray, co: CompiledObservables
) -> jnp.ndarray:
    """One-site observable rows WITHOUT gauge or normalization assumptions.

    Uses the two-sided Gram moments ``T_i[b,k] = <psi|(|b><k|)_i|psi>``
    (mps_ops.site_moment_matrices) and divides by ``<psi|psi>``, so the state
    may be in any gauge and unnormalized — the order-2 measurement branch
    uses this to skip its full-chain canonicalization (the branch's state is
    discarded after evaluation). Requires ``co.only_one_site``."""
    if not co.only_one_site:
        msg = "gauge-free evaluation supports one-site observables only"
        raise ValueError(msg)
    rdtype = tensors.real.dtype
    out = jnp.zeros((co.num_rows,), dtype=rdtype)
    if not co.ops1.shape[0]:
        return out
    moments, n2 = mps_ops.site_moment_matrices(tensors)
    t_at = moments[jnp.asarray(co.sites1)]  # (n1, d, d)
    ops = jnp.asarray(co.ops1, dtype=tensors.dtype)
    vals = jnp.real(jnp.einsum("nbk,nbk->n", ops, t_at)) / jnp.maximum(
        n2, jnp.finfo(rdtype).tiny
    )
    return out.at[jnp.asarray(co.rows1)].set(vals.astype(rdtype))


def evaluate_observables(tensors: jnp.ndarray, co: CompiledObservables) -> jnp.ndarray:
    """All observable rows for a canonical-at-0 normalized state, ``(num_rows,)`` real."""
    rdtype = tensors.real.dtype
    out = jnp.zeros((co.num_rows,), dtype=rdtype)
    if co.ops1.shape[0]:
        vals1 = jnp.real(
            mps_ops.site_expectations(tensors, jnp.asarray(co.ops1), jnp.asarray(co.sites1))
        )
        out = out.at[jnp.asarray(co.rows1)].set(vals1.astype(rdtype))
    if co.t_coeff.shape[0]:
        tvals = jnp.real(_term_values(tensors, co)) * jnp.asarray(co.t_coeff, rdtype)
        out = out.at[jnp.asarray(co.t_rows)].add(tvals.astype(rdtype))
    if co.e_bonds.shape[0]:
        ents = mps_ops.bond_entropies(tensors)
        out = out.at[jnp.asarray(co.e_rows)].set(
            ents[jnp.asarray(co.e_bonds)].astype(rdtype)
        )
    if co.pvm_bits.shape[0]:
        out = out.at[jnp.asarray(co.pvm_rows)].set(_pvm_values(tensors, co).astype(rdtype))
    if co.s_bonds.shape[0]:
        # Schmidt spectra ride as chi extra rows per spectrum observable,
        # appended after the scalar rows (fixed shape: chi values per bond,
        # zero-padded past the effective rank); engines stack them over time
        # and the Simulator splits them back out into Result.schmidt_spectra
        spectra, _ = mps_ops.bond_spectra(tensors)  # (L-1, chi)
        sp = spectra[jnp.asarray(co.s_bonds)]  # (ns, chi)
        out = jnp.concatenate([out, sp.reshape(-1).astype(rdtype)])
    return out
