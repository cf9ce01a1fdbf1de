"""Compiled observable evaluation (fixed shape, all engines).

Reference behavior: MPS.evaluate_observables dispatches per observable kind —
one-site expectations, two-site correlators, entropy / Schmidt-spectrum
pseudo-observables, and PVM bitstring projectors (mqt-yaqs mps.py:1174-1276).

TPU design: observables compile host-side into :class:`CompiledObservables`,
a pytree of term tables evaluated in a few shared scans:

- one-site rows share a single left-Gram-environment scan (O(L chi^3));
- two-site (possibly distant) observables are operator-Schmidt-decomposed
  into product terms ``coeff * A_i (x) B_j`` evaluated by per-term transfer
  scans (vmapped);
- entropy rows reuse the bond-entropy sweep;
- PVM rows evaluate ``|<b|psi>|^2`` with a projector transfer scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import mps_ops

__all__ = ["CompiledObservables", "compile_observables", "evaluate_observables"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompiledObservables:
    # one-site fast path
    ops1: np.ndarray  # (n1, d, d)
    sites1: np.ndarray  # (n1,)
    rows1: np.ndarray  # (n1,)
    # two-site product terms
    t_coeff: np.ndarray  # (nt,) real
    t_site1: np.ndarray  # (nt,)
    t_op1: np.ndarray  # (nt, d, d)
    t_site2: np.ndarray  # (nt,)
    t_op2: np.ndarray  # (nt, d, d)
    t_rows: np.ndarray  # (nt,)
    # entropy rows (bond index)
    e_bonds: np.ndarray  # (ne,)
    e_rows: np.ndarray  # (ne,)
    # PVM rows (full bitstrings)
    pvm_bits: np.ndarray  # (np_, L)
    pvm_rows: np.ndarray  # (np_,)
    num_rows: int = dataclasses.field(metadata={"static": True})

    @property
    def only_one_site(self) -> bool:
        return (
            self.t_coeff.shape[0] == 0
            and self.e_bonds.shape[0] == 0
            and self.pvm_bits.shape[0] == 0
        )


def compile_observables(observables, length: int, d: int) -> CompiledObservables:
    """Compile sorted observables into term tables (host-side)."""
    ops1, sites1, rows1 = [], [], []
    t_coeff, t_s1, t_o1, t_s2, t_o2, t_rows = [], [], [], [], [], []
    e_bonds, e_rows = [], []
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
            e_bonds.append(min(sites))
            e_rows.append(row)
        elif len(sites) == 1:
            ops1.append(pad_op(obs.matrix))
            sites1.append(sites[0])
            rows1.append(row)
        elif len(sites) == 2:
            m = np.asarray(obs.matrix, dtype=np.complex128)
            d0 = int(round(np.sqrt(m.shape[0])))
            i, j = sites
            if i > j:  # reorder so site1 < site2; swap matrix significance
                m = m.reshape(d0, d0, d0, d0).transpose(1, 0, 3, 2).reshape(d0 * d0, d0 * d0)
                i, j = j, i
            # operator-Schmidt decomposition into product terms
            t = m.reshape(d0, d0, d0, d0).transpose(0, 2, 1, 3).reshape(d0 * d0, d0 * d0)
            u, s, vh = np.linalg.svd(t)
            for kk in range(len(s)):
                if s[kk] < 1e-14 * max(s[0], 1e-300):
                    break
                a = (u[:, kk] * s[kk]).reshape(d0, d0)
                b = vh[kk].reshape(d0, d0)
                t_coeff.append(1.0)
                t_s1.append(i)
                t_o1.append(pad_op(a))
                t_s2.append(j)
                t_o2.append(pad_op(b))
                t_rows.append(row)
        else:
            msg = f"observables on {len(sites)} sites are not supported"
            raise NotImplementedError(msg)

    def arr(x, dtype, shape_tail):
        if x:
            return np.asarray(x, dtype=dtype)
        return np.zeros((0,) + shape_tail, dtype=dtype)

    return CompiledObservables(
        ops1=arr(ops1, np.complex128, (d, d)),
        sites1=arr(sites1, np.int32, ()),
        rows1=arr(rows1, np.int32, ()),
        t_coeff=arr(t_coeff, np.float64, ()),
        t_site1=arr(t_s1, np.int32, ()),
        t_op1=arr(t_o1, np.complex128, (d, d)),
        t_site2=arr(t_s2, np.int32, ()),
        t_op2=arr(t_o2, np.complex128, (d, d)),
        t_rows=arr(t_rows, np.int32, ()),
        e_bonds=arr(e_bonds, np.int32, ()),
        e_rows=arr(e_rows, np.int32, ()),
        pvm_bits=arr(pvm_bits, np.int32, (length,)) if pvm_bits else np.zeros((0, length), np.int32),
        pvm_rows=arr(pvm_rows, np.int32, ()),
        num_rows=len(observables),
    )


def _term_values(tensors, co: CompiledObservables):
    """Two-site product terms via vmapped transfer scans."""
    length, d, chi, _ = tensors.shape

    def one_term(site1, op1, site2, op2):
        env0 = jnp.eye(chi, dtype=tensors.dtype)

        def step(env, xs):
            i, a = xs
            op = jnp.where(
                i == site1,
                op1.astype(a.dtype),
                jnp.where(i == site2, op2.astype(a.dtype), jnp.eye(d, dtype=a.dtype)),
            )
            ak = jnp.einsum("ab,blr->alr", op, a)
            return mps_ops.transfer_right(env, a, ak), None

        env, _ = jax.lax.scan(step, env0, (jnp.arange(length), tensors))
        return jnp.trace(env)

    return jax.vmap(one_term)(co.t_site1, co.t_op1, co.t_site2, co.t_op2)


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
    return out
