"""TDVP primitive correctness vs explicitly contracted dense operators.

Port of /root/reference/tests/core/methods/tdvp/test_primitives.py onto the
merged-MPO matrix-free chain: environments, one-/two-site effective
Hamiltonians (plain and merged), and the bond projector are each checked
against a dense effective operator built by brute-force contraction of the
same environment tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yaqs_tpu.core.mpo_builders import ising_mpo, pad_mpo
from yaqs_tpu.core.mps_ops import (
    canonicalize_right,
    named_product_state,
    to_statevector,
)
from yaqs_tpu.methods.tdvp import (
    heff_bond,
    heff_one_site,
    heff_one_site_merged,
    heff_two_site,
    heff_two_site_merged,
    left_boundary,
    merge_mpo_pair,
    merge_mpo_site,
    right_boundary,
    right_environments,
    update_left_env,
)


def _setup(L=4, chi=4, seed=0):
    rng = np.random.default_rng(seed)
    tensors = np.asarray(canonicalize_right(jnp.asarray(
        named_product_state("random", L, chi, rng=rng)
    )))
    # entangle a bit: random two-site rotation via jitter + recanonicalize
    mpo = pad_mpo(ising_mpo(L, 1.0, 0.7), 3)
    return jnp.asarray(tensors), jnp.asarray(mpo)


def _envs(tensors, mpo):
    """Left env at site i (contracted 0..i-1) and right envs from the scan."""
    L = tensors.shape[0]
    chi = tensors.shape[2]
    dw = mpo.shape[-1]
    g_all = right_environments(tensors, mpo)  # g_all[i] = env right of site i
    f = left_boundary(chi, dw, tensors.dtype)
    lefts = [f]
    for i in range(L - 1):
        f = update_left_env(f, tensors[i], tensors[i], mpo[i])
        lefts.append(f)
    return lefts, g_all


def dense_heff_one_site(f, w, g):
    """Explicit dense (chi d chi) x (chi d chi) effective operator."""
    # f: (bl, wl, kl), w: (s, t, wl, wr), g: (br, wr, kr)
    m = np.einsum("awk,stwv,bvc->asbktc", np.asarray(f), np.asarray(w), np.asarray(g))
    dim = m.shape[0] * m.shape[1] * m.shape[2]
    return m.reshape(dim, dim)


def dense_heff_two_site(f, w1, w2, g):
    m = np.einsum(
        "awk,stwv,uqvx,bxc->asubktqc",
        np.asarray(f), np.asarray(w1), np.asarray(w2), np.asarray(g),
    )
    dim = int(np.prod(m.shape[:4]))
    return m.reshape(dim, dim)


def dense_heff_bond(f, g):
    m = np.einsum("awk,bwc->abkc", np.asarray(f), np.asarray(g))
    dim = m.shape[0] * m.shape[1]
    return m.reshape(dim, dim)


def test_right_environments_reproduce_expectation():
    # full contraction through the environment chain = <psi|H|psi>
    tensors, mpo = _setup()
    lefts, g_all = _envs(tensors, mpo)
    L = tensors.shape[0]
    # energy via site-0 effective operator on the center tensor
    a0 = np.asarray(tensors[0])
    h0 = dense_heff_one_site(lefts[0], np.asarray(mpo[0]), g_all[0])
    v = a0.transpose(1, 0, 2).reshape(-1)  # (bl, s, br) ordering of dense op
    e_env = np.real(np.vdot(v, h0 @ v))
    # dense oracle
    from yaqs_tpu.core.mpo_builders import mpo_to_matrix

    psi = np.asarray(to_statevector(tensors))
    h = mpo_to_matrix(np.asarray(mpo))
    e_dense = np.real(np.vdot(psi, h @ psi))
    np.testing.assert_allclose(e_env, e_dense, atol=1e-10)


def test_heff_one_site_matches_dense():
    tensors, mpo = _setup()
    lefts, g_all = _envs(tensors, mpo)
    for i in (0, 1, 3):
        f, g, w = lefts[i], g_all[i], mpo[i]
        a = tensors[i]
        got = np.asarray(jax.jit(heff_one_site)(f, w, g, a))
        v = np.asarray(a).transpose(1, 0, 2).reshape(-1)
        expect = (dense_heff_one_site(f, w, g) @ v).reshape(
            a.shape[1], a.shape[0], a.shape[2]
        ).transpose(1, 0, 2)
        np.testing.assert_allclose(got, expect, atol=1e-10, err_msg=f"site {i}")


def test_heff_one_site_merged_matches_plain():
    tensors, mpo = _setup()
    lefts, g_all = _envs(tensors, mpo)
    for i in (0, 2):
        f, g, w = lefts[i], g_all[i], mpo[i]
        a = tensors[i]
        plain = np.asarray(jax.jit(heff_one_site)(f, w, g, a))
        merged = np.asarray(jax.jit(heff_one_site_merged)(f, merge_mpo_site(w), g, a))
        np.testing.assert_allclose(merged, plain, atol=1e-10)


def test_heff_two_site_matches_dense():
    tensors, mpo = _setup()
    lefts, g_all = _envs(tensors, mpo)
    chi = tensors.shape[2]
    d = tensors.shape[1]
    for i in (0, 2):
        f, g = lefts[i], g_all[i + 1]
        w1, w2 = mpo[i], mpo[i + 1]
        # theta: (s, t, bl, br) two-site tensor from the canonical pair
        theta = jnp.einsum("sab,tbc->stac", tensors[i], tensors[i + 1])
        got = np.asarray(jax.jit(heff_two_site)(f, w1, w2, g, theta))
        v = np.asarray(theta).transpose(2, 0, 1, 3).reshape(-1)  # (bl, s, t, br)
        expect = (dense_heff_two_site(f, w1, w2, g) @ v).reshape(
            chi, d, d, chi
        ).transpose(1, 2, 0, 3)
        np.testing.assert_allclose(got, expect, atol=1e-10, err_msg=f"bond {i}")


def test_heff_two_site_merged_matches_plain():
    tensors, mpo = _setup()
    lefts, g_all = _envs(tensors, mpo)
    for i in (0, 2):
        f, g = lefts[i], g_all[i + 1]
        theta = jnp.einsum("sab,tbc->stac", tensors[i], tensors[i + 1])
        plain = np.asarray(jax.jit(heff_two_site)(f, mpo[i], mpo[i + 1], g, theta))
        merged = np.asarray(
            jax.jit(heff_two_site_merged)(f, merge_mpo_pair(mpo[i], mpo[i + 1]), g, theta)
        )
        np.testing.assert_allclose(merged, plain, atol=1e-10)


def test_heff_bond_matches_dense():
    tensors, mpo = _setup()
    lefts, g_all = _envs(tensors, mpo)
    chi = tensors.shape[2]
    # bond projector between sites 1 and 2: left env includes site 1
    f = update_left_env(lefts[1], tensors[1], tensors[1], mpo[1])
    g = g_all[1]
    rng = np.random.default_rng(4)
    c = jnp.asarray(rng.normal(size=(chi, chi)) + 1j * rng.normal(size=(chi, chi)))
    got = np.asarray(jax.jit(heff_bond)(f, g, c))
    expect = (dense_heff_bond(f, g) @ np.asarray(c).reshape(-1)).reshape(chi, chi)
    np.testing.assert_allclose(got, expect, atol=1e-10)


def test_environment_boundaries_are_identity_channels():
    chi, dw = 4, 3
    f = np.asarray(left_boundary(chi, dw, jnp.complex128))
    g = np.asarray(right_boundary(chi, dw, jnp.complex128))
    # boundary index 0 on the MPO bond; identity on the state bonds
    np.testing.assert_allclose(f[:, 0, :], np.eye(chi), atol=1e-14)
    np.testing.assert_allclose(f[:, 1:, :], 0.0, atol=1e-14)
    np.testing.assert_allclose(g[:, 0, :], np.eye(chi), atol=1e-14)
    np.testing.assert_allclose(g[:, 1:, :], 0.0, atol=1e-14)


def test_merged_mpo_pair_reproduces_dense_product():
    _, mpo = _setup()
    w12 = np.asarray(merge_mpo_pair(mpo[0], mpo[1]))
    # merged form must contract back to the same two-site channel tensor
    direct = np.einsum("stwv,uqvx->suwtqx", np.asarray(mpo[0]), np.asarray(mpo[1]))
    dw = mpo.shape[-1]
    d = mpo.shape[1]
    np.testing.assert_allclose(
        w12.reshape(dw, d, d, d, d, dw),
        direct.transpose(2, 0, 1, 3, 4, 5).reshape(dw, d, d, d, d, dw),
        atol=1e-12,
    )
