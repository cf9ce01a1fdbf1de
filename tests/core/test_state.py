"""State representation contract: presets, explicit data, cross-encodings.

Reference parity: mqt-yaqs tests/core/data_structures/test_state.py and
test_state_utils.py — every encoding is checked against an independently
constructed dense vector / density matrix (kron products built by hand),
never against another yaqs_tpu code path.

Conventions pinned here (reference state.py semantics):
- site 0 is the least-significant bit of the dense index;
- ``basis_string[i]`` is the computational-basis state of site ``i``;
- Neel starts with site 0 in |0>; wall puts the first half in |0>.
"""

from __future__ import annotations

import numpy as np
import pytest

from yaqs_tpu import State
from yaqs_tpu.core import mps_ops

KET0 = np.array([1.0, 0.0], dtype=complex)
KET1 = np.array([0.0, 1.0], dtype=complex)
KETX = np.array([1.0, 1.0], dtype=complex) / np.sqrt(2)
KETXM = np.array([1.0, -1.0], dtype=complex) / np.sqrt(2)
KETY = np.array([1.0, 1.0j], dtype=complex) / np.sqrt(2)
KETYM = np.array([1.0, -1.0j], dtype=complex) / np.sqrt(2)


def kron_chain(kets):
    """Dense vector with site 0 least significant: psi[i0 + 2*i1 + ...]."""
    out = np.array([1.0], dtype=complex)
    for k in kets:  # site 0 first -> it must vary fastest, so kron new site LEFT
        out = np.kron(k, out)
    return out


def global_phase_allclose(a, b, atol=1e-10):
    i = int(np.argmax(np.abs(b)))
    assert abs(b[i]) > 1e-12
    phase = a[i] / b[i]
    np.testing.assert_allclose(abs(phase), 1.0, atol=atol)
    np.testing.assert_allclose(a, phase * b, atol=atol)


# -- presets vs hand-built kron oracles -------------------------------------


@pytest.mark.parametrize(
    ("name", "ket"),
    [
        ("zeros", KET0),
        ("ones", KET1),
        ("x+", KETX),
        ("x-", KETXM),
        ("y+", KETY),
        ("y-", KETYM),
    ],
)
def test_uniform_presets_match_kron(name, ket):
    L = 4
    psi = State(L, state=name).to_vector()
    global_phase_allclose(psi, kron_chain([ket] * L))


def test_neel_preset_alternates_from_zero():
    for L in (2, 3, 5):
        psi = State(L, state="Neel").to_vector()
        kets = [KET0 if i % 2 == 0 else KET1 for i in range(L)]
        global_phase_allclose(psi, kron_chain(kets))


def test_wall_preset_first_half_zeros():
    for L in (2, 4, 5):
        psi = State(L, state="wall").to_vector()
        kets = [KET0 if i < L // 2 else KET1 for i in range(L)]
        global_phase_allclose(psi, kron_chain(kets))


def test_basis_string_site_order():
    psi = State(4, state="basis", basis_string="1010").to_vector()
    kets = [KET1, KET0, KET1, KET0]  # basis_string[i] = state of site i
    global_phase_allclose(psi, kron_chain(kets))
    # providing basis_string alone implies the basis preset
    psi2 = State(4, basis_string="1010").to_vector()
    global_phase_allclose(psi2, kron_chain(kets))


def test_haar_random_is_normalized_and_seeded_vector():
    psi = State(5, state="haar-random").to_vector()
    np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-9)
    # genuinely entangled (not a product state): Schmidt rank > 1 on the
    # middle cut with overwhelming probability
    m = psi.reshape(2**3, 2**2, order="F")  # site-0-fastest -> Fortran order
    s = np.linalg.svd(m, compute_uv=False)
    assert (s > 1e-6).sum() > 1


# -- representation inference and validation --------------------------------


def test_representation_inferred_from_data():
    v = kron_chain([KET0, KET1])
    assert State(vector=v).representation == "vector"
    rho = np.outer(v, v.conj())
    assert State(density_matrix=rho).representation == "density_matrix"
    t = mps_ops.named_product_state("zeros", 3, 4)
    assert State(tensors=list(np.asarray(t))).representation == "mps"
    assert State(4).representation == "mps"


def test_length_inferred_from_data():
    v = np.zeros(8, dtype=complex)
    v[0] = 1.0
    assert State(vector=v).length == 3
    rho = np.outer(v, v.conj())
    assert State(density_matrix=rho).length == 3


def test_multiple_data_sources_rejected():
    v = kron_chain([KET0, KET0])
    with pytest.raises(ValueError, match="at most one"):
        State(vector=v, density_matrix=np.outer(v, v.conj()))


def test_unknown_representation_rejected():
    with pytest.raises(ValueError, match="representation"):
        State(3, representation="wavelet")


def test_missing_length_rejected():
    with pytest.raises(ValueError, match="length"):
        State()


# -- cross-encodings vs dense oracles ----------------------------------------


def test_vector_roundtrip_through_mps():
    rng = np.random.default_rng(7)
    L = 4
    psi = rng.normal(size=2**L) + 1j * rng.normal(size=2**L)
    psi /= np.linalg.norm(psi)
    st = State(vector=psi)
    tensors = st.to_padded_mps(chi=8)
    assert tensors.shape == (L, 2, 8, 8)
    back = mps_ops.to_statevector_np(tensors)
    global_phase_allclose(back, psi, atol=1e-8)


def test_explicit_tensor_list_encodes_and_normalizes():
    # un-normalized ragged site tensors: State must pad + canonicalize
    t0 = 2.0 * KET0.reshape(2, 1, 1)
    t1 = 3.0 * KET1.reshape(2, 1, 1)
    st = State(tensors=[t0, t1])
    arr = st.to_padded_mps(chi=4)
    assert arr.shape == (2, 2, 4, 4)
    psi = mps_ops.to_statevector_np(arr)
    np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-8)
    global_phase_allclose(psi, kron_chain([KET0, KET1]), atol=1e-8)


def test_oversized_tensor_rejected_by_padding():
    t = np.zeros((2, 9, 9), dtype=complex)
    t[0, 0, 0] = 1.0
    with pytest.raises(ValueError, match="exceeds padding"):
        State(tensors=[t, t]).to_padded_mps(chi=4)


def test_padded_array_exceeding_chi_rejected():
    arr = mps_ops.named_product_state("zeros", 3, 16)
    with pytest.raises(ValueError, match="exceed"):
        State(tensors=np.asarray(arr)).to_padded_mps(chi=8)


def test_vector_normalized_on_encode():
    psi = 5.0 * kron_chain([KETX, KETY, KET0])
    st = State(vector=psi)
    np.testing.assert_allclose(np.linalg.norm(st.to_vector()), 1.0, atol=1e-12)
    arr = st.to_padded_mps(chi=4)
    back = mps_ops.to_statevector_np(arr)
    global_phase_allclose(back, psi / np.linalg.norm(psi), atol=1e-8)


def test_density_matrix_encodings():
    psi = kron_chain([KETX, KET1])
    st = State(2, state="basis", basis_string="01")
    # pure-state rho from preset
    rho = State(vector=psi).to_density_matrix()
    np.testing.assert_allclose(rho, np.outer(psi, psi.conj()), atol=1e-12)
    np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-12)
    # trace normalization of explicit data
    raw = 3.0 * np.eye(4, dtype=complex)
    np.testing.assert_allclose(
        State(density_matrix=raw).to_density_matrix(), np.eye(4) / 4.0, atol=1e-12
    )
    del st


def test_density_matrix_cannot_become_pure():
    rho = np.eye(4, dtype=complex) / 4.0
    st = State(density_matrix=rho)
    with pytest.raises(ValueError, match="pure-state"):
        st.to_vector()
    with pytest.raises(ValueError, match="mixed"):
        st.to_padded_mps(chi=4)


def test_physical_dimensions_int_and_list():
    st = State(3, physical_dimensions=3)
    assert st.d == 3
    arr = st.to_padded_mps(chi=4)
    assert arr.shape == (3, 3, 4, 4)
    # list form infers length and pads to the max local dim
    st2 = State(physical_dimensions=[2, 4, 2])
    assert st2.length == 3
    assert st2.d == 4


def test_qudit_zeros_vector():
    st = State(2, physical_dimensions=3)
    psi = st.to_vector()
    expected = np.zeros(9, dtype=complex)
    expected[0] = 1.0
    global_phase_allclose(psi, expected)


def test_preset_draw_shared_across_representations():
    """to_vector() must materialize (and cache) the SAME mps encoding the
    engines consume — for shape-dependent preset draws (haar-random) the
    vector, density-matrix, and MPS views are one state, not three draws."""
    from yaqs_tpu.core import mps_ops

    s = State(4, state="haar-random")
    v = s.to_vector()
    arr = np.asarray(s.ensure_encoded("mps").to_padded_mps(8))
    v_mps = mps_ops.to_statevector_np(arr)
    v_mps = v_mps / np.linalg.norm(v_mps)
    np.testing.assert_allclose(abs(np.vdot(v, v_mps)), 1.0, atol=1e-10)
    rho = s.to_density_matrix()
    np.testing.assert_allclose(rho, np.outer(v, v.conj()), atol=1e-10)


def test_to_vector_caches_tensors_for_engine_reuse():
    s = State(3, state="haar-random")
    assert s.tensors is None
    _ = s.to_vector()
    assert s.tensors is not None  # the engine will reuse this exact draw
