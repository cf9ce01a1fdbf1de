"""Host<->device transfer helpers (yaqs_tpu.utils.host).

These are the platform-rule workarounds every TPU entry point leans on
(complex transfer is UNIMPLEMENTED on the tunneled backend in both
directions; docs/tpu_numerics.md platform rules).  On CPU the rules don't
bite, but the VALUE semantics — exact complex roundtrips, pytree structure
preservation, dtype fidelity — are platform-independent and pinned here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yaqs_tpu.utils.host import fetch, to_device


def _rand_c(shape, seed, dtype=np.complex128):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(dtype)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_complex_roundtrip_is_exact(dtype):
    x = _rand_c((3, 4), 0, dtype)
    dev = to_device(x)
    assert isinstance(dev, jax.Array)
    assert jnp.iscomplexobj(dev)
    back = fetch(dev)
    assert isinstance(back, np.ndarray)
    assert back.dtype == dtype
    np.testing.assert_array_equal(back, x)


def test_real_arrays_pass_through():
    x = np.arange(6.0).reshape(2, 3)
    dev = to_device(x)
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(fetch(dev), x)
    assert fetch(dev).dtype == dev.dtype


def test_device_resident_input_is_identity():
    dev = jnp.ones((2, 2), dtype=jnp.complex128)
    assert to_device(dev) is dev


def test_fetch_preserves_pytree_structure():
    tree = {
        "a": jnp.asarray([1.0, 2.0]),
        "b": [to_device(_rand_c((2,), 1)), (to_device(_rand_c((1, 3), 2)),)],
        "c": "passthrough",
        "d": 7,
    }
    out = fetch(tree)
    assert set(out) == {"a", "b", "c", "d"}
    assert isinstance(out["a"], np.ndarray)
    assert isinstance(out["b"][0], np.ndarray) and np.iscomplexobj(out["b"][0])
    assert isinstance(out["b"][1][0], np.ndarray)
    assert out["c"] == "passthrough" and out["d"] == 7


def test_fetch_leaves_host_values_untouched():
    x = np.asarray([1 + 2j])
    assert fetch(x) is x


def test_to_device_result_usable_as_jit_argument():
    """The documented pattern: complexified device arrays are valid jit
    call arguments for later dispatches."""
    x = _rand_c((4, 4), 3)
    dev = to_device(x)
    f = jax.jit(lambda m: m @ m.conj().T)
    out = fetch(f(dev))
    np.testing.assert_allclose(out, x @ x.conj().T, atol=1e-12)


def test_to_device_noncontiguous_input():
    base = _rand_c((6, 6), 4)
    view = base[::2, ::3]  # non-contiguous strided view
    dev = to_device(view)
    np.testing.assert_array_equal(fetch(dev), view)


def test_fetch_zero_dim_and_scalar_arrays():
    dev = to_device(np.complex128(2 - 3j))
    out = fetch(dev)
    assert out.shape == ()
    np.testing.assert_allclose(out, 2 - 3j)
