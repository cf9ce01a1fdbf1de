"""Global test configuration.

Tests run on the CPU backend with a virtual 8-device mesh so that multi-chip
sharding paths (shard_map over a trajectory mesh) can be validated without TPU
hardware, and with float64/complex128 enabled for the 1e-8 parity targets
(mirrors the reference test strategy, tests/conftest.py of mqt-yaqs).

NOTE: environment variables must be set before jax initializes its backends,
hence this file manipulates os.environ at import time.
"""

from __future__ import annotations

import os

# Force the CPU backend. The environment presets JAX_PLATFORMS=axon (the
# tunneled TPU) and a sitecustomize registers the axon PJRT plugin at
# interpreter startup, so plain env overrides are not enough: set the flag on
# jax.config after import (before any backend is initialized).
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

TEST_SEED = 42


@pytest.fixture
def seed() -> int:
    return TEST_SEED


# ---------------------------------------------------------------------------
# Periodic compiler-state flush.
#
# A full single-process suite run compiles many thousands of XLA:CPU
# programs; past ~2/3 of the suite the in-process LLVM JIT state can
# segfault on a FRESH compile of even a trivial program (observed twice on
# 2026-08-21: `Fatal Python error: Segmentation fault` inside
# backend_compile_and_load while compiling a vmapped key-split, ~39% into
# tests/digital — the same battery is green standalone).  Dropping the jit
# caches every few test files bounds accumulated executables; the affected
# programs simply recompile on next use.
# ---------------------------------------------------------------------------
_SEEN_FILES: set = set()
_CLEAR_EVERY_FILES = 6


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear(request):
    path = str(getattr(request.node, "fspath", ""))
    if path and path not in _SEEN_FILES:
        _SEEN_FILES.add(path)
        if len(_SEEN_FILES) % _CLEAR_EVERY_FILES == 0:
            jax.clear_caches()
            try:
                from yaqs_tpu.digital.engine import clear_program_cache

                clear_program_cache()
            except Exception:
                pass
    yield
