"""Benchmark: TJM trajectory throughput on the BASELINE flagship config.

Workload (BASELINE.json primary metric): 100-site transverse-field Ising
chain at padded bond dimension chi=64, analog TJM order 2 with one-site
dephasing+relaxation noise, dt=0.1 over 10 steps, Z observables on all sites,
per-timestep sampling.  Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "traj/sec/chip", "vs_baseline": N}

vs_baseline references the driver-assigned target of >= 1000 trajectories/min
on a v5p-8, i.e. ~2.083 trajectories/sec/chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

# allow CPU fallback for local runs: BENCH_CPU=1 forces the CPU backend
if os.environ.get("BENCH_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# persistent compilation cache: the trajectory program takes minutes to
# compile through the remote-compile helper; cache hits make re-runs fast
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# TPU f32 matmuls default to single-pass bf16 products, which corrupts the
# trajectory physics (~0.07 observable error over 5 sweeps vs 1e-3 at
# "high" = bf16x3 and 1e-4 at "highest"; measured against the float64 CPU
# reference).  "high" is the validated speed/accuracy point for the bench.
jax.config.update(
    "jax_default_matmul_precision", os.environ.get("BENCH_PREC", "high")
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from yaqs_tpu.analog.tjm import (  # noqa: E402
    TrajectoryPlan,
    sample_key,
    tjm_trajectory,
    trajectory_key,
)
from yaqs_tpu.core import mps_ops  # noqa: E402
from yaqs_tpu.core.mpo_builders import heisenberg_mpo, ising_mpo  # noqa: E402
from yaqs_tpu.core.noise_model import NoiseModel, compile_noise  # noqa: E402
from yaqs_tpu.core.observables import compile_observables  # noqa: E402
from yaqs_tpu.core.sim_params import Observable  # noqa: E402
from yaqs_tpu.methods.tdvp import TDVPConfig  # noqa: E402

L = int(os.environ.get("BENCH_L", 100))
CHI = int(os.environ.get("BENCH_CHI", 64))
MODEL = os.environ.get("BENCH_MODEL", "tfim")  # tfim | heisenberg (XXZ)
DT = 0.1
STEPS = int(os.environ.get("BENCH_STEPS", 10))
KRYLOV = int(os.environ.get("BENCH_KRYLOV", 5))
SVD_METHOD = os.environ.get("BENCH_SVD", "subspace")  # exact | subspace
SUBSPACE_ITERS = int(os.environ.get("BENCH_SITERS", 1))
REORTH = os.environ.get("BENCH_REORTH", "0") == "1"
SUBSPACE_QR = os.environ.get("BENCH_QR", "newton")  # householder | newton
CANON = os.environ.get("BENCH_CANON", "newton")  # qr | newton
BATCH = int(os.environ.get("BENCH_BATCH", 32))
REPS = int(os.environ.get("BENCH_REPS", 2))
TARGET_TRAJ_PER_SEC_PER_CHIP = 1000.0 / 60.0 / 8.0  # BASELINE: 1000/min on v5p-8


def main() -> None:
    dev = jax.devices()[0]
    use_x64 = dev.platform == "cpu" and jax.config.read("jax_enable_x64")
    # operands stay host-side numpy (complex device arrays cannot be jit
    # constants on the tunneled TPU platform)
    np_cdtype = np.complex128 if use_x64 else np.complex64
    if MODEL == "heisenberg":  # XXZ: BASELINE config 2
        w = heisenberg_mpo(L, 1.0, 1.0, 0.5, 0.2).astype(np_cdtype)
    else:
        w = ising_mpo(L, 1.0, 0.5).astype(np_cdtype)
    tensors0 = mps_ops.named_product_state("x+", L, CHI).astype(np_cdtype)
    nm = NoiseModel(
        [{"name": "z", "sites": [i], "strength": 0.05} for i in range(L)]
        + [{"name": "lowering", "sites": [i], "strength": 0.05} for i in range(L)]
    )
    noise = compile_noise(nm, L, 2)
    noise = jax.tree.map(
        lambda x: x.astype(np_cdtype) if np.iscomplexobj(x) else x, noise
    )
    observables = compile_observables([Observable("z", i) for i in range(L)], L, 2)
    observables = jax.tree.map(
        lambda x: x.astype(np_cdtype) if np.iscomplexobj(x) else x, observables
    )

    plan = TrajectoryPlan(
        dt=DT,
        num_steps=STEPS,
        order=2,
        sample_timesteps=True,
        evolution=TDVPConfig(
            krylov_dim=KRYLOV,
            trunc_mode="discarded_weight",
            threshold=1e-6,
            max_bond_dim=CHI,
            svd_method=SVD_METHOD,
            subspace_iters=SUBSPACE_ITERS,
            lanczos_reorth=REORTH,
            subspace_qr=SUBSPACE_QR,
            canon_method=CANON,
        ),
    )

    base = jax.random.PRNGKey(0)

    def one(tk, sk):
        res, _, _ = tjm_trajectory(tk, sk, tensors0, w, noise, observables, plan)
        return res

    batched = jax.jit(jax.vmap(one))
    idx = jnp.arange(BATCH)
    tks = jax.vmap(lambda i: trajectory_key(base, i))(idx)
    sks = jax.vmap(lambda i: sample_key(base, i))(idx)

    # compile + warm up. NOTE: on the tunneled TPU platform
    # block_until_ready returns before execution completes; fetching a value
    # is the only reliable completion barrier, so every timing below fetches.
    out = batched(tks, sks)
    warm = float(np.asarray(out[:, 0, -1]).mean())
    assert np.isfinite(warm)

    t0 = time.perf_counter()
    for r in range(REPS):
        idx = jnp.arange(BATCH * (r + 1), BATCH * (r + 2))
        tks = jax.vmap(lambda i: trajectory_key(base, i))(idx)
        sks = jax.vmap(lambda i: sample_key(base, i))(idx)
        out = batched(tks, sks)
        val = float(np.asarray(out[:, 0, -1]).mean())  # forces completion
        assert np.isfinite(val)
    elapsed = time.perf_counter() - t0

    traj_per_sec = BATCH * REPS / elapsed
    print(
        json.dumps(
            {
                "metric": f"TJM trajectories/sec/chip ({MODEL.upper()} L={L}, "
                f"chi={CHI}, {STEPS} steps dt={DT}, order 2, noisy)",
                "value": round(traj_per_sec, 4),
                "unit": "traj/sec/chip",
                "vs_baseline": round(traj_per_sec / TARGET_TRAJ_PER_SEC_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
