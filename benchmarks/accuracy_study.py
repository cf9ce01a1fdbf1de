"""Accuracy study: complex64 TPU configurations vs the float64 CPU golden.

The TJM trajectory program is deterministic given the PRNG keys, so the same
trajectories can be recomputed at different precisions/backends and compared
observable-by-observable.  This quantifies the complex64 deviation (the TPU
runs c64; c128 is unsupported on v5e) and validates fast-path knobs
(svd_method=subspace, subspace_qr=newton, canon_method=newton, krylov_dim,
matmul precision) against the reference-accurate configuration.

Usage:
    # 1) golden (CPU, float64, exact SVD, QR canonicalization):
    ACC_ROLE=golden python benchmarks/accuracy_study.py
    # 2) candidate on the TPU with the bench fast-path config:
    ACC_ROLE=candidate BENCH_PREC=high BENCH_SVD=subspace BENCH_QR=newton \
        BENCH_CANON=newton python benchmarks/accuracy_study.py
    # 3) compare:
    ACC_ROLE=compare python benchmarks/accuracy_study.py

Artifacts land in /tmp/yaqs_acc_{golden,candidate}.npy (observables
``(n_traj, n_obs, T)`` for the shared trajectory keys).
"""

from __future__ import annotations

import json
import os
import sys

ROLE = os.environ.get("ACC_ROLE", "compare")

if ROLE == "golden" or os.environ.get("BENCH_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if ROLE == "golden":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update(
    "jax_default_matmul_precision", os.environ.get("BENCH_PREC", "highest")
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = "/tmp/yaqs_acc_golden.npy"
CAND_PATH = "/tmp/yaqs_acc_candidate.npy"

L = int(os.environ.get("BENCH_L", 100))
CHI = int(os.environ.get("BENCH_CHI", 64))
DT = 0.1
STEPS = int(os.environ.get("BENCH_STEPS", 10))
NTRAJ = int(os.environ.get("ACC_NTRAJ", 2))
# ACC_NOISE=0 compares the DETERMINISTIC path (TDVP + splits + canon): with
# realistic noise strengths the jump probability per step is O(1), so a
# 1e-3-level norm difference flips discrete jump decisions and the raw
# trajectory comparison measures divergence, not numerical accuracy.  The
# stochastic machinery is validated against dense Lindblad/MCWF oracles in
# the CPU test suite instead (tests/analog/test_tjm.py).
NOISY = os.environ.get("ACC_NOISE", "0") == "1"


def run_config() -> np.ndarray:
    import jax.numpy as jnp

    from yaqs_tpu.analog.tjm import (
        TrajectoryPlan,
        sample_key,
        tjm_trajectory,
        trajectory_key,
    )
    from yaqs_tpu.core import mps_ops
    from yaqs_tpu.core.mpo_builders import ising_mpo
    from yaqs_tpu.core.noise_model import NoiseModel, compile_noise
    from yaqs_tpu.core.observables import compile_observables
    from yaqs_tpu.core.sim_params import Observable
    from yaqs_tpu.methods.tdvp import TDVPConfig

    golden = ROLE == "golden"
    np_cdtype = np.complex128 if golden else np.complex64
    w = ising_mpo(L, 1.0, 0.5).astype(np_cdtype)
    tensors0 = mps_ops.named_product_state("x+", L, CHI).astype(np_cdtype)
    if NOISY:
        nm = NoiseModel(
            [{"name": "z", "sites": [i], "strength": 0.05} for i in range(L)]
            + [{"name": "lowering", "sites": [i], "strength": 0.05} for i in range(L)]
        )
        noise = compile_noise(nm, L, 2)
        noise = jax.tree.map(
            lambda x: x.astype(np_cdtype) if np.iscomplexobj(x) else x, noise
        )
    else:
        noise = None
    observables = compile_observables([Observable("z", i) for i in range(L)], L, 2)
    observables = jax.tree.map(
        lambda x: x.astype(np_cdtype) if np.iscomplexobj(x) else x, observables
    )

    if golden:
        evolution = TDVPConfig(
            krylov_dim=12,
            trunc_mode="discarded_weight",
            threshold=1e-6,
            max_bond_dim=CHI,
            svd_method="exact",
            lanczos_reorth=True,
        )
    else:
        evolution = TDVPConfig(
            krylov_dim=int(os.environ.get("BENCH_KRYLOV", 6)),
            trunc_mode="discarded_weight",
            threshold=1e-6,
            max_bond_dim=CHI,
            svd_method=os.environ.get("BENCH_SVD", "subspace"),
            subspace_iters=int(os.environ.get("BENCH_SITERS", 1)),
            lanczos_reorth=os.environ.get("BENCH_REORTH", "0") == "1",
            subspace_qr=os.environ.get("BENCH_QR", "newton"),
            canon_method=os.environ.get("BENCH_CANON", "qr"),
        )
    plan = TrajectoryPlan(
        dt=DT, num_steps=STEPS, order=2, sample_timesteps=True, evolution=evolution
    )

    base = jax.random.PRNGKey(0)

    # batch-1 vmap matches the bench's program shape (the unbatched program
    # hits a TPU lowering gap on the tunneled platform)
    def one(tk, sk):
        res, _, _ = tjm_trajectory(tk, sk, tensors0, w, noise, observables, plan)
        return res

    batched = jax.jit(jax.vmap(one))
    rows = []
    for i in range(NTRAJ):
        import jax.numpy as _jnp

        tk = jax.vmap(lambda j: trajectory_key(base, j))(_jnp.asarray([i]))
        sk = jax.vmap(lambda j: sample_key(base, j))(_jnp.asarray([i]))
        res = batched(tk, sk)
        rows.append(np.asarray(res[0]))  # fetch forces completion on the tunnel
        print(f"traj {i} done", file=sys.stderr)
    return np.stack(rows)


def main() -> None:
    if ROLE == "compare":
        g = np.load(GOLDEN_PATH)
        c = np.load(CAND_PATH)
        diff = np.abs(g - c)
        print(
            json.dumps(
                {
                    "metric": "max |Z_i(t)| deviation vs x64 exact golden",
                    "max_abs": float(diff.max()),
                    "mean_abs": float(diff.mean()),
                    "per_traj_max": [float(x) for x in diff.reshape(len(g), -1).max(1)],
                }
            )
        )
        return
    out = run_config()
    path = GOLDEN_PATH if ROLE == "golden" else CAND_PATH
    np.save(path, out)
    print(f"saved {path} {out.shape}")


if __name__ == "__main__":
    main()
