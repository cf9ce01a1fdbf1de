"""TPU end-to-end smoke: drive every public path on the real chip.

The tunneled TPU platform has two hard constraints the library must respect
everywhere (CLAUDE.md): eager complex device compute is UNIMPLEMENTED, and
complex device->host transfer is UNIMPLEMENTED (fetch real views only).
This script exercises each public entry point with tiny shapes to flush out
violations; it is the TPU analogue of the CPU test suite's surface drive.

Run: python benchmarks/tpu_smoke.py   (exits nonzero on first failure)
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yaqs_tpu import (
    AnalogSimParams,
    DigitalSimParams,
    EquivalenceChecker,
    Hamiltonian,
    NoiseModel,
    Observable,
    Simulator,
    State,
)

PASS = []
FAIL = []

# A failed dispatch wedges the process on this platform (every subsequent
# dispatch/compile fails), so by default each check runs in its OWN
# subprocess (CHECK=<name> env runs one check inline); the persistent
# compile cache keeps repeat runs fast.
_ONE = os.environ.get("CHECK")


def check(name, fn):
    if _ONE is not None:
        if name != _ONE:
            return
        t0 = time.perf_counter()
        fn()
        print(f"  ok  {name}  ({time.perf_counter() - t0:.1f}s)", flush=True)
        return
    import subprocess

    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env={**os.environ, "CHECK": name},
        capture_output=True,
        text=True,
        timeout=float(os.environ.get("SMOKE_CHECK_TIMEOUT", 1800)),
    )
    dt = time.perf_counter() - t0
    if proc.returncode == 0 and f"ok  {name}" in proc.stdout:
        PASS.append(name)
        print(f"  ok  {name}  ({dt:.1f}s)", flush=True)
    else:
        FAIL.append(name)
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
        print(f"  FAIL  {name}  ({dt:.1f}s): " + " | ".join(tail), flush=True)


def main() -> None:
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    L = 6
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(L)]
    )
    ham = Hamiltonian.ising(L, 1.0, 0.5)
    zobs = [Observable("z", i) for i in range(L)]

    def analog_tjm():
        res = Simulator().run(
            State(L, state="x+"),
            ham,
            AnalogSimParams(
                observables=zobs, elapsed_time=0.3, dt=0.1, num_traj=4,
                order=2, max_bond_dim=8, random_seed=1,
                svd_method="subspace", subspace_qr="newton",
                canon_method="newton", lanczos_reorth=False, subspace_iters=1,
            ),
            nm,
        )
        ev = np.asarray(res.expectation_values)
        assert ev.shape == (L, 4) and np.all(np.isfinite(ev))

    def analog_order1():
        res = Simulator().run(
            State(L, state="x+"), ham,
            AnalogSimParams(observables=zobs, elapsed_time=0.2, dt=0.1,
                            num_traj=2, order=1, max_bond_dim=8, random_seed=2),
            nm,
        )
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))

    def mcwf():
        res = Simulator().run(
            State(4, state="x+", representation="vector"), Hamiltonian.ising(4, 1.0, 0.5),
            AnalogSimParams(observables=[Observable("z", i) for i in range(4)],
                            elapsed_time=0.2, dt=0.1, num_traj=3, random_seed=3),
            NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(4)]),
        )
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))

    def lindblad():
        res = Simulator().run(
            State(3, state="x+", representation="density_matrix"),
            Hamiltonian.ising(3, 1.0, 0.5),
            AnalogSimParams(observables=[Observable("z", i) for i in range(3)],
                            elapsed_time=0.2, dt=0.1, random_seed=4),
            NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(3)]),
        )
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))

    def ensemble_multitime():
        res = Simulator().run(
            [State(L, state="x+"), State(L, state="Neel")], ham,
            AnalogSimParams(
                observables=zobs, elapsed_time=0.2, dt=0.1, max_bond_dim=8,
                multi_time_observables=[(Observable("z", 0), Observable("z", 0))],
            ),
            None,
        )
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))
        assert res.multi_time_correlators is not None

    def ensemble_multitime_2site():
        # two-site B path: host-side apply_local + capped compress (_make_phi)
        # plus the k-site A operator-Schmidt branch — both are host-boundary
        # code the single-site case never touches
        res = Simulator().run(
            [State(L, state="x+")], ham,
            AnalogSimParams(
                observables=zobs, elapsed_time=0.2, dt=0.1, max_bond_dim=8,
                multi_time_observables=[
                    (Observable("zz", [0, 1]), Observable("zz", [2, 3]))
                ],
            ),
            None,
        )
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))
        assert res.multi_time_correlators is not None

    def ensemble_bug_mode():
        # evolution_mode='bug' threaded through the unitary-ensemble path
        res = Simulator().run(
            [State(L, state="x+"), State(L, state="Neel")], ham,
            AnalogSimParams(
                observables=zobs, elapsed_time=0.2, dt=0.1, max_bond_dim=8,
                evolution_mode="bug",
            ),
            None,
        )
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))

    def digital():
        qasm = (
            'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[4];\ncreg c[4];\n'
            "h q[0];\ncx q[0],q[1];\ncx q[1],q[2];\ncx q[2],q[3];\nmeasure q -> c;\n"
        )
        res = Simulator().run(
            State(4), qasm,
            DigitalSimParams(observables=[Observable("z", i) for i in range(4)],
                             shots=16, num_traj=3, max_bond_dim=8, random_seed=5),
            NoiseModel([{"name": "x", "sites": [i], "strength": 0.01} for i in range(4)]),
        )
        assert sum(res.counts.values()) == 16
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))

    def digital_gate_modes():
        qasm = (
            'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[5];\n'
            "h q[0];\ncx q[0],q[4];\nccx q[0],q[2],q[4];\n"
        )
        for mode in ("swaps", "mpo", "tdvp"):
            res = Simulator().run(
                State(5), qasm,
                DigitalSimParams(observables=[Observable("z", 4)], num_traj=1,
                                 max_bond_dim=8, random_seed=6, gate_mode=mode),
                None,
            )
            assert np.all(np.isfinite(np.asarray(res.expectation_values))), mode

    def equivalence():
        q1 = 'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[3];\nh q[0];\ncx q[0],q[1];\n'
        assert EquivalenceChecker().check(q1, q1).equivalent
        # MPO backend (center-tracked local engine incl. a long-range walk)
        q2 = (
            'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[8];\n'
            "h q[0];\ncx q[0],q[1];\ncp(0.7) q[2],q[5];\nrz(0.3) q[7];\n"
        )
        res = EquivalenceChecker().check(q2, q2, max_bond_dim=8)
        assert res.method == "mpo" and res.equivalent, (res.method, res.fidelity)

    def characterize_noise():
        from yaqs_tpu import NoiseCharacterizer

        n = 3
        truth = NoiseModel([{"name": "z", "sites": [i], "strength": 0.1} for i in range(n)])
        guess = NoiseModel([{"name": "z", "sites": [i], "strength": 0.3} for i in range(n)])
        obs = [Observable("z", i) for i in range(n)]
        params = AnalogSimParams(observables=obs, elapsed_time=0.2, dt=0.1, max_bond_dim=8)
        fit = NoiseCharacterizer().characterize(
            Hamiltonian.ising(n, 1.0, 0.5), params,
            init_state=State(n, state="x+"), init_guess=guess, observables=obs,
            x_low=np.zeros(n), x_up=np.ones(n), reference_model=truth,
            max_iter=3, seed=0,
        )
        assert np.all(np.isfinite(np.asarray(fit.strengths)))

    def chunked_analog():
        # the chunked order-2 dispatch API (bounds per-dispatch work for long
        # time grids): closure-staged operands, keys+device carry across the
        # host boundary only
        import jax.numpy as jnp

        from yaqs_tpu.analog.tjm import (
            TrajectoryPlan,
            make_order2_chunked,
            sample_key,
            trajectory_key,
        )
        from yaqs_tpu.core import mps_ops
        from yaqs_tpu.core.mpo_builders import ising_mpo
        from yaqs_tpu.core.noise_model import compile_noise
        from yaqs_tpu.core.observables import compile_observables
        from yaqs_tpu.core.sim_params import Observable as Obs
        from yaqs_tpu.methods.tdvp import TDVPConfig

        Lc, chi = 6, 8
        c64 = lambda t: jax.tree.map(
            lambda x: x.astype(np.complex64) if np.iscomplexobj(x) else x, t
        )
        w = ising_mpo(Lc, 1.0, 0.5).astype(np.complex64)
        t0 = mps_ops.named_product_state("x+", Lc, chi).astype(np.complex64)
        cn = c64(compile_noise(
            NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(Lc)]),
            Lc, 2,
        ))
        obs = c64(compile_observables([Obs("z", i) for i in range(Lc)], Lc, 2))
        plan = TrajectoryPlan(
            dt=0.1, num_steps=4, order=2,
            evolution=TDVPConfig(
                krylov_dim=5, max_bond_dim=chi, svd_method="subspace",
                subspace_qr="newton", canon_method="newton",
                lanczos_reorth=False, subspace_iters=1,
            ),
        )
        start, chunk = make_order2_chunked(t0, w, cn, obs, plan)
        base = jax.random.PRNGKey(0)
        idx = jnp.arange(4)
        tks = jax.jit(jax.vmap(lambda i: trajectory_key(base, i)))(idx)
        sks = jax.jit(jax.vmap(lambda i: sample_key(base, i)))(idx)
        carry, cols01, _ = start(tks, sks)
        carry, obs_a, _ = chunk(tks, sks, carry, 2, 5)
        a = np.asarray(cols01)  # real-valued observable fetch
        b = np.asarray(obs_a)
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
        assert b.shape == (4, 3, Lc)

    def mcwf_krylov():
        # large-system MCWF path (dim > 4096 cutoff forced down): MPO-over-
        # statevector H_eff + local jump factors + Arnoldi (complex BCOO
        # matvecs are UNIMPLEMENTED on this platform — bisected 2026-08-17)
        import yaqs_tpu.simulator as sim_mod

        sim_mod._MCWF_MAX_PRECOMPUTE_DIM = 2
        res = Simulator().run(
            State(4, state="x+", representation="vector"),
            Hamiltonian.ising(4, 1.0, 0.5),
            AnalogSimParams(observables=[Observable("z", i) for i in range(4)],
                            elapsed_time=0.2, dt=0.1, num_traj=2, random_seed=7),
            NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(4)]),
        )
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))

    def lindblad_rk4():
        # large-system Lindblad ODE fallback: force the propagator cutoff
        # down so the sparse RK4 path dispatches (real-split BCOO matvecs —
        # complex BCOO does not lower on this platform, rule 6b)
        import yaqs_tpu.analog.lindblad as lb

        lb.MAX_PROPAGATOR_VEC_DIM = 2
        res = Simulator().run(
            State(3, state="x+", representation="density_matrix"),
            Hamiltonian.ising(3, 1.0, 0.5),
            AnalogSimParams(observables=[Observable("z", i) for i in range(3)],
                            elapsed_time=0.2, dt=0.1, num_traj=1),
            NoiseModel([{"name": "lowering", "sites": [i], "strength": 0.1} for i in range(3)]),
        )
        vals = np.asarray(res.expectation_values)
        assert np.all(np.isfinite(vals)) and np.all(np.abs(vals) <= 1 + 1e-6)

    def analog_l200():
        """Finiteness + accuracy at 2x bench length (VERDICT r4 #1/#2).

        The round-4 driver artifact recorded a non-finite L=200 observable
        (partial-isometry split class, fixed by half-step NS — see
        docs/tpu_numerics.md).  Noisy leg: bench knob set stays finite.
        Noiseless leg: interior <X> after t=0.2 is length-independent
        (light cone), golden 0.85034266 from L=12 dense expm + L=24/48 x64
        MPS (all agree to 5e-9).
        """
        Lb = 200
        hamb = Hamiltonian.ising(Lb, 1.0, 0.5)
        nmb = NoiseModel(
            [{"name": "z", "sites": [i], "strength": 0.05} for i in range(Lb)]
            + [{"name": "lowering", "sites": [i], "strength": 0.05} for i in range(Lb)]
        )
        knobs = dict(svd_method="subspace", subspace_qr="newton",
                     canon_method="newton", lanczos_reorth=False,
                     subspace_iters=1)
        res = Simulator().run(
            State(Lb, state="x+"), hamb,
            AnalogSimParams(
                observables=[Observable("z", i) for i in range(0, Lb, 20)],
                elapsed_time=0.2, dt=0.1, num_traj=2, order=2,
                max_bond_dim=16, krylov_dim=4, random_seed=1, **knobs,
            ),
            nmb,
        )
        assert np.all(np.isfinite(np.asarray(res.expectation_values)))
        res2 = Simulator().run(
            State(Lb, state="x+"), hamb,
            AnalogSimParams(
                observables=[Observable("x", i) for i in range(90, 111, 5)],
                elapsed_time=0.2, dt=0.1, num_traj=1, order=2,
                max_bond_dim=16, krylov_dim=8, random_seed=1, **knobs,
            ),
        )
        xs = np.asarray(res2.expectation_values)[:, -1]
        assert np.all(np.isfinite(xs))
        # interior uniformity (translation invariance) + golden accuracy
        assert np.abs(xs - xs.mean()).max() < 2e-3, xs
        assert abs(xs.mean() - 0.85034266) < 5e-3, xs.mean()

    def characterize_memory():
        from yaqs_tpu import MemoryCharacterizer

        mc = MemoryCharacterizer(preset="quick")
        res = mc.characterize(
            Hamiltonian.ising(2, 1.0, 0.5), num_interventions=2, tau=0.3, seed=1
        )
        assert np.isfinite(res.entropy)

    if _ONE is None:
        print("running each check in a fresh subprocess (wedge isolation)", flush=True)
    check("analog TJM order2 (fast path)", analog_tjm)
    check("analog TJM order1", analog_order1)
    check("MCWF (vector)", mcwf)
    check("Lindblad (density matrix)", lindblad)
    check("unitary ensemble + multi-time", ensemble_multitime)
    check("ensemble multi-time two-site B", ensemble_multitime_2site)
    check("ensemble evolution_mode=bug", ensemble_bug_mode)
    check("digital TEBD + shots + noise", digital)
    check("digital gate modes (swaps/mpo/tdvp, 3q)", digital_gate_modes)
    check("equivalence checker", equivalence)
    check("noise characterization (CMA-ES)", characterize_noise)
    check("memory characterization (operational)", characterize_memory)
    check("chunked order-2 dispatch", chunked_analog)
    check("MCWF large-system (MPO H_eff + Arnoldi)", mcwf_krylov)
    check("Lindblad large-system (sparse RK4 ODE)", lindblad_rk4)
    check("analog L=200 chain (finiteness + interior-X golden)", analog_l200)
    if _ONE is not None:
        return
    if FAIL:
        print(f"{len(PASS)} passed, {len(FAIL)} FAILED: {FAIL}", flush=True)
        sys.exit(1)
    print(f"ALL {len(PASS)} TPU SMOKE CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
