"""Noise-scope battery: WHICH sites a digital gate's noise touches.

Reference semantics (/root/reference/src/mqt/yaqs/digital/digital_tjm.py:49-65
``create_local_noise_model`` + :520): after each multi-qubit gate, exactly the
noise processes whose sites are a SUBSET of the gate's LOGICAL sites fire —
sites between the endpoints of a long-range gate are not noised, one-qubit
gates carry no noise, and a 3q gate noises all three of its sites
(/root/reference/tests/digital/test_digital_tjm.py:1795,2167).

The repo's engine routes long-range gates through swap chains and batches
disjoint gates into half-layers, so "noise on the logical sites only" is a
real invariant to defend, not a restatement of the implementation.  Oracle:
dense density-matrix evolution with an exact per-gate Lindblad channel
(expm of the Liouvillian at dt=1) on the subset-matched processes.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg

from test_engine import dense_apply

from yaqs_tpu import DigitalSimParams, NoiseModel, Observable, Simulator, State
from yaqs_tpu.analog.embedding import embed_one_site, embed_operator
from yaqs_tpu.analog.lindblad import build_liouvillian
from yaqs_tpu.digital.circuit import Circuit
from yaqs_tpu.models.operators import lowering, pauli_z


def _scoped_oracle(circuit: Circuit, rho0, processes, length):
    """Dense evolution: unitary per gate, then the exact channel of every
    process whose sites are inside the gate's logical sites (k >= 2 only)."""
    dim = 2**length
    rho = rho0.copy()

    def channel(rho, gate_sites):
        jumps = []
        for proc in processes:
            if not set(proc["sites"]) <= set(gate_sites):
                continue
            mat = np.asarray(proc["matrix"])
            if len(proc["sites"]) == 1:
                full = embed_one_site(mat, proc["sites"][0], length)
            else:
                a, b = proc["sites"]
                t = mat.reshape(2, 2, 2, 2)
                full = np.zeros((dim, dim), dtype=complex)
                # decompose the two-site matrix over single-site factors
                for i in range(2):
                    for j in range(2):
                        for k in range(2):
                            for m in range(2):
                                if t[i, j, k, m] == 0:
                                    continue
                                e_a = np.zeros((2, 2)); e_a[i, k] = 1.0
                                e_b = np.zeros((2, 2)); e_b[j, m] = 1.0
                                full += t[i, j, k, m] * embed_operator(
                                    {a: e_a, b: e_b}, length
                                )
            jumps.append(np.sqrt(proc["strength"]) * full)
        if not jumps:
            return rho
        liou = build_liouvillian(np.zeros((dim, dim)), jumps)
        prop = scipy.linalg.expm(liou)
        return (prop @ rho.reshape(-1)).reshape(dim, dim)

    for op in circuit.ops:
        if op.name in {"barrier", "measure"}:
            continue
        cols = []
        for col in range(dim):
            e = np.zeros(dim, dtype=complex)
            e[col] = 1.0
            cols.append(dense_apply(e, op.resolved_matrix(), list(op.qubits), length))
        u = np.stack(cols, axis=1)
        rho = u @ rho @ u.conj().T
        if len(op.qubits) >= 2:
            rho = channel(rho, op.qubits)
    return rho


def _run_and_compare(circuit, nm_entries, length, num_traj, seed, slack):
    nm = NoiseModel([{k: v for k, v in p.items()} for p in nm_entries])
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    procs = [
        dict(p, matrix=np.asarray(q["matrix"]))
        for p, q in zip(nm_entries, nm.processes)
    ]
    rho = _scoped_oracle(circuit, np.outer(psi0, psi0.conj()), procs, length)
    exact = np.array(
        [np.real(np.trace(embed_one_site(pauli_z, i, length) @ rho)) for i in range(length)]
    )
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        num_traj=num_traj,
        max_bond_dim=16,
        svd_threshold=1e-12,
        random_seed=seed,
    )
    res = Simulator().run(State(length), circuit, params, nm)
    stderr = res.trajectories.std(axis=0)[:, -1] / np.sqrt(res.num_trajectories)
    diff = np.abs(res.expectation_values[:, -1] - exact)
    assert np.all(diff < 5 * stderr + slack), (diff, stderr, exact)
    return res


def test_long_range_noise_only_on_logical_sites():
    """cx(0,4) at strong damping: the three in-between sites stay noiseless
    even though the engine's swap routing physically traverses them."""
    length = 5
    gamma = 0.3
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.cx(0, 4)
    entries = [
        {"name": "lowering", "sites": [i], "strength": gamma, "matrix": lowering}
        for i in range(length)
    ]
    _run_and_compare(c, entries, length, num_traj=600, seed=7, slack=0.03)


def test_long_range_noise_leak_would_be_detected():
    """Self-check on the previous test's power: an oracle that (wrongly)
    noises the in-between sites predicts a VERY different state, so the
    5-sigma band genuinely discriminates scope bugs."""
    length = 5
    gamma = 0.3
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.cx(0, 4)
    entries = [
        {"name": "lowering", "sites": [i], "strength": gamma, "matrix": lowering}
        for i in range(length)
    ]
    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    right = _scoped_oracle(c, np.outer(psi0, psi0.conj()), entries, length)

    class _AllSites(Circuit):
        pass

    # wrong-scope oracle: pretend the gate's logical sites were 0..4
    wrong_c = Circuit(length)
    for q in range(length):
        wrong_c.h(q)
    wrong_c.append("u_custom", tuple(range(length)), matrix=np.eye(2**length))
    wrong = _scoped_oracle(
        wrong_c, np.outer(psi0, psi0.conj()), entries, length
    )
    # undo: wrong applied noise to all 5 sites after an identity, right after cx.
    z_right = [np.real(np.trace(embed_one_site(pauli_z, i, length) @ right)) for i in range(length)]
    z_wrong = [np.real(np.trace(embed_one_site(pauli_z, i, length) @ wrong)) for i in range(length)]
    assert np.max(np.abs(np.array(z_right) - np.array(z_wrong))) > 0.15


def test_three_qubit_gate_noises_all_three_sites():
    """ccx noise scope is all three logical sites (reference
    test_digital_tjm.py:2167)."""
    length = 3
    gamma = 0.25
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.ccx(0, 1, 2)
    entries = [
        {"name": "lowering", "sites": [i], "strength": gamma, "matrix": lowering}
        for i in range(length)
    ]
    _run_and_compare(c, entries, length, num_traj=600, seed=11, slack=0.03)


def test_two_site_process_fires_only_inside_gate_scope():
    """A two-site exchange process on sites (1,2) fires after cx(1,2) but NOT
    after the long-range cx(0,3) (sites not a subset of {0,3})."""
    length = 4
    gamma2 = 0.35
    exchange = np.zeros((4, 4), dtype=complex)
    exchange[0, 3] = 1.0
    exchange[3, 0] = 1.0
    c = Circuit(length)
    for q in range(length):
        c.h(q)
    c.cx(0, 3)
    c.cx(1, 2)
    entries = [
        {"name": "pair_exchange", "sites": [1, 2], "strength": gamma2, "matrix": exchange},
    ]
    _run_and_compare(c, entries, length, num_traj=600, seed=13, slack=0.03)


def test_one_qubit_gates_carry_no_noise():
    """A circuit of only 1q gates under a nonzero noise model is exactly
    unitary — every trajectory identical (reference digital_tjm.py:520 scopes
    noise to multi-qubit gates only)."""
    length = 3
    c = Circuit(length)
    for q in range(length):
        c.h(q)
        c.rz(q, params=(0.3,))
        c.ry(q, params=(0.7,))
    nm = NoiseModel(
        [{"name": "lowering", "sites": [i], "strength": 0.5} for i in range(length)]
    )
    from test_engine import run_dense

    psi0 = np.zeros(2**length, dtype=complex)
    psi0[0] = 1.0
    golden = run_dense(c, psi0)
    want = [
        np.real(np.vdot(golden, embed_one_site(pauli_z, i, length) @ golden))
        for i in range(length)
    ]
    params = DigitalSimParams(
        observables=[Observable("z", i) for i in range(length)],
        num_traj=8,
        max_bond_dim=8,
        svd_threshold=1e-12,
        random_seed=17,
    )
    res = Simulator().run(State(length), c, params, nm)
    np.testing.assert_allclose(res.expectation_values[:, -1], want, atol=1e-8)
    # all trajectories bitwise identical: no stochastic branch ever fired
    assert np.ptp(res.trajectories, axis=0).max() < 1e-12
