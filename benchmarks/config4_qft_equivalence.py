"""BASELINE config 4: MPO equivalence check, QFT vs transpiled QFT.

Env: N_QUBITS (default 20; the BASELINE quotes 50+), CHI (default 32).
Runs on CPU (the checker is a host-side layered contraction; x64).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from yaqs_tpu.equivalence import EquivalenceChecker
from yaqs_tpu.models.circuits import create_qft_circuit, create_transpiled_qft_circuit


def main() -> None:
    n = int(os.environ.get("N_QUBITS", 20))
    chi = int(os.environ.get("CHI", 32))  # BASELINE/round-2 artifact point
    swaps = os.environ.get("QFT_SWAPS", "1") == "1"
    t0 = time.perf_counter()
    res = EquivalenceChecker().check(
        create_qft_circuit(n, include_swaps=swaps),
        create_transpiled_qft_circuit(n, include_swaps=swaps),
        method="mpo",
        max_bond_dim=chi,
    )
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "config": f"4: QFT vs transpiled QFT equivalence, n={n} chi={chi}",
                "equivalent": bool(res.equivalent),
                "conclusive": bool(res.conclusive),
                "kept_weight": round(float(res.kept_weight), 6),
                "bond_dim_used": res.bond_dim_used,
                "fidelity": round(float(res.fidelity), 10),
                "wall_sec": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
