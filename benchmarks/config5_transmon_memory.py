"""BASELINE config 5: transmon-resonator chain (heterogeneous local dims,
zero-padded to a uniform d) + process-tensor memory characterization.

Env: BENCH_CPU=1 to force CPU (default; dense rho-space backend).
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

from yaqs_tpu import Hamiltonian
from yaqs_tpu.memory_characterizer import MemoryCharacterizer


def main() -> None:
    ham = Hamiltonian.coupled_transmon(
        length=4,
        qubit_dim=2,
        resonator_dim=2,
        qubit_freq=5.0,
        resonator_freq=7.0,
        anharmonicity=-0.3,
        coupling=0.15,
    )
    mc = MemoryCharacterizer(preset="quick")
    t0 = time.perf_counter()
    pt = mc.build_process_tensor(
        ham, num_interventions=3, tau=0.4, method="mpo", max_bond_dim=32
    )
    qmi = pt.qmi(2)
    res = mc.characterize(pt, seed=0)
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "config": "5: transmon-resonator chain process-tensor memory",
                "qmi_cut2": round(float(qmi), 6),
                "operational_entropy": round(float(res.entropy), 6),
                "pt_bond_dims": pt.bond_dims,
                "wall_sec": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
