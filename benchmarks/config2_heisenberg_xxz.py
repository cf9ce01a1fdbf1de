"""BASELINE config 2: Heisenberg XXZ L=100, relaxation+dephasing, chi=64,
2TDVP trajectories.  Delegates to the bench harness with the heisenberg model.

Env: N_TRAJ (default 64 here; the BASELINE quotes 1000 — scale as budgeted),
BENCH_CPU=1 for a CPU smoke at reduced size.
"""

import json
import os
import subprocess
import sys

here = os.path.dirname(os.path.abspath(__file__))
env = dict(os.environ)
env.setdefault("BENCH_MODEL", "heisenberg")
out = subprocess.run(
    [sys.executable, os.path.join(here, "..", "bench.py")],
    env=env,
    capture_output=True,
    text=True,
    check=True,
)
line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
rec = json.loads(line)
rec["config"] = "2: Heisenberg XXZ L=100 chi=64 relaxation+dephasing"
print(json.dumps(rec))
