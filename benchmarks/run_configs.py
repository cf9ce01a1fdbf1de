"""Run the BASELINE config harnesses and collect machine-readable artifacts.

Executes configs 2 (Heisenberg XXZ on the chip), 4 (QFT-50 equivalence, CPU)
and 5 (transmon process-tensor memory, CPU) and writes one JSON object per
config to ``BENCH_CONFIGS_r{N}.json`` at the repo root — numbers the next
round can diff without reading README prose (VERDICT r2 #8).

Env: ROUND (default 03), CONFIGS (comma list, default "2,4,5"),
N_QUBITS for config 4 (default 50 to match BASELINE), plus each harness's
own knobs.  Requires an otherwise-idle host: concurrent CPU load corrupts
both the chip numbers and the checker wall time (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

HARNESSES = {
    "2": ("config2_heisenberg_xxz.py", {}),
    "4": ("config4_qft_equivalence.py", {"N_QUBITS": os.environ.get("N_QUBITS", "50")}),
    "5": ("config5_transmon_memory.py", {}),
}


def main() -> None:
    rnd = os.environ.get("ROUND", "03")
    which = os.environ.get("CONFIGS", "2,4,5").split(",")
    records = []
    for key in which:
        script, extra = HARNESSES[key.strip()]
        env = {**os.environ, **extra}
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, script)],
            env=env,
            capture_output=True,
            text=True,
            timeout=float(os.environ.get("CONFIG_TIMEOUT", 3600)),
        )
        wall = time.perf_counter() - t0
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not lines:
            tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
            rec = {
                "config": key,
                "error": " | ".join(tail)[:400],
                "wall_sec": round(wall, 2),
            }
        else:
            rec = json.loads(lines[-1])
            rec.setdefault("wall_sec", round(wall, 2))
        records.append(rec)
        print(json.dumps(rec), flush=True)
    out_path = os.path.join(ROOT, f"BENCH_CONFIGS_r{rnd}.json")
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
