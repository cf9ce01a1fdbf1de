#!/usr/bin/env bash
# CI entry point — the runnable equivalent of the reference's noxfile/CI
# matrix (/root/reference/noxfile.py: lint + tests sessions) for this image.
#
# The build image has no network egress and ships no ruff/nox/mypy, so the
# lint session degrades to bytecode compilation + the import/API contract,
# and ruff runs only when available (configuration lives in pyproject.toml
# and is kept current for environments that do have it).
#
#   scripts/ci.sh         # fast gate: lint + non-slow tests (~10 min, 1 CPU)
#   CI_FULL=1 scripts/ci.sh  # the full suite incl. slow batteries (~45 min)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint =="
python -m compileall -q yaqs_tpu tests benchmarks bench.py __graft_entry__.py
# stdlib AST linter (F401/F811/F822/E722/W605 subset); always executes
python scripts/lint.py
if python -m ruff --version >/dev/null 2>&1; then
  python -m ruff check yaqs_tpu tests
else
  echo "ruff unavailable in this image; scripts/lint.py covers the F-rules subset"
fi

echo "== public API pin =="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import yaqs_tpu
assert yaqs_tpu.__all__, "public API surface must be pinned"
for name in yaqs_tpu.__all__:
    getattr(yaqs_tpu, name)
print(f"ok: {len(yaqs_tpu.__all__)} public names importable")
EOF

echo "== tests =="
if [ "${CI_FULL:-0}" = "1" ]; then
  python -m pytest tests/ -q
else
  python -m pytest tests/ -q -m "not slow"
fi
