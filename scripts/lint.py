#!/usr/bin/env python
"""Minimal stdlib linter (the image has no ruff/flake8; zero egress).

Implements the subset of the repo's ruff config that matters for correctness
hygiene and can be checked with `ast` alone:

- F401: imported name never used (per module; `__init__.py` re-exports and
  names listed in ``__all__`` are exempt)
- F811: redefinition of a top-level def/class by another def/class
- F821-lite: names used in ``__all__`` that the module never defines
- E722: bare ``except:``
- W605-lite: invalid escape sequences surface as SyntaxWarning via compile()
- syntax: every file must compile

Run: python scripts/lint.py [paths...]   (default: yaqs_tpu tests benchmarks)
Exit 1 on findings. Wired into scripts/ci.sh.
"""

from __future__ import annotations

import ast
import sys
import warnings
from pathlib import Path

FINDINGS: list[str] = []


def _report(path, node, code, msg):
    line = getattr(node, "lineno", 0)
    FINDINGS.append(f"{path}:{line}: {code} {msg}")


class _UsageCollector(ast.NodeVisitor):
    def __init__(self):
        self.used: set[str] = set()

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        # record the ROOT name of dotted usage (module.attr)
        n = node
        while isinstance(n, ast.Attribute):
            n = n.value
        if isinstance(n, ast.Name):
            self.used.add(n.id)
        self.generic_visit(node)


def _string_names(tree) -> set[str]:
    """Names referenced as strings in __all__ / typing constructs."""
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            v = node.value
            if v.isidentifier():
                out.add(v)
            else:  # forward-ref annotations like "MPS | None"
                for tok in v.replace("[", " ").replace("]", " ").replace("|", " ").replace(",", " ").split():
                    if tok.isidentifier():
                        out.add(tok)
    return out


def lint_file(path: Path) -> None:
    src = path.read_text()
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", SyntaxWarning)
            compile(src, str(path), "exec")
    except SyntaxError as exc:
        FINDINGS.append(f"{path}:{exc.lineno}: E999 {exc.msg}")
        return
    except SyntaxWarning as exc:
        FINDINGS.append(f"{path}:0: W605 {exc}")
    tree = ast.parse(src)

    uses = _UsageCollector()
    uses.visit(tree)
    stringy = _string_names(tree)
    is_init = path.name == "__init__.py"
    is_test = path.parts[0] == "tests" if path.parts else False

    # __all__ contents
    dunder_all: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                                dunder_all.add(elt.value)

    # F401 unused imports (top level only; conservative)
    if not is_init:
        for node in tree.body:
            names = []
            if isinstance(node, ast.Import):
                names = [(a.asname or a.name.split(".")[0], a) for a in node.names]
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__" or any(a.name == "*" for a in node.names):
                    continue
                names = [(a.asname or a.name, a) for a in node.names]
            for name, _a in names:
                if name.startswith("_"):
                    continue
                if name in uses.used or name in stringy or name in dunder_all:
                    continue
                _report(path, node, "F401", f"'{name}' imported but unused")

    # F811 top-level redefinitions
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen and not node.name.startswith("_"):
                _report(path, node, "F811",
                        f"redefinition of '{node.name}' (first at line {seen[node.name]})")
            seen[node.name] = node.lineno

    # __all__ names must exist at module top level
    defined = set(seen)
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    defined.add(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            defined.add(node.target.id)
        elif isinstance(node, ast.Import):
            defined |= {a.asname or a.name.split(".")[0] for a in node.names}
        elif isinstance(node, ast.ImportFrom):
            defined |= {a.asname or a.name for a in node.names}
    for name in dunder_all - defined:
        FINDINGS.append(f"{path}:0: F822 '__all__' lists undefined name '{name}'")

    # E722 bare except
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            _report(path, node, "E722", "bare 'except:'")

    del is_test  # reserved for future test-specific rules


def main(argv: list[str]) -> int:
    roots = [Path(p) for p in (argv or ["yaqs_tpu", "tests", "benchmarks", "bench.py"])]
    files: list[Path] = []
    for r in roots:
        if r.is_file():
            files.append(r)
        else:
            files.extend(sorted(r.rglob("*.py")))
    for f in files:
        lint_file(f)
    for line in FINDINGS:
        print(line)
    print(f"lint: {len(files)} files, {len(FINDINGS)} findings")
    return 1 if FINDINGS else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
