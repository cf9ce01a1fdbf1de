"""Every docs/examples script must run end-to-end (executable docs)."""

from __future__ import annotations

import pathlib
import runpy

import pytest

pytestmark = pytest.mark.slow

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "docs" / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path):
    runpy.run_path(str(path), run_name="__main__")
