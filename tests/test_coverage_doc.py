"""COVERAGE.md must stay in sync with CORRECTNESS_r*.json + the registry."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_coverage_md_is_fresh():
    import gen_coverage

    expected = gen_coverage.generate()
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        actual = f.read()
    assert actual == expected, (
        "COVERAGE.md is stale — regenerate with `python tools/gen_coverage.py`"
    )
