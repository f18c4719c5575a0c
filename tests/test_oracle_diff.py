"""Oracle-differential tests at sf0.001 (fast twin of the driver's sf0.01
run; the standalone `python tests/oracle_check.py` does the full-fidelity
sf0.01 pass)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tests.oracle_check import compare
from wd2sql_spark.queries import load_all_modules

REGISTRY = load_all_modules()
ORACLED = [name for name, q in REGISTRY.items() if q.oracle is not None]


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, sf_dir, name):
    q = REGISTRY[name]
    res = compare(name, q.fn(spark, sf_dir), q.oracle, sf_dir)
    assert res.ok, res.errors
