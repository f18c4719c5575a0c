"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``wd2sql_spark`` package; this module only
adapts its query registry to the driver's two-dict shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wd2sql_spark.queries import load_all_modules


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship reproduces the reference's documented query shape
    (README.md:129-157 in /root/reference): filter a dim by name, narrow a
    fact through two semi-joins, enrich back with names.
    """
    registry = load_all_modules()
    return registry["flagship_semi_join_enrich"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all_modules().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each oracled query; non-SQL-expressible ops are
    omitted (driver records a rows-only check for those)."""
    return {name: q.oracle for name, q in load_all_modules().items() if q.oracle is not None}
