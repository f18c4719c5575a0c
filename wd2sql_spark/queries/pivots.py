"""Pivot / unpivot (reshape) battery.

Not present in the reference (its schema is fixed, SURVEY §1.3), but part
of the standard analytical surface SQLite users express with CASE-WHEN
aggregates — which is exactly the oracle form here, since ANSI SQL has no
portable PIVOT.

Scale notes: ``pivot`` with an EXPLICIT value list compiles to one hash
aggregate with N conditional branches — a single shuffle, no extra pass.
Omitting the value list makes Spark run a distinct-scan job first: never do
that on a 100 TB fact. ``unpivot`` is a narrow map-side explode (no
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries.registry import query

PIVOT_ORACLE = """
SELECT n.n_name,
       COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS status_f,
       COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS status_o,
       COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS status_p
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query("pivot_status_by_nation", oracle=PIVOT_ORACLE, category="reshape")
def pivot_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide: order counts per nation pivoted over order status. The
    explicit value list keeps it a single-shuffle hash aggregate (no
    distinct pre-scan); nation is broadcast."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    wide = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return wide.select(
        "n_name",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    ).orderBy("n_name")


UNPIVOT_ORACLE = """
SELECT p_partkey, 'retailprice' AS measure, round(p_retailprice, 2) AS val
FROM part
UNION ALL
SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val
FROM part
ORDER BY p_partkey, measure
"""


@query("unpivot_part_measures", oracle=UNPIVOT_ORACLE, category="reshape")
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long: two part measures melted to (key, measure, val) rows via
    ``DataFrame.unpivot`` — a narrow per-row expand, zero shuffle (the sort
    here is presentation-only for the oracle diff)."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round("p_retailprice", 2).alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="measure",
        valueColumnName="val",
    ).orderBy("p_partkey", "measure")
