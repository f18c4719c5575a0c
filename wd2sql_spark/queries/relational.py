"""Core relational battery: scans, filters, projections, and the flagship
query that mirrors the reference's documented query surface.

The reference's whole query model (README.md:103-157 in /root/reference) is:
(Q1) point lookup by label, (Q2) conjunctive constraints as intersections of
IN-subqueries (≡ left-semi joins), (Q3) a label-enrichment join back. The
flagship query reproduces exactly that shape on the driver's star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Flagship: the reference's Q1→Q2→Q3 shape ("red fruits", README.md:129-157)
# restated on the star schema: filter a dim by name, narrow a fact with two
# semi-joins, enrich back with names.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
FROM customer c
WHERE c.c_nationkey IN (
        SELECT n.n_nationkey FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA')
  AND c.c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
  AND c.c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
ORDER BY c.c_custkey
"""


@query("flagship_semi_join_enrich", oracle=FLAGSHIP_ORACLE, category="flagship")
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in region ASIA having both an urgent order and a
    high-value order, with names — the reference's conjunctive
    semi-join + label-service shape (README.md:129-157).

    Scale notes: region/nation are tiny dims → broadcast semi-joins (no
    shuffle of customer); the two orders-side semi-joins shuffle only the
    projected (o_custkey) column. Catalyst rewrites IN-subqueries the same
    way; we express the joins directly.
    """
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    )
    customer = table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    orders = table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high_value = orders.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    return (
        customer.join(urgent, F.col("c_custkey") == urgent["o_custkey"], "left_semi")
        .join(high_value, F.col("c_custkey") == high_value["o_custkey"], "left_semi")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Scan + filter battery: every predicate form, all pushdown-eligible.
# ---------------------------------------------------------------------------

FILTER_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_orderpriority LIKE '%URGENT%'
  AND o_totalprice BETWEEN 50000.0 AND 400000.0
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_custkey IS NOT NULL
ORDER BY o_orderkey
"""


@query("filter_predicates", oracle=FILTER_ORACLE, category="filters")
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """=, IN, LIKE, BETWEEN, IS NOT NULL, timestamp comparison — all in one
    conjunction so the whole predicate reaches the parquet scan
    (PushedFilters in .explain)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderpriority").like("%URGENT%")
            & F.col("o_totalprice").between(50000.0, 400000.0)
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & F.col("o_custkey").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy("o_orderkey")
    )


PROJECTION_ORACLE = """
SELECT
  p_partkey,
  upper(p_brand) AS brand_uc,
  p_size * 2 AS double_size,
  round(p_retailprice * 1.1, 2) AS marked_up,
  CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium' ELSE 'small' END AS size_class
FROM part
ORDER BY p_partkey
"""


@query("projection_compute", oracle=PROJECTION_ORACLE, category="projection")
def projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + computed projections + CASE WHEN; the scan should
    read only the 4 referenced columns (ReadSchema in .explain)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        (F.col("p_size") * 2).alias("double_size"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    ).orderBy("p_partkey")


POINT_LOOKUP_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""


@query("point_lookup_by_label", oracle=POINT_LOOKUP_ORACLE, category="filters")
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Q1: `SELECT * FROM meta WHERE label = …`
    (README.md:108) — equality predicate pushed to the scan."""
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("sort_limit_topk", oracle=TOPK_ORACLE, category="sort")
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy + limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge, no full sort, no full shuffle."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )
