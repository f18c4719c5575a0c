"""Storage-layout battery: Z-order clustering vs linear sort, scored by
the min/max data-skipping arithmetic that parquet pruning actually uses.

The audit assigns every ``orders`` row to a write bucket under two
layouts — Morton-interleaved (o_custkey, o_totalprice-cents) vs a plain
o_custkey sort — and computes each bucket's min/max span per dimension,
i.e. exactly the footer stats a 100 TB table's files would carry. A
2-D box predicate (top quarter of both normalized dims) then counts how
many buckets/rows each layout can PRUNE without reading. The measured
result on this fixture: the linear layout prunes only along its sort
dimension (12/16 buckets), the Z-order layout bounds both dimensions
and prunes 15/16 — the entire case for ZORDER-style clustering at
ingestion time, stated as data instead of doctrine.

Everything is integer arithmetic (min-max scale with integral div, bit
interleave, bucket div), so the DuckDB oracle repeats it textually and
the driver hash-checks the full layout computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.operators.layout import scale_to_bits, zorder_sql, zorder_value
from wd2sql_spark.queries.registry import query

BITS = 8  # per-dimension resolution: u in [0, 255]
Z_BUCKET = 4096  # 2^(2*BITS) / 16 -> 16 z-buckets
LIN_BUCKET = 16  # 2^BITS / 16 -> 16 linear buckets
BOX_LO = 192  # audit predicate: u1 >= 192 AND u2 >= 192 (top quarter each)

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"

ZORDER_ORACLE = f"""
WITH stats AS (
  SELECT MIN(o_custkey) AS mn1, MAX(o_custkey) AS mx1,
         MIN({_CENTS}) AS mn2, MAX({_CENTS}) AS mx2
  FROM orders),
base AS (
  SELECT ((o_custkey - mn1) * 255) // greatest(mx1 - mn1, 1) AS u1,
         (({_CENTS} - mn2) * 255) // greatest(mx2 - mn2, 1) AS u2
  FROM orders CROSS JOIN stats),
zb AS (SELECT u1, u2, {zorder_sql(["u1", "u2"], BITS)} AS z FROM base),
pairs AS (
  SELECT 'zorder' AS layout, z // {Z_BUCKET} AS bucket, u1, u2 FROM zb
  UNION ALL
  SELECT 'linear' AS layout, u1 // {LIN_BUCKET} AS bucket, u1, u2 FROM zb),
cells AS (
  SELECT layout, bucket, COUNT(*) AS n,
         MIN(u1) AS mn_u1, MAX(u1) AS mx_u1,
         MIN(u2) AS mn_u2, MAX(u2) AS mx_u2
  FROM pairs GROUP BY 1, 2),
flag AS (
  SELECT layout, n,
         CASE WHEN mx_u1 < {BOX_LO} OR mx_u2 < {BOX_LO} THEN 1 ELSE 0 END AS pruned
  FROM cells)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS buckets_total,
       CAST(SUM(pruned) AS BIGINT) AS buckets_pruned,
       CAST(SUM(n) AS BIGINT) AS rows_total,
       CAST(SUM(n * pruned) AS BIGINT) AS rows_pruned
FROM flag
GROUP BY layout
ORDER BY layout
"""


@query("layout_zorder_skipping", oracle=ZORDER_ORACLE, category="storage-layout")
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear layout, scored by 2-D min/max pruning.

    Plan: ONE corpus scan — the 1-row min/max stats relation broadcasts
    back onto the scan (no collect), the Morton key is a pure
    shift/mask projection inside codegen, and a 2x explode routes each
    row to its bucket under both layouts so a single tiny shuffle
    (32 bucket keys) produces every bucket's footer-style span stats.
    At 100 TB this is the write-path cost model: the audit's per-bucket
    spans ARE the parquet footer stats the layout would produce."""
    o = table(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_custkey").cast("long").alias("mn1"),
        F.max("o_custkey").cast("long").alias("mx1"),
        F.min(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mn2"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mx2"),
    )
    base = o.crossJoin(F.broadcast(stats)).select(
        scale_to_bits(F.col("o_custkey"), F.col("mn1"), F.col("mx1"), BITS).alias("u1"),
        scale_to_bits(
            F.round(F.col("o_totalprice") * 100).cast("long"),
            F.col("mn2"),
            F.col("mx2"),
            BITS,
        ).alias("u2"),
    )
    zb = base.select("u1", "u2", zorder_value([F.col("u1"), F.col("u2")], BITS).alias("z"))
    pairs = zb.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.call_function("div", F.col("z"), F.lit(Z_BUCKET)).alias("bucket"),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.call_function("div", F.col("u1"), F.lit(LIN_BUCKET)).alias("bucket"),
                ),
            )
        ).alias("lb"),
        "u1",
        "u2",
    )
    cells = pairs.groupBy(
        F.col("lb.layout").alias("layout"), F.col("lb.bucket").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("u1").alias("mx_u1"),
        F.max("u2").alias("mx_u2"),
    )
    pruned = F.when((F.col("mx_u1") < BOX_LO) | (F.col("mx_u2") < BOX_LO), 1).otherwise(0)
    return (
        cells.select("layout", "n", pruned.alias("pruned"))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("buckets_total"),
            F.sum("pruned").cast("bigint").alias("buckets_pruned"),
            F.sum("n").cast("bigint").alias("rows_total"),
            F.sum(F.col("n") * F.col("pruned")).cast("bigint").alias("rows_pruned"),
        )
        .orderBy("layout")
    )
