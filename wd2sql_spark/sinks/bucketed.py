"""Bucketed table writes: pre-shuffled, co-located storage for repeated
big-big joins.

The reference's analog is its index-after-load step (main.rs:246-249 in
/root/reference — pay a one-time physical organization cost so every later
query is cheap). In Spark the equivalent for fact-fact joins is bucketing:
``bucketBy(n, key)`` shuffles ONCE at write time; every later join or
aggregation on the bucket key then runs with ZERO exchange, because both
sides' partitioning is already aligned (SortMergeJoin with no Exchange
under it — asserted in tests/test_bucketing.py).

At 100 TB: bucket both fact tables by the join key with the same bucket
count at ingest; pick n_buckets so one bucket ≈ one executor-core's worth
(fact_bytes / n_buckets ≲ a few hundred MB). Bucket pruning also applies
to point lookups on the bucket key (one bucket scanned instead of all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    *,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table bucketed (and by default
    sorted) on ``bucket_col``. Sorting within buckets lets merge joins
    skip the per-partition sort when files-per-bucket is 1."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
