"""Loading the driver's synthetic tables (TESTDATA.md) and registering views.

All reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning into the scan for free. At 100 TB these would be
partitioned/bucketed managed tables; the API here is path-based only because
the fixtures are single parquet files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark's parquet
    reader rejects by default; the legacy conf reads it as LongType
    (nanoseconds since epoch). It is a runtime SQL conf, so setting it here
    works under the driver's session too. Use :func:`events` to get a
    proper timestamp column back.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream fixture with ``ts`` converted nanos→timestamp
    (microsecond precision, truncating — matches DuckDB's
    TIMESTAMP_NS→TIMESTAMP cast)."""
    from pyspark.sql import functions as F

    raw = table(spark, sf_dir, "events")
    # integer `div`, NOT `/`: float division of ns-scale longs (~1.7e18)
    # exceeds double's 2^53 mantissa and lands ±1µs off.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
