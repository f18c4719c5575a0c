"""Change-data-capture / MERGE shapes over the events stream: snapshot
diffing with SCD-style change classification.

The reference writes each entity exactly once into SQLite and never
reconciles a later dump against an earlier load (main.rs:223-237 in
/root/reference — append-only inserts, a fresh database per run); a
production pipeline re-ingesting a newer dump needs the MERGE half: which
keys are new, which changed, which are untouched. Spark has no MERGE INTO
on plain parquet, but the operator decomposes into exactly the plan a
warehouse MERGE runs: build both keyed snapshots, full-outer join on the
key, classify per row.

Scale shape: each snapshot is one partial+final hash aggregate over the
fact (map-side combine shrinks it to |users| rows per executor before the
shuffle); both aggregates hash-partition by the SAME key, so the
full-outer join reuses that partitioning and adds NO third exchange. At
100 TB the old snapshot would be the previously-materialized dimension
table (bucketed by key), making the merge a single co-located join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import events
from wd2sql_spark.queries.registry import query

CUTOFF = "2024-01-15 00:00:00"  # old snapshot = events strictly before this


def _snapshot_sql(pred: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS units,
         MAX(struct_pack(ts := ts, event_id := event_id, event_type := event_type)) AS last_row
  FROM events {pred}
  GROUP BY user_id
)"""


SCD2_ORACLE = f"""
WITH {_snapshot_sql(f"WHERE ts < TIMESTAMP '{CUTOFF}'", "old")},
{_snapshot_sql("", "new")}
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            WHEN o.n_events <> n.n_events OR o.units <> n.units
                 OR o.last_row.event_type <> n.last_row.event_type THEN 'update'
            ELSE 'unchanged' END AS change_type,
       CAST(COALESCE(o.n_events, 0) AS BIGINT) AS old_n,
       CAST(COALESCE(n.n_events, 0) AS BIGINT) AS new_n,
       COALESCE(n.last_row.event_type, o.last_row.event_type) AS last_type,
       CAST(COALESCE(n.units, 0) - COALESCE(o.units, 0) AS BIGINT) AS delta_units
FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
ORDER BY user_id
"""


@query("cdc_scd2_merge", oracle=SCD2_ORACLE, category="cdc")
def cdc_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style snapshot diff: the per-user state as of {CUTOFF} vs the
    state now, each row classified insert / update / unchanged (the
    'delete' branch is structurally present but empty here — an
    event-sourced projection only grows; a dimension reload would use it).

    Per-user state is (event count, exact integer value units, last event
    type). The "last by (ts, event_id)" pick is a MAX over (ts, event_id,
    event_type) tuples — the tuple order is total (event_id unique), so
    both engines select the identical row without a second window pass.
    delta_units stays in integer units end-to-end: the diff of two exact
    longs, no float rounding anywhere. Plan notes in module docstring."""
    e = events(spark, sf_dir)
    units = F.round(F.col("value") * 1_000_000, 0).cast("long")

    def snapshot(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(units).alias("units"),
            F.max(F.struct("ts", "event_id", "event_type")).alias("last_row"),
        )

    old = snapshot(e.filter(F.col("ts") < F.lit(CUTOFF).cast("timestamp"))).alias("o")
    new = snapshot(e).alias("n")
    j = old.join(new, F.col("o.user_id") == F.col("n.user_id"), "full_outer")
    return j.select(
        F.coalesce(F.col("o.user_id"), F.col("n.user_id")).alias("user_id"),
        F.when(F.col("o.user_id").isNull(), "insert")
        .when(F.col("n.user_id").isNull(), "delete")
        .when(
            (F.col("o.n_events") != F.col("n.n_events"))
            | (F.col("o.units") != F.col("n.units"))
            | (F.col("o.last_row.event_type") != F.col("n.last_row.event_type")),
            "update",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        F.coalesce(F.col("o.n_events"), F.lit(0)).cast("bigint").alias("old_n"),
        F.coalesce(F.col("n.n_events"), F.lit(0)).cast("bigint").alias("new_n"),
        F.coalesce(F.col("n.last_row.event_type"), F.col("o.last_row.event_type")).alias(
            "last_type"
        ),
        (F.coalesce(F.col("n.units"), F.lit(0)) - F.coalesce(F.col("o.units"), F.lit(0)))
        .cast("bigint")
        .alias("delta_units"),
    ).orderBy("user_id")
