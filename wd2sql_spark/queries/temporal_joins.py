"""Temporal join operators: as-of join and range (interval) join.

The reference has no temporal joins (SURVEY §2-C "joins": query-side
semi/outer only, README.md:129-156) — these are the scale-path additions
that a time-series / event pipeline needs and that Spark has no built-in
operator for.

Scale notes:

- **As-of join** is NOT implemented as an inequality join (which Spark
  plans as a broadcast/shuffle nested loop over every (left, right) pair
  within the key — quadratic per key). It's the union+window formulation:
  tag both sides, union them, and take ``last(right_value) IGNORE NULLS``
  over a per-key window ordered by time. One shuffle on the join key,
  linear work per key, no row-pair blowup — the same plan at sf0.01 and at
  100 TB.
- **Range join** keeps an equi-key (``user_id``) so Catalyst plans a hash
  join on the key with the time-range predicate as a post-join filter —
  never a cartesian nested loop. At 100 TB the shuffle is on ``user_id``;
  per-key match lists stay bounded by the window width. (Spark's
  spark.sql.join.preferSortMergeJoin + AQE handle the physical pick.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wd2sql_spark.catalog import events
from wd2sql_spark.queries._determinism import exact_sum
from wd2sql_spark.queries.registry import query

ASOF_ORACLE = """
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
         CASE WHEN event_type = 'view' THEN value END AS v_value,
         CASE WHEN event_type = 'view' THEN event_id END AS v_id
  FROM events WHERE event_type IN ('click', 'view')
)
SELECT event_id AS click_id, user_id, ts AS click_ts,
       LAST_VALUE(v_id IGNORE NULLS) OVER w AS view_id,
       LAST_VALUE(v_value IGNORE NULLS) OVER w AS view_value
FROM u
WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_click, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
QUALIFY is_click = 1
ORDER BY click_id
"""


@query("join_asof_prior_view", oracle=ASOF_ORACLE, category="temporal_joins")
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every 'click' event, the most recent 'view' event by
    the same user at-or-before the click (ties on ts broken by event_id,
    views ordered before clicks at equal ts so "at" matches).

    Union+window formulation — see module docstring for why this beats the
    naive inequality join at scale.
    """
    e = events(spark, sf_dir).filter(F.col("event_type").isin("click", "view"))
    u = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
        F.when(F.col("event_type") == "view", F.col("value")).alias("v_value"),
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("v_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("view_id", F.last("v_id", ignorenulls=True).over(w))
        .withColumn("view_value", F.last("v_value", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
            "view_id",
            "view_value",
        )
        .orderBy("click_id")
    )


RANGE_ORACLE = """
SELECT e.event_id AS error_id, e.user_id,
       count(c.event_id) AS n_clicks,
       round(coalesce(SUM(CAST(round(c.value * 100, 0) AS BIGINT)), 0) / 100.0, 2) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
GROUP BY e.event_id, e.user_id
ORDER BY error_id
"""


@query("join_range_clicks_after_error", oracle=RANGE_ORACLE, category="temporal_joins")
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for every 'error' event, the count and summed value of
    the same user's 'click' events inside [error_ts, error_ts + 10 min).

    The equi-key (user_id) keeps this a hash/sort-merge join with the
    interval predicate evaluated post-match; without such a key a range
    join degenerates to a nested loop — always carry the key.
    """
    ev = events(spark, sf_dir)
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        F.col("value").alias("c_value"),
    )
    joined = err.join(
        clk,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("e_ts"))
        & (F.col("c_ts") < F.col("e_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left",
    )
    return (
        joined.groupBy("error_id", "user_id")
        .agg(
            F.count("c_id").alias("n_clicks"),
            F.round(F.coalesce(exact_sum(F.col("c_value"), 2), F.lit(0.0)), 2).alias(
                "click_value"
            ),
        )
        .orderBy("error_id")
    )
