"""Unit tests for the managed persist/checkpoint holders (round 4).

These helpers carry the repo's storage-hygiene contract: one generation
per call site, reuse when the plan (or explicit key) is unchanged, and a
full release on clear_all_session_caches(). The battery-level assertion
lives in test_persist_hygiene.py; these pin the helper semantics on tiny
relations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wd2sql_spark.session_cache import (
    _BOUNDED,
    SessionCache,
    bounded_checkpoint,
    bounded_persist,
    cached_relation_count,
    clear_all_session_caches,
)


def test_bounded_persist_reuses_identical_plan(spark):
    clear_all_session_caches()
    df = spark.range(10).select((F.col("id") * 2).alias("x"))
    a = bounded_persist(df, "t.reuse")
    a.count()
    b = bounded_persist(spark.range(10).select((F.col("id") * 2).alias("x")), "t.reuse")
    assert b is a  # same held relation, no re-persist
    clear_all_session_caches()


def test_bounded_persist_replaces_changed_plan(spark):
    clear_all_session_caches()
    a = bounded_persist(spark.range(10), "t.replace")
    a.count()
    n0 = cached_relation_count(spark)
    b = bounded_persist(spark.range(20), "t.replace")
    b.count()
    assert b is not a
    # the old generation was unpersisted: count didn't grow
    assert cached_relation_count(spark) <= n0
    clear_all_session_caches()


def test_bounded_persist_explicit_key_skips_semantics(spark):
    clear_all_session_caches()
    a = bounded_persist(spark.range(5), "t.key", key=("k1",))
    # DIFFERENT plan but same key → reuse (caller owns key completeness)
    b = bounded_persist(spark.range(6), "t.key", key=("k1",))
    assert b is a
    c = bounded_persist(spark.range(6), "t.key", key=("k2",))
    assert c is not a
    clear_all_session_caches()


def test_bounded_checkpoint_preserves_partitioning_and_reuses(spark):
    clear_all_session_caches()
    df = spark.range(100).select((F.col("id") % 7).alias("k"), "id")
    pre = df.repartition(4, "k").sortWithinPartitions("k")
    a = bounded_checkpoint(pre, "t.ckpt")
    # LogicalRDD leaf: lineage truncated
    assert "ExistingRDD" in a._jdf.queryExecution().executedPlan().toString()
    b = bounded_checkpoint(
        spark.range(100).select((F.col("id") % 7).alias("k"), "id")
        .repartition(4, "k")
        .sortWithinPartitions("k"),
        "t.ckpt",
    )
    assert b is a
    # rows intact
    assert a.count() == 100
    clear_all_session_caches()


def test_clear_all_releases_everything(spark):
    clear_all_session_caches()
    spark.catalog.clearCache()
    bounded_persist(spark.range(10), "t.clear1").count()
    cache = SessionCache()
    cache.get_or_build(spark, ("v",), lambda: spark.range(3).persist())
    cache.get_or_build(
        spark, ("tup",), lambda: (spark.range(4).persist(), spark.range(5).persist())
    )
    cache.get_or_build(spark, ("d",), lambda: {"x": spark.range(6).persist()})
    assert cached_relation_count(spark) >= 4
    clear_all_session_caches()
    assert cached_relation_count(spark) == 0
    assert _BOUNDED == {}
