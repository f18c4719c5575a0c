"""Shard export sinks: global order / disjoint ranges for sorted shards,
pure-function membership for hash shards, and plan budgets (one exchange
each)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.plans.audit import plan_report
from wd2sql_spark.sinks.shards import (
    shard_manifest,
    write_hash_shards,
    write_sorted_shards,
)

SF = "/root/testdata/sf0.001"
N_SHARDS = 8


def test_sorted_shards_are_disjoint_and_ordered(spark, tmp_path):
    docs = table(spark, SF, "documents").select("doc_id", "n_chars", "text")
    out = str(tmp_path / "sorted")
    write_sorted_shards(
        docs, out, order_col="n_chars", tiebreak_col="doc_id", n_shards=N_SHARDS
    )
    man = shard_manifest(spark, out, "n_chars").collect()
    assert 1 < len(man) <= N_SHARDS
    # pairwise non-overlapping key ranges in manifest order
    for a, b in zip(man, man[1:]):
        assert a["max_key"] <= b["min_key"], (a, b)
    # nothing lost or duplicated
    assert sum(r["n_rows"] for r in man) == docs.count()
    # rows inside one shard file really are sorted
    first = spark.read.parquet(man[0]["file"]).select("n_chars", "doc_id").collect()
    keys = [(r["n_chars"], r["doc_id"]) for r in first]
    assert keys == sorted(keys)


def test_sorted_shards_single_range_exchange(spark):
    docs = table(spark, SF, "documents").select("doc_id", "n_chars")
    plan = (
        docs.repartitionByRange(N_SHARDS, F.col("n_chars"), F.col("doc_id"))
        .sortWithinPartitions("n_chars", "doc_id")
    )
    rep = plan_report(plan)
    assert rep.shuffles == 1, rep.text  # exactly the one range exchange


def test_sorted_shards_support_rowgroup_skipping(spark, tmp_path):
    """The point of sorting: a range predicate on the order key must reach
    the parquet scan as a pushed filter, where sorted row-group min/max
    stats prune IO."""
    docs = table(spark, SF, "documents").select("doc_id", "n_chars", "text")
    out = str(tmp_path / "sorted-skip")
    write_sorted_shards(
        docs, out, order_col="n_chars", tiebreak_col="doc_id", n_shards=N_SHARDS
    )
    rd = spark.read.parquet(out).filter(F.col("n_chars") > 900)
    rep = plan_report(rd)
    assert any(
        "n_chars" in f and "GreaterThan" in f for f in rep.pushed_filters
    ), rep.pushed_filters


def test_hash_shards_membership_is_pure_function(spark, tmp_path):
    docs = table(spark, SF, "documents").select("doc_id", "text")
    out = str(tmp_path / "hashed")
    write_hash_shards(docs, out, id_col="doc_id", n_shards=N_SHARDS)
    rd = spark.read.parquet(out)
    # every shard directory materialized, total preserved
    assert rd.select("shard").distinct().count() == N_SHARDS
    assert rd.count() == docs.count()
    # membership recomputes identically from the id alone (engine-portable)
    expected = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit("shard"), F.col("doc_id"))), 1, 15), 16, 10)
        .cast("long")
        % N_SHARDS
    ).cast("int")
    mismatches = rd.filter(F.col("shard") != expected).count()
    assert mismatches == 0
    # a single-shard read prunes to that partition directory
    one = spark.read.parquet(out).filter(F.col("shard") == 3)
    assert one.count() == rd.filter(expected == 3).count()
