"""Invariants of the scale-experiment data generator (tools/scale_experiment).

The scaling exponents in SCALE.md are only meaningful if the replicated
data models "more distinct data": replica 0 bit-identical to the base,
replicas r > 0 remapped/salted/perturbed so joins stay within a replica
and similarity across replicas is ~0. Pin those invariants at n=2 on the
smallest fixture so the generator can't silently regress into verbatim
duplication (which would overstate dedup pair counts quadratically).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

import tools.scale_experiment as SE
from wd2sql_spark.catalog import table

BASE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "x2")
    orig = SE.BASE
    SE.BASE = BASE
    try:
        SE.generate(spark, out, 2)
    finally:
        SE.BASE = orig
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_row_counts_scale(spark, scaled_dir):
    for t in ("lineitem", "events", "documents", "embeddings"):
        base_n = table(spark, BASE, t).count()
        assert table(spark, scaled_dir, t).count() == 2 * base_n
    for t in SE.FIXED_DIMS:
        assert table(spark, scaled_dir, t).count() == table(spark, BASE, t).count()


def test_replica_zero_documents_identical(spark, scaled_dir):
    base = table(spark, BASE, "documents").select("doc_id", "text")
    rep0 = table(spark, scaled_dir, "documents").filter(F.col("doc_id") < SE.KEY_CAP)
    diff = rep0.join(base.withColumnRenamed("text", "bt"), "doc_id").filter(
        F.col("text") != F.col("bt")
    )
    assert diff.count() == 0


def test_replica_one_documents_share_no_tokens(spark, scaled_dir):
    docs = table(spark, scaled_dir, "documents")
    tok = lambda df: df.select(F.explode(F.split("text", r"\s+")).alias("t"))  # noqa: E731
    shared = (
        tok(docs.filter(F.col("doc_id") < SE.KEY_CAP))
        .join(tok(docs.filter(F.col("doc_id") >= SE.KEY_CAP)), "t", "left_semi")
        .limit(1)
    )
    assert shared.count() == 0


def test_join_integrity_within_replicas(spark, scaled_dir):
    li = table(spark, scaled_dir, "lineitem")
    o = table(spark, scaled_dir, "orders")
    orphans = li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
    assert orphans.count() == 0


def test_embeddings_perturbed_but_same_dim(spark, scaled_dir):
    emb = table(spark, scaled_dir, "embeddings")
    base = table(spark, BASE, "embeddings")
    dims = [r["d"] for r in emb.select(F.size("embedding").alias("d")).distinct().collect()]
    base_dim = base.select(F.size("embedding").alias("d")).distinct().collect()[0]["d"]
    assert dims == [base_dim]
    # replica-1 vectors differ from their replica-0 originals
    rep1 = emb.filter(F.col("vec_id") >= SE.KEY_CAP).withColumn(
        "orig_id", F.col("vec_id") - SE.KEY_CAP
    )
    same = rep1.join(
        base.select(F.col("vec_id").alias("orig_id"), F.col("embedding").alias("be")),
        "orig_id",
    ).filter(F.col("embedding") == F.col("be"))
    assert same.count() == 0
