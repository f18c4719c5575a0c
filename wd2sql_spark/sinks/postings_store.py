"""Materialized positional inverted index: postings as a parquet store.

``retrieval_phrase_match`` computes its positional index inline (fine
for one query); a serving deployment builds the index ONCE and prunes at
read time. This sink writes the postings relation
(operators/postings.py::build_postings) partitioned by
``bucket = md5(term) % n_buckets`` and range-sorted by ``term`` within
files, so a phrase query:

- prunes the SCAN to the ≤|phrase| bucket partitions its terms hash to
  (directory-level partition filters — at 64 buckets a 3-term phrase
  reads ≤ 3/64 of the store), and
- skips non-matching ``term`` ranges inside each bucket via parquet
  min/max row-group statistics.

Serving is bit-identical to the in-memory path on the same corpus
(pinned by tests/test_postings_store.py), holds no session state, and
survives executor loss — the lsh_store/ivf_store pattern applied to the
retrieval family. Admission is an APPEND of the delta's postings only
(per-(term, doc) rows are disjoint across disjoint doc sets, so
store+append ≡ full rebuild over the union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.operators.postings import (
    build_postings,
    phrase_occurrences,
    term_bucket,
)

N_BUCKETS = 64


def _layout(postings: DataFrame) -> DataFrame:
    """Range-spread on (bucket, term): full write parallelism with tight
    per-file term ranges for row-group skipping (the lsh_store layout)."""
    n = postings.sparkSession.sparkContext.defaultParallelism
    return postings.repartitionByRange(n, "bucket", "term").sortWithinPartitions(
        "bucket", "term"
    )


def write_postings_store(docs: DataFrame, path: str, buckets: int = N_BUCKETS) -> None:
    """Build the positional index from ``docs`` (one posexplode + one
    (term, doc) exchange) and write it partitioned by term bucket."""
    _layout(build_postings(docs, buckets)).write.partitionBy("bucket").parquet(
        f"{path}/postings"
    )


def append_to_postings_store(
    delta_docs: DataFrame, path: str, buckets: int = N_BUCKETS
) -> None:
    """Admit new documents: index the DELTA ONLY and append — postings
    rows are per (term, doc_id), so disjoint doc sets append cleanly and
    store+append equals a full rebuild over the union."""
    _layout(build_postings(delta_docs, buckets)).write.mode("append").partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")


def read_postings_store(
    spark: SparkSession, path: str, terms: list[str] | None = None, buckets: int = N_BUCKETS
) -> DataFrame:
    """The store as the postings relation; with ``terms`` given, the scan
    carries bucket partition filters (directory pruning) + a term filter
    (row-group skipping via the within-file term sort).

    Heals an interrupted compaction swap on open (ADVICE r4 #4; see
    read_lsh_store)."""
    from wd2sql_spark.sinks.compact import recover_dataset

    recover_dataset(f"{path}/postings")
    rel = spark.read.parquet(f"{path}/postings")
    if terms is not None:
        bks = sorted({term_bucket(t, buckets) for t in terms})
        rel = rel.filter(F.col("bucket").isin(bks) & F.col("term").isin(terms))
    return rel.select("term", "doc_id", "positions", "bucket")


def phrase_from_store(
    spark: SparkSession, path: str, phrase: str, buckets: int = N_BUCKETS
) -> DataFrame:
    """(doc_id, n_occurrences, first_pos) of an exact 3-token phrase,
    served from the store: the scan reads only the phrase's bucket
    partitions, positions re-explode to the (doc_id, p, term) legs, and
    the adjacency join is the same operator the inline query uses."""
    t0, t1, t2 = phrase.split(" ")
    rel = read_postings_store(spark, path, [t0, t1, t2], buckets)
    pos = rel.select("doc_id", F.explode("positions").alias("p"), "term")
    leg0 = pos.filter(F.col("term") == t0)
    rest = pos.filter(F.col("term").isin([t1, t2]))
    occ = phrase_occurrences(leg0, rest, F.lit(t1), F.lit(t2))
    return occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.min("p").cast("bigint").alias("first_pos"),
    )


def compact_postings_store(spark: SparkSession, path: str) -> None:
    """Periodic maintenance after many admission appends: rewrite the
    postings dataset through the canonical layout (range-spread +
    within-file term sort) and swap atomically — small per-append files
    collapse and per-file term ranges tighten, restoring row-group
    skipping. Content is bit-identical (tests/test_postings_store.py)."""
    from wd2sql_spark.sinks.compact import compact_dataset

    compact_dataset(spark, f"{path}/postings", _layout, ["bucket"])
