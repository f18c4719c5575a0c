"""Context-window preparation operators: document chunking (RAG/embedding
prep) and sequence packing (training-batch prep) over the ``documents``
fixture.

Nothing like this exists in the reference (its surface is the wikidata ETL
+ lookup queries, README.md:103-157 in /root/reference); these are the
last-mile steps a training-data pipeline runs between curation and the
trainer/embedder:

- **Chunking** splits each document into fixed-size overlapping windows —
  the retrieval/embedding prep step. Expressed as ``sequence`` →
  ``posexplode`` → ``substring``: a generator inside whole-stage codegen,
  NARROW (zero shuffles — output partitioning inherits the scan), so at
  100 TB it scales with the scan exactly like a projection.
- **Packing** concatenates documents head-to-tail and slices the stream
  into fixed token windows ("concat-and-chunk", the standard pretraining
  batch-prep). A single GLOBAL stream is driver-bottlenecked (one running
  sum over everything), so the operator packs PER SHARD: documents land in
  a deterministic md5 shard, each shard packs its own stream with a
  running-sum window, and the only exchange is the one hash partition by
  shard — embarrassingly parallel at any scale, at the cost of per-shard
  (not global) bin boundaries, which is exactly what production packers do
  (each worker packs its own file split). All bin arithmetic is integer
  (offsets, ``div``), so the stats hash-match the DuckDB twin exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries._determinism import _int_div
from wd2sql_spark.queries.llm_sampling import md5_bucket
from wd2sql_spark.queries.registry import query

CHUNK = 200  # chars per chunk
STRIDE = 150  # chunk start step → 50-char overlap
CONTEXT = 256  # tokens per packed context window
SHARDS = 16  # independent packing streams

CHUNK_ORACLE = f"""
SELECT doc_id,
       CAST(i // {STRIDE} AS BIGINT) AS chunk_idx,
       CAST(i AS BIGINT) AS chunk_start,
       CAST(length(substring(text, CAST(i AS INT) + 1, {CHUNK})) AS BIGINT) AS chunk_len,
       md5(substring(text, CAST(i AS INT) + 1, {CHUNK})) AS chunk_md5
FROM (SELECT doc_id, text, unnest(range(0, n_chars, {STRIDE})) AS i
      FROM documents WHERE n_chars > 0) t
ORDER BY doc_id, chunk_idx
"""


@query("chunk_docs_overlap", oracle=CHUNK_ORACLE, category="llm-packing")
def chunk_docs_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking with overlap: every document yields chunks of
    up to CHUNK chars starting at multiples of STRIDE (so consecutive
    chunks share CHUNK−STRIDE chars — the overlap that keeps a retrieval
    hit from being split across a boundary). Emits (doc_id, chunk_idx,
    start, len, md5-of-chunk); the md5 makes the driver hash cover the
    chunk CONTENT, not just its geometry.

    ``sequence(0, n_chars−1, STRIDE)`` materializes the start offsets,
    ``posexplode`` fans them out inside codegen, ``substring`` slices —
    a narrow plan with zero exchanges (the ORDER BY is the driver-contract
    presentation sort, not part of the operator)."""
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    starts = F.sequence(F.lit(0), (F.col("n_chars") - 1).cast("int"), F.lit(STRIDE))
    chunk = F.substring(F.col("text"), F.col("chunk_start") + 1, F.lit(CHUNK))
    return (
        d.select("doc_id", "text", F.posexplode(starts).alias("chunk_idx", "chunk_start"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint"),
            F.col("chunk_start").cast("bigint"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT shard, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS off
  FROM t
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX((off + n_tokens - 1) // {CONTEXT}) + 1 AS BIGINT) AS n_bins,
       CAST(SUM(CASE WHEN (off + n_tokens - 1) // {CONTEXT} > off // {CONTEXT}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
       round(CAST(SUM(n_tokens) AS DOUBLE)
             / ((MAX((off + n_tokens - 1) // {CONTEXT}) + 1) * {CONTEXT}), 6) AS utilization
FROM o GROUP BY shard ORDER BY shard
"""


@query("pack_sequences_bins", oracle=PACK_ORACLE, category="llm-packing")
def pack_sequences_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing accounting: per md5 shard,
    documents are laid head-to-tail in doc_id order and the token stream
    is cut into CONTEXT-token windows. Reports, per shard, how many
    windows the stream fills, how many documents straddle a window
    boundary (the split-doc cost of naive packing vs. doc-boundary-aware
    variants), and the fill ratio of the window budget.

    Plan: ONE exchange (hash by shard for the running-sum window); the
    per-shard aggregate reuses that partitioning. Offsets and bin ids are
    exact integers (`div`), so both engines take identical branches —
    only the final utilization ratio is a (rounded) double."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        md5_bucket(F.col("doc_id"), SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = d.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    end_bin = _int_div(F.col("off") + F.col("n_tokens") - 1, F.lit(CONTEXT))
    start_bin = _int_div(F.col("off"), F.lit(CONTEXT))
    return (
        o.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (F.max(end_bin) + 1).cast("bigint").alias("n_bins"),
            F.sum((end_bin > start_bin).cast("int")).cast("bigint").alias("n_split_docs"),
            F.round(
                F.sum("n_tokens").cast("double") / ((F.max(end_bin) + 1) * CONTEXT), 6
            ).alias("utilization"),
        )
        .select(F.col("shard").cast("bigint"), "n_docs", "total_tokens", "n_bins",
                "n_split_docs", "utilization")
        .orderBy("shard")
    )
