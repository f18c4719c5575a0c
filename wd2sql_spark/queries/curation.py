"""End-to-end training-data curation pipeline as ONE composed query:
quality-filter → exact-dedup (keep min doc per content group) →
reproducible hash split → per-(lang, split) corpus accounting.

This is the composition the individual LLM-pipeline operators exist for
(SURVEY §2-C last rows); chaining them in one DataFrame plan lets
Catalyst fuse the narrow stages — the quality filter and split
assignment are zero-shuffle, the dedup window is the single data
exchange (hash of 32-byte digests, not documents), and the final
accounting aggregate is partial+final over a tiny (lang, split) key
space. At 100 TB the pipeline is one pass over the corpus with one
digest-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.operators.dedup import normalize_text
from wd2sql_spark.queries.llm_sampling import md5_bucket
from wd2sql_spark.queries.registry import query

EVAL_PCT = 10  # hash buckets < EVAL_PCT (of 100) → eval split

CURATION_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS nt,
         round(0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                      / len(string_split(text, ' ')))
               + 0.3 * (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                             THEN 1.0 ELSE 0.0 END)
               + 0.2 * least(len(string_split(text, ' ')), 50) / 50.0, 6) AS quality
  FROM documents
),
kept AS (
  SELECT *, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
  FROM scored WHERE quality >= 0.5
),
deduped AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY content_hash) AS keep_id FROM kept
  ) WHERE doc_id = keep_id
)
SELECT lang,
       CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                 % 100 < {EVAL_PCT}
            THEN 'eval' ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens
FROM deduped
GROUP BY lang, split
ORDER BY lang, split
"""


@query("curation_pipeline_summary", oracle=CURATION_ORACLE, category="curation")
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-corpus accounting: docs surviving quality ≥ 0.5 and exact
    dedup, split train/eval by doc_id hash, counted per (lang, split)
    with their token volume."""
    d = table(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    nt = F.size(ts)
    diversity = F.size(F.array_distinct(ts)).cast("double") / nt
    len_ok = F.when(nt.between(20, 80), 1.0).otherwise(0.0)
    quality = F.round(
        0.5 * diversity + 0.3 * len_ok + 0.2 * F.least(nt, F.lit(50)) / 50.0, 6
    )
    scored = d.select("doc_id", "lang", "text", nt.alias("nt"), quality.alias("quality"))
    kept = scored.filter(F.col("quality") >= 0.5).withColumn(
        "content_hash", F.md5(normalize_text(F.col("text")))
    )
    w = Window.partitionBy("content_hash")
    deduped = kept.withColumn("keep_id", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("keep_id")
    )
    split = F.when(md5_bucket(F.col("doc_id")) < EVAL_PCT, "eval").otherwise("train")
    return (
        deduped.groupBy("lang", split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
        .orderBy("lang", "split")
    )
