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


# Benchmark split for the decontamination stage (doc_id mod — the same
# deterministic split llm_decontam uses; distinct from the train/eval
# HASH split below, which partitions the surviving corpus).
_BENCH_MOD = 23
_CONTAM_DROP = 0.5
_DECONTAM_N = 5

_SHINGLES5 = """
tok AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ts
  FROM kept
),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest([array_to_string(list_slice(ts, i, i+4), ' ')
                   FOR i IN range(1, greatest(len(ts)-4, 0)+1)]) AS shingle
    FROM tok)
),
evtok AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ts
  FROM documents WHERE doc_id % 23 = 0
),
ev AS (
  SELECT DISTINCT shingle
  FROM (
    SELECT unnest([array_to_string(list_slice(ts, i, i+4), ' ')
                   FOR i IN range(1, greatest(len(ts)-4, 0)+1)]) AS shingle
    FROM evtok)
),
contam AS (
  SELECT c.doc_id,
         CAST(COUNT(e.shingle) AS DOUBLE) / COUNT(*) AS ratio
  FROM sh c LEFT JOIN ev e ON c.shingle = e.shingle
  GROUP BY c.doc_id
)
"""

CURATION_DECONTAM_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS nt,
         round(0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                      / len(string_split(text, ' ')))
               + 0.3 * (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                             THEN 1.0 ELSE 0.0 END)
               + 0.2 * least(len(string_split(text, ' ')), 50) / 50.0, 6) AS quality
  FROM documents
  WHERE doc_id % {_BENCH_MOD} <> 0
),
kept AS (
  SELECT *, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
  FROM scored WHERE quality >= 0.5
),
{_SHINGLES5},
clean AS (
  SELECT k.* FROM kept k
  LEFT JOIN contam c ON k.doc_id = c.doc_id
  WHERE COALESCE(c.ratio, 0) < {_CONTAM_DROP}
),
deduped AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY content_hash) AS keep_id FROM clean
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


@query(
    "curation_pipeline_decontam", oracle=CURATION_DECONTAM_ORACLE, category="curation"
)
def curation_pipeline_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline WITH a decontamination stage:
    quality-filter → drop docs whose 5-gram overlap with the held-out
    benchmark split (doc_id % 23 == 0) reaches the drop threshold →
    exact-dedup → reproducible hash split → per-(lang, split) accounting.

    The added stage costs one broadcast (the benchmark shingle set), one
    per-doc aggregate over the kept corpus's shingle explode, and one
    doc_id join back onto the kept relation — quality filtering runs
    FIRST so the shingle explode only tokenizes survivors. Docs too short
    to shingle have no overlap row and are kept (COALESCE 0). Everything
    else is the same one-pass shape as curation_pipeline_summary."""
    from wd2sql_spark.operators.dedup import doc_shingles

    d = table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    corpus = d.filter(F.col("doc_id") % _BENCH_MOD != 0)

    ts = F.split(F.col("text"), " ")
    nt = F.size(ts)
    diversity = F.size(F.array_distinct(ts)).cast("double") / nt
    len_ok = F.when(nt.between(20, 80), 1.0).otherwise(0.0)
    quality = F.round(
        0.5 * diversity + 0.3 * len_ok + 0.2 * F.least(nt, F.lit(50)) / 50.0, 6
    )
    kept = (
        corpus.select("doc_id", "lang", "text", nt.alias("nt"), quality.alias("quality"))
        .filter(F.col("quality") >= 0.5)
        .withColumn("content_hash", F.md5(normalize_text(F.col("text"))))
    )

    ev = (
        doc_shingles(bench, n=_DECONTAM_N)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    contam = (
        doc_shingles(kept, n=_DECONTAM_N)
        .join(F.broadcast(ev), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            (F.count("_hit").cast("double") / F.count(F.lit(1))).alias("ratio")
        )
    )
    clean = kept.join(contam, "doc_id", "left").filter(
        F.coalesce(F.col("ratio"), F.lit(0.0)) < _CONTAM_DROP
    )

    w = Window.partitionBy("content_hash")
    deduped = clean.withColumn("keep_id", F.min("doc_id").over(w)).filter(
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
