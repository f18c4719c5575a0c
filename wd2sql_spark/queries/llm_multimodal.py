"""Multimodal battery: BINARY-column pipelines through Arrow/mapInPandas.

The decode layer is a deterministic stub (no image libs in the container —
see operators/multimodal.py), which is exactly what makes these queries
oracle-able: the fake codec's arithmetic is reproduced in SQL, so the
driver hash-verifies that the Arrow batch plumbing (schemas, 1→1 and 1→N
stages, int truncation semantics) is lossless end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.operators import multimodal as M
from wd2sql_spark.queries.registry import query

DECODE_ORACLE = """
WITH b AS (SELECT doc_id, strlen(text) AS n FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n AS BIGINT)                 AS n_bytes,
       CAST(64 + n % 577 AS BIGINT)      AS width,
       CAST(64 + (n * 31) % 353 AS BIGINT) AS height,
       CAST(3 AS BIGINT)                 AS channels,
       'fake/raw'                        AS format
FROM b
ORDER BY doc_id
"""


@query("multimodal_decode_stats", oracle=DECODE_ORACLE, category="llm-multimodal")
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text→BINARY synth + Arrow-batched mapInPandas decode (stubbed codec)
    → typed metadata. The oracle replays the stub's arithmetic on
    octet_length, proving the binary payload and batch plumbing are
    byte-exact."""
    docs = table(spark, sf_dir, "documents")
    return M.decode_images(M.synthesize_blobs(docs)).orderBy("doc_id")


THUMB_ORACLE = """
WITH b AS (SELECT doc_id, strlen(text) AS n FROM documents),
d AS (SELECT doc_id, 64 + n % 577 AS w, 64 + (n * 31) % 353 AS h FROM b),
s AS (SELECT doc_id, w, h, least(128.0 / greatest(w, h), 1.0) AS scale FROM d)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(floor(w * scale) AS BIGINT) AS thumb_width,
       CAST(floor(h * scale) AS BIGINT) AS thumb_height,
       CAST(scale AS DOUBLE) AS scale
FROM s
ORDER BY doc_id
"""


@query("multimodal_resize_thumbs", oracle=THUMB_ORACLE, category="llm-multimodal")
def multimodal_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained Arrow stages (decode → resize geometry). floor() in the
    oracle matches pandas' int64 truncation."""
    docs = table(spark, sf_dir, "documents")
    return M.resize_thumbnails(M.decode_images(M.synthesize_blobs(docs)), max_side=128).orderBy(
        "doc_id"
    )


FRAMES_ORACLE = """
WITH b AS (SELECT doc_id, strlen(text) AS n FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(f.f AS BIGINT) AS frame_no,
       CAST(f.f * 1024 AS BIGINT) AS "offset"
FROM b, unnest(range(0, greatest(n // 1024 + 1, 1))) f(f)
ORDER BY doc_id, frame_no
"""


@query("multimodal_frame_sample", oracle=FRAMES_ORACLE, category="llm-multimodal")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N Arrow stage (video frame sampling shape): one output row per
    sampled frame — the case where mapInPandas is mandatory (scalar UDFs
    are 1→1)."""
    docs = table(spark, sf_dir, "documents")
    return M.frame_sample(M.synthesize_blobs(docs), every_n_bytes=1024).orderBy(
        "doc_id", "frame_no"
    )
