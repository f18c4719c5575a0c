"""Distributed batch model inference: the Arrow-batched map shape every
LLM data pipeline runs for scoring/classification/embedding generation.

The "model" is a deterministic STUB (no ML runtime in this container) —
a rational linear scorer over integer text features — which is exactly
what makes the query oracle-able: the features and the score arithmetic
are reproduced in SQL, so the driver hash-verifies the Arrow inference
plumbing (batch iteration, schema contract, per-row alignment)
end-to-end. Swap ``fake_model`` for an ONNX/torch session held per
worker (initialize it once OUTSIDE the batch loop, exactly where the
closure creates it here) and the pipeline is production-shaped.

Scale notes: mapInPandas streams Arrow batches of
``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (10k default), so
executor memory is bounded by batch_size × row width — not partition
size — and the model forward pass amortizes per batch, not per row. The
stage is a pure 1→1 map: no shuffle, embarrassingly parallel, linear in
corpus size; at 100 TB the only knobs are partition count (≥ total
cores) and batch size (GPU/memory bound).

Determinism: the stub emits INTEGER logits (num, den) and the display
score is rounded half-up in integer arithmetic — ``(2·num·10⁶ + den)
div (2·den) / 10⁶`` — because ``round(num/den, 6)`` on a float quotient
can land exactly on a 6-decimal half boundary (e.g. den = 128 gives
7-place decimals ending in 5), the cross-engine flip class documented
in _determinism.py. The keep/drop decision ``2·num > den`` is likewise
an integer compare.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries.registry import query

if TYPE_CHECKING:
    import pandas as pd

INFER_SCHEMA = (
    "doc_id bigint, n_tokens bigint, n_chars bigint, num bigint, den bigint, label string"
)

INFER_ORACLE = """
WITH feats AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         length(text) AS n_chars
  FROM documents),
scored AS (
  SELECT doc_id, n_tokens, n_chars,
         3 * n_tokens + 7 * (n_chars % 97) AS num,
         n_chars + 13 AS den
  FROM feats)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       ((2 * num * 1000000 + den) // (2 * den)) / 1000000.0 AS score,
       CASE WHEN 2 * num > den THEN 'keep' ELSE 'drop' END AS label
FROM scored
ORDER BY doc_id
"""


def batch_inference(docs: DataFrame) -> DataFrame:
    """Arrow-batched inference stage. The model closure is created inside
    the function so cloudpickle ships it by value (no wd2sql_spark import
    needed on Python workers) — a real model session would be opened in
    the same place, once per task, then reused across batches."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def fake_model(text: str) -> tuple[int, int, int, int, str]:
            """STUB model — deterministic rational scorer. A real impl:
                session = onnxruntime.InferenceSession(...)   # per task
                probs = session.run(batch)                    # per batch
            Features mirror the SQL twin: tokens = single-space split
            with empties dropped; chars = code points."""
            toks = [t for t in text.split(" ") if t]
            n_tokens, n_chars = len(toks), len(text)
            num = 3 * n_tokens + 7 * (n_chars % 97)
            den = n_chars + 13
            return n_tokens, n_chars, num, den, "keep" if 2 * num > den else "drop"

        for pdf in it:
            out = [fake_model(t) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_tokens": [o[0] for o in out],
                    "n_chars": [o[1] for o in out],
                    "num": [o[2] for o in out],
                    "den": [o[3] for o in out],
                    "label": [o[4] for o in out],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(batches, schema=INFER_SCHEMA)


@query("inference_batch_scores", oracle=INFER_ORACLE, category="llm-inference")
def inference_batch_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference over the corpus: one Arrow-batched 1→1 map,
    no shuffle, linear in corpus size (see module docstring). The display
    score is rounded half-up in INTEGER arithmetic from the stub's
    integer logits, and the keep/drop decision is an integer comparison
    — neither can sit on a float rounding boundary."""
    scored = batch_inference(table(spark, sf_dir, "documents"))
    rounded = F.call_function(
        "div",
        F.lit(2) * F.col("num") * F.lit(1_000_000) + F.col("den"),
        F.lit(2) * F.col("den"),
    ) / F.lit(1_000_000.0)
    return scored.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        rounded.alias("score"),
        "label",
    ).orderBy("doc_id")
