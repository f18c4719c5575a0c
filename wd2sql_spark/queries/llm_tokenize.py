"""Tokenizer-training battery: distributed BPE vocabulary induction.

The missing tokenization half of the text battery (llm_text counts
BPE-ish tokens with a FIXED regex; this module LEARNS the merges). The
operator lives in operators/bpe.py; here it gets a full DuckDB oracle
that replays the identical R rounds — pair counting, lexicographic
argmax, greedy non-overlapping merge — in pure SQL, so the driver
hash-checks the whole iterative computation, not just a row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wd2sql_spark.catalog import table
from wd2sql_spark.operators.bpe import bpe_merges
from wd2sql_spark.queries.registry import query

BPE_ROUNDS = 4


def _bpe_oracle(rounds: int) -> str:
    """R unrolled BPE rounds as chained CTEs.

    The greedy merge is expressed by run-alternation instead of the
    Spark side's left fold: candidate positions i where
    (syms[i], syms[i+1]) equals the argmax pair conflict only when they
    are CONSECUTIVE (which forces left == right), so taking the 1st,
    3rd, … member of each consecutive run reproduces the left-to-right
    non-overlapping pass exactly (equivalence property-tested against a
    pure-Python reference in tests/test_property_bpe.py)."""
    ctes = [
        """w0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY w) AS wid,
         CAST(cnt AS BIGINT) AS freq,
         regexp_extract_all(w, '.') AS syms
  FROM (SELECT w, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w))"""
    ]
    for r in range(rounds):
        ctes.append(
            f"""p{r} AS (
  SELECT w.syms[t.i] AS l, w.syms[t.i + 1] AS r, SUM(w.freq) AS cnt
  FROM w{r} w, UNNEST(range(1, len(w.syms))) AS t(i)
  GROUP BY 1, 2),
best{r} AS (
  SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1)"""
        )
        if r < rounds - 1:
            ctes.append(
                f"""m{r} AS (
  SELECT w.wid, w.freq, t.i, w.syms[t.i] AS s,
         CASE WHEN t.i < len(w.syms)
                   AND w.syms[t.i] = b.l AND w.syms[t.i + 1] = b.r
              THEN 1 ELSE 0 END AS hit
  FROM w{r} w CROSS JOIN best{r} b, UNNEST(range(1, len(w.syms) + 1)) AS t(i)),
h{r} AS (
  SELECT wid, i,
         ROW_NUMBER() OVER (PARTITION BY wid, grp ORDER BY i) % 2 = 1 AS taken
  FROM (SELECT wid, i, i - ROW_NUMBER() OVER (PARTITION BY wid ORDER BY i) AS grp
        FROM m{r} WHERE hit = 1) q),
w{r + 1} AS (
  SELECT m.wid, any_value(m.freq) AS freq,
         list(CASE WHEN COALESCE(h.taken, FALSE) THEN b.l || b.r ELSE m.s END
              ORDER BY m.i) AS syms
  FROM m{r} m
  CROSS JOIN best{r} b
  LEFT JOIN h{r} h ON h.wid = m.wid AND h.i = m.i
  LEFT JOIN h{r} hp ON hp.wid = m.wid AND hp.i = m.i - 1 AND hp.taken
  WHERE hp.wid IS NULL
  GROUP BY m.wid)"""
            )
    selects = "\nUNION ALL\n".join(
        f"SELECT {r + 1} AS merge_rank, l AS left_sym, r AS right_sym,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM best{r}"
        for r in range(rounds)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects + "\nORDER BY merge_rank"


BPE_ORACLE = _bpe_oracle(BPE_ROUNDS)


@query("text_bpe_vocab_merges", oracle=BPE_ORACLE, category="llm-tokenize")
def text_bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 learned BPE merges over the documents corpus — weighted
    pair counts on the distinct-word relation, deterministic
    lexicographic tie-break, greedy non-overlapping merge application
    between rounds. The corpus is touched exactly once (the word-freq
    aggregate); the loop runs on the vocabulary, which is why tokenizer
    training fits the 100 TB regime (see operators/bpe.py)."""
    d = table(spark, sf_dir, "documents")
    return bpe_merges(d, text_col="text", rounds=BPE_ROUNDS).orderBy("merge_rank")
