"""Data-profiling + runtime-filter demonstrations.

Two operators a 100 TB curation pipeline runs constantly but that weren't
yet first-class in the battery:

- ``profile_column_stats``: a one-pass per-column corpus profile
  (row/null/distinct counts) — the validation step before any training
  run ingests a new parquet drop. The reference has no profiling surface
  (its schema is fixed, main.rs:141-161); this is north-star scope.
- ``join_bloom_prefilter_semi``: a hand-built Bloom-filter runtime
  pre-filter in pure Catalyst arithmetic — the manual form of Spark's
  AQE-injected `bloom_filter` join pruning, demonstrated explicitly so
  the plan evidence (fact rows dropped at the scan stage, BEFORE any
  exchange) is inspectable and the arithmetic is engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries._determinism import exact_sum_at
from wd2sql_spark.queries.llm_sampling import md5_bucket
from wd2sql_spark.queries.registry import query

_PROFILE_COLS = ("doc_id", "lang", "n_chars", "source", "text")

PROFILE_ORACLE = """
WITH s AS (
  SELECT count(*) AS n_rows,
         {stats}
  FROM documents
)
SELECT col_name, n_rows, n_null, n_distinct FROM (
  {branches}
) t
ORDER BY col_name
""".format(
    stats=",\n         ".join(
        f"count({c}) AS nn_{c}, "
        f"COUNT(DISTINCT md5(CAST({c} AS VARCHAR))) AS nd_{c}"
        for c in _PROFILE_COLS
    ),
    branches="\n  UNION ALL\n  ".join(
        f"SELECT '{c}' AS col_name, n_rows, n_rows - nn_{c} AS n_null, "
        f"nd_{c} AS n_distinct FROM s"
        for c in _PROFILE_COLS
    ),
)


@query("profile_column_stats", oracle=PROFILE_ORACLE, category="profiling")
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of `documents` in ONE aggregation pass: row
    count, null count (count(*) − count(col), both engines' COUNT skips
    NULLs identically), and exact distinct count — counted over
    ``md5(cast(col as string))`` so the distinct shuffle carries 32-byte
    digests, never document text (the same shuffle-digests-not-text rule
    as exact dedup; md5 is bit-identical in both engines so the oracle
    can mirror it textually).

    Plan shape: Spark rewrites the multi-column DISTINCT into one
    Expand(×5 columns) + two-level hash aggregate — a single pass over
    the scan with data replicated once per profiled column. That exact
    form is the right default up to tens of columns; at 100 TB with wide
    schemas, swap `count_distinct` for `approx_count_distinct` per
    column: the Expand disappears into mergeable HLL sketches with no
    replication (the battery verifies that operator separately in
    `agg_approx_count_distinct` — kept exact HERE so the driver hash is
    engine-portable). The single output row is then unpivoted by a
    zero-shuffle `stack`.
    """
    d = table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(F.col(c))).alias(f"nn_{c}"))
        aggs.append(
            F.count_distinct(F.md5(F.col(c).cast("string"))).alias(f"nd_{c}")
        )
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return (
        one.select(
            "n_rows",
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) "
                "AS (col_name, n_null, n_distinct)"
            ),
        )
        .select("col_name", "n_rows", "n_null", "n_distinct")
        .orderBy("col_name")
    )


_BLOOM_BITS = 4096  # m: 64 longs — tiny vs the 430-key exact set it stands in for
_BLOOM_PROBES = 3  # k: fill ~27% at 430 keys -> FP ~2%


def _bloom_positions(key, probes: int = _BLOOM_PROBES, bits: int = _BLOOM_BITS):
    """k salted md5 bit positions for `key` — same arithmetic as
    md5_bucket, salted per probe so the probes are independent."""
    return [
        md5_bucket(F.concat(key.cast("string"), F.lit(f":{j}")), bits)
        for j in range(probes)
    ]


def _one_shifted(pos):
    """``1L << (pos % 64)`` with a per-row shift amount — routed through
    call_function because the PySpark ``shiftleft`` wrapper only accepts a
    Python int for the shift."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


BLOOM_SEMI_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       ((2 * SUM(CAST(round(o_totalprice * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal >= 7000.0)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("join_bloom_prefilter_semi", oracle=BLOOM_SEMI_ORACLE, category="joins")
def join_bloom_prefilter_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit Bloom-filter runtime pre-filter on the
    fact side — the manual, engine-portable form of Spark's AQE
    `bloom_filter` join pruning (spark.sql.optimizer.runtime.bloomFilter).

    Why it matters at 100 TB: when the filtered dim exceeds the broadcast
    threshold, the exact semi-join becomes a shuffle join and EVERY fact
    row pays the exchange. An m-bit Bloom filter of the dim keys (m ≪
    |keys|·8 bytes — here 512 bytes standing in for the key set) still
    fits in a literal/broadcast, so fact rows are dropped at the scan
    stage and shuffle volume falls to ~the true selectivity. False
    positives (~2% here) only cost wasted shuffle rows; the exact
    semi-join behind the filter removes them, so the RESULT is identical
    to the plain semi-join — which is exactly what the oracle asserts
    (no bloom arithmetic in the SQL; correctness is structural, false
    negatives are impossible).

    The k·|dim| bit-position build is one tiny aggregation (64 rows);
    collecting those 64 longs to a literal follows the inlined-IVF-
    codebook precedent (operators/similarity.py:174 — deliberate,
    documented, constant-size).
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 7000.0)
    dim_keys = c.select(F.col("c_custkey").alias("k"))

    words_rows = (
        dim_keys.select(
            F.explode(F.array(*_bloom_positions(F.col("k")))).alias("pos")
        )
        .groupBy((F.col("pos") / 64).cast("int").alias("w"))
        .agg(F.bit_or(_one_shifted(F.col("pos"))).alias("bits"))
        .collect()
    )
    words = [0] * (_BLOOM_BITS // 64)
    for r in words_rows:
        words[r["w"]] = r["bits"]
    words_lit = F.array(*[F.lit(w).cast("long") for w in words])

    o = table(spark, sf_dir, "orders")
    tests = []
    for pos in _bloom_positions(F.col("o_custkey")):
        word = F.element_at(words_lit, ((pos / 64).cast("int") + 1))
        tests.append(word.bitwiseAND(_one_shifted(pos)) != 0)
    prefiltered = o.filter(tests[0] & tests[1] & tests[2])

    return (
        prefiltered.join(
            dim_keys, prefiltered["o_custkey"] == dim_keys["k"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum_at(F.col("o_totalprice"), 6, 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )
