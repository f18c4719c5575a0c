"""Distributed BPE-style vocabulary induction (pair-merge learning).

The tokenizer-training primitive of an LLM data pipeline: learn the
first R byte-pair-encoding merges from a corpus (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) entirely as Spark dataflow.

Scale design — the reason this is corpus-size-safe at 100 TB:

- The loop body never touches the corpus: round 0 collapses the corpus
  to the DISTINCT-WORD relation (word, freq) with one map-side-combined
  aggregate. Natural-language vocabulary is sublinear in corpus size
  (Heaps' law), so every later round scans a relation orders of
  magnitude smaller than the text it summarizes — the same trick the
  original BPE implementation uses in one process.
- Per round: one map-side-combinable pair-count aggregate over the
  vocab relation, a 1-row TakeOrdered for the argmax pair, and a
  row-local merge rewrite under a broadcast of that single row. No
  driver-side data path at all — the argmax is joined back by
  broadcast, never ``collect()``ed.
- ``localCheckpoint`` truncates per-round lineage. Without it the plan
  DOUBLES per round (round r references round r-1 once through the
  vocab relation and once through the argmax), which is the classic
  iterative-algorithm failure on Spark — exponential logical plans,
  not data volume.

Greedy merge semantics match the reference algorithm: one left-to-right
pass, non-overlapping, so ``aaaa`` under merge (a,a) becomes
``[aa, aa]`` and ``aaa`` becomes ``[aa, a]``. The left-fold used here
is equivalent to the run-alternation formulation in the DuckDB oracle
(overlapping candidate positions only arise when left == right, and
both take the 1st, 3rd, … of each run); the property test drives both
against a pure-Python reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_fold(syms: Column, left: Column, right: Column) -> Column:
    """One greedy left-to-right merge pass: rewrite ``syms`` replacing
    each non-overlapping adjacent (left, right) with left||right. The
    fold compares the accumulator's LAST element, so a symbol produced
    by a merge this round can never re-merge (left||right == left would
    need an empty right)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == left) & (x == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(syms: array<string>, freq) — the distinct-word relation with each
    word split into single-character symbols. The ONLY corpus-sized job
    in BPE training; everything after runs on the vocabulary."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.regexp_extract_all(F.col("w"), F.lit("."), 0).alias("syms"), "freq")
    )


def bpe_vocab_encoded(docs: DataFrame, text_col: str = "text", rounds: int = 4) -> DataFrame:
    """ENCODE side of BPE: the distinct-word vocabulary with the first
    ``rounds`` learned merges APPLIED — (w, syms) where ``syms`` is the
    word's final subword sequence.

    Learning and application fused in one loop over the vocab relation:
    round r counts pairs, picks the argmax merge, and rewrites every
    vocab word in place (the learning loop skips the last rewrite because
    it only reports the merge table; encoding needs it). Joining a
    corpus' (doc_id, word) relation to this output tokenizes the corpus
    without ever running the merge loop on corpus-sized data — the same
    Heaps'-law separation as :func:`bpe_merges`, which is why a 100 TB
    tokenization pass is one join, not an iterative job. On a degenerate
    corpus with fewer distinct pairs than ``rounds`` the argmax relation
    goes empty and empties the vocab (same contract as bpe_merges)."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("w", F.regexp_extract_all(F.col("w"), F.lit("."), 0).alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    heads = lambda s: F.slice(s, 1, F.size(s) - 1)  # noqa: E731
    tails = lambda s: F.slice(s, 2, F.size(s) - 1)  # noqa: E731
    for _ in range(rounds):
        pc = (
            words.select(
                F.explode(
                    F.zip_with(
                        heads(F.col("syms")),
                        tails(F.col("syms")),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pc.orderBy(F.col("cnt").desc(), "l", "r").limit(1)
        b = F.broadcast(best.select(F.col("l").alias("bl"), F.col("r").alias("br")))
        words = (
            words.crossJoin(b)
            .select(
                "w",
                _merge_fold(F.col("syms"), F.col("bl"), F.col("br")).alias("syms"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )
    return words.select("w", "syms")


def bpe_merges(docs: DataFrame, text_col: str = "text", rounds: int = 4) -> DataFrame:
    """Learn the first ``rounds`` BPE merges from ``docs[text_col]``.

    Returns (merge_rank, left_sym, right_sym, pair_count): the pair
    chosen at each round (highest weighted count, ties broken
    lexicographically — the deterministic twin of the reference
    algorithm's arbitrary tie) and its count at selection time. On a
    corpus with fewer than ``rounds`` distinct pairs the result simply
    has fewer rows (an empty argmax relation empties every later
    round)."""
    words = word_freqs(docs, text_col).localCheckpoint(eager=True)
    heads = lambda s: F.slice(s, 1, F.size(s) - 1)  # noqa: E731
    tails = lambda s: F.slice(s, 2, F.size(s) - 1)  # noqa: E731
    merges: list[DataFrame] = []
    for r in range(rounds):
        pc = (
            words.select(
                F.explode(
                    F.zip_with(
                        heads(F.col("syms")),
                        tails(F.col("syms")),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        # best stays LAZY: it is a 1-row TakeOrdered over the CHECKPOINTED
        # vocab relation, so re-evaluating it (once inside the next
        # round's checkpoint job, once in the final merge-table job) costs
        # two vocab-sized aggregates but zero extra Spark jobs — at toy
        # scale the per-job overhead of an eager checkpoint dominates, and
        # at cluster scale the vocab aggregate is noise next to the
        # corpus scan. Lineage stays constant either way.
        best = pc.orderBy(F.col("cnt").desc(), "l", "r").limit(1)
        merges.append(
            best.select(
                F.lit(r + 1).alias("merge_rank"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
        )
        if r < rounds - 1:
            b = F.broadcast(best.select(F.col("l").alias("bl"), F.col("r").alias("br")))
            words = (
                words.crossJoin(b)
                .select(
                    _merge_fold(F.col("syms"), F.col("bl"), F.col("br")).alias("syms"),
                    "freq",
                )
                .localCheckpoint(eager=True)
            )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out
