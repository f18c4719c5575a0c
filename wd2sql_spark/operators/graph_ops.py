"""Reusable graph kernels: triangle enumeration and integer PageRank.

Factored out of queries/graph_analytics.py so the algorithms can be
unit-tested on hand-checkable graphs (K4, paths, cycles) independent of
the fixture projections; the registered queries compose these with the
supplier/customer graph builders. The reference has no graph surface
(single-pass ETL, main.rs:174-238 in /root/reference).

Both kernels follow the repo determinism playbook: all decisions on exact
integers, truncating division via ``div`` on non-negative longs (agrees
with DuckDB ``//``), no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangles(und: DataFrame) -> DataFrame:
    """Enumerate each triangle of an undirected simple graph exactly once.

    ``und`` must hold one row per undirected edge with ``a < b`` (lower
    endpoint first, no duplicates) — the normalized form the callers
    build with least/greatest + distinct. Enumeration is the textbook
    node-order form: e1=(a,b), e2=(b,c) forces a<b<c, and the third join
    checks the closing edge (a,c). Returns (ta, tb, tc) with
    ta < tb < tc.

    Scale note: join fanout concentrates on high-degree nodes; at corpus
    scale the hardening is degree orientation (point edges at the
    higher-degree endpoint, bounding fanout by sqrt(|E|)) — the callers'
    kNN graphs bound out-degree by construction instead."""
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    return (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(
            F.col("e1.a").alias("ta"), F.col("e1.b").alias("tb"), F.col("e2.b").alias("tc")
        )
    )


def pagerank_ranks(
    edges: DataFrame,
    iters: int = 3,
    r0: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-depth PageRank in exact integer rank units.

    ``edges`` holds directed (src, dst) rows; every node that should
    receive rank must have at least one out-edge (the callers build
    symmetric graphs, so no dangling-mass correction is needed; a dangling
    node would simply stop contributing). Returns (node, r) after
    ``iters`` damped updates:

        r'(n) = ((damp_den−damp_num)·r0 + damp_num·Σ_{s→n} r(s) div d(s))
                div damp_den

    All operands stay non-negative longs, so Spark's truncating ``div``
    matches DuckDB's floor ``//`` and both engines produce identical
    ranks at every depth.

    Plan: the edge list and degree relation materialize once (callers
    persist ``edges``; ``deg`` is persisted here — it joins into every
    iteration); each unrolled iteration is one |V|-sized join + one hash
    aggregate, a static dataflow with no driver loop."""
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .withColumnRenamed("src", "node")
        .persist()
    )
    ranks = deg.select("node", F.lit(r0).cast("long").alias("r"))
    base = (damp_den - damp_num) * r0
    for _ in range(iters):
        contrib = ranks.join(deg, "node").select(
            "node", F.call_function("div", F.col("r"), F.col("d")).alias("cr")
        )
        ranks = (
            edges.join(contrib, edges["src"] == contrib["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.call_function(
                    "div",
                    F.lit(base) + F.lit(damp_num) * F.sum("cr"),
                    F.lit(damp_den),
                ).alias("r")
            )
        )
    return ranks
