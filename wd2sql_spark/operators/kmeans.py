"""Integer-exact Lloyd iterations — the shared k-means kernel.

One definition of quantize / assign / update, used by BOTH the k-means
battery query (queries/llm_cluster.py) and ANN codebook training
(operators/similarity.collect_centroids and pq_codebook — VERDICT r4
task #2), so the two cannot drift. The determinism playbook (see llm_cluster's module
docstring for the full argument): components quantize to exact integers,
distances are integer folds, the centroid update is a half-up integer
division over a non-negative domain (Spark ``div`` truncates toward
zero, DuckDB ``//`` floors — they agree only for non-negative operands,
hence the OFFSET), and argmins tie-break to the lowest cid. Both engines
take bit-identical branches at every step, so a DuckDB oracle can
re-derive the trained result exactly.

Scale shape: assignment is ROW-LOCAL (the k centroids travel as one
broadcast row of (cid, vector) structs; each vector folds its distance
to all k inline — no join, no shuffle); each update is one (cid, dim)
hash aggregate with map-side partials plus a k-row collect_list. An
iteration costs O(1) shuffles regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
# Components live in ~[-0.6, 0.6]; the offset makes every quantized value
# positive so the half-up integer division needs no sign handling.
# Distances are invariant to a common offset.
OFFSET = 1_000_000


def iv_quantize(col: Column) -> Column:
    """array<long> quantized components: round(x·10⁶) + OFFSET."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * SCALE, 0).cast("long") + OFFSET
    )


def sqdist_int(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² as an exact integer fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def assign_int(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, iv) × centroids(cid, c) → (vec_id, iv, cid, dist).

    The centroid relation collapses to ONE row carrying a sorted array of
    structs, broadcast onto the corpus; per-vector argmin is ``array_min``
    over (dist, cid) structs — lexicographic min = smallest distance,
    ties to the lowest cid, matching a SQL twin's ``ORDER BY dist, cid``
    rank."""
    cent_row = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("cents")
    )
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            sqdist_int(F.col("iv"), c["c"]).alias("dist"), c["cid"].alias("cid")
        ),
    )
    amin = F.array_min(scored)
    return vecs.crossJoin(F.broadcast(cent_row)).select(
        "vec_id", "iv", amin["cid"].alias("cid"), amin["dist"].alias("dist")
    )


def update_int(assigned: DataFrame) -> DataFrame:
    """Per-cluster centroid: half-up rounded per-dim mean, entirely in
    integer arithmetic — c = (2·Σv + n) div (2·n), exact and identical in
    both engines for the non-negative quantized values."""
    dims = assigned.select("cid", F.posexplode("iv").alias("dim", "v"))
    per = dims.groupBy("cid", "dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    c = F.call_function(
        "div", F.lit(2) * F.col("s") + F.col("n"), F.lit(2) * F.col("n")
    )
    return (
        per.select("cid", "dim", c.alias("c"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda t: t["c"]
            ).alias("c")
        )
    )


def lloyd_centroids(
    vecs: DataFrame, seeds: DataFrame, iters: int
) -> DataFrame:
    """``iters`` unrolled Lloyd rounds from ``seeds(cid, c)`` over
    ``vecs(vec_id, iv)`` → the final integer centroid relation (cid, c).

    An emptied cluster KEEPS its previous centroid (LEFT JOIN + coalesce)
    so the codebook never shrinks — with small corpora and k=16 a seed
    can lose every member after the first reassignment, and both engines
    must agree on what that cluster's centroid is afterwards."""
    cent = seeds
    for _ in range(iters):
        upd = update_int(assign_int(vecs, cent).drop("dist"))
        cent = (
            cent.alias("p")
            .join(upd.alias("u"), "cid", "left")
            .select("cid", F.coalesce(F.col("u.c"), F.col("p.c")).alias("c"))
        )
    return cent
