"""K-means clustering over the ``embeddings`` fixture — the semantic-dedup
/ corpus-organization stage of a training-data pipeline (cluster, then
sample per cluster or drop near-empty ones).

Lloyd's algorithm is iterative, but a FIXED small iteration count unrolls
into a static dataflow — and with every quantity held in exact integer
arithmetic (quantized components, integer squared distances, half-up
integer-division centroid updates) both engines take bit-identical
branches at every argmin and the final stats hash-match a plain SQL twin.
That is the same determinism playbook as sim_centroid_dispersion
(integer-domain geometry) applied to an iterative algorithm.

Scale shape: assignment is ROW-LOCAL — the k centroids travel as one
broadcast row holding an array of (cid, vector) structs, and each vector
folds its distance to all k inline (no join, no shuffle, no window).
Each update is one (cid, dim) hash aggregate over the exploded members
(map-side partials shrink it to k·dim rows per executor) plus a k-row
collect_list. Two iterations = two such aggregates; O(iters) shuffles
total, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries.registry import query

K = 4  # clusters (seeded from the K lowest vec_ids)
DIM = 64
SCALE = 1_000_000
# Components live in ~[-0.6, 0.6]; the offset makes every quantized value
# positive so the half-up integer division in the centroid update needs
# no sign handling (Spark `div` truncates toward zero, DuckDB `//`
# floors — they agree only for non-negative operands). Distances are
# invariant to a common offset.
OFFSET = 1_000_000


def _iv(col: Column) -> Column:
    """array<long> quantized components: round(x·10⁶) + OFFSET."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * SCALE, 0).cast("long") + OFFSET
    )


def _sqdist(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² as an exact integer fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, iv) × centroids → (vec_id, iv, cid, dist).

    The centroid relation (cid, c) collapses to ONE row carrying a sorted
    array of structs, broadcast onto the corpus; per-vector argmin is
    ``array_min`` over (dist, cid) structs — lexicographic min = smallest
    distance, ties to the lowest cid, matching the SQL twin's
    ``ORDER BY dist, cid`` rank."""
    cent_row = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("cents")
    )
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(_sqdist(F.col("iv"), c["c"]).alias("dist"), c["cid"].alias("cid")),
    )
    amin = F.array_min(scored)
    return (
        vecs.crossJoin(F.broadcast(cent_row))
        .select("vec_id", "iv", amin["cid"].alias("cid"), amin["dist"].alias("dist"))
    )


def _update(assigned: DataFrame) -> DataFrame:
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


_IVT = f"""
ivt AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}, 0) AS BIGINT) + {OFFSET}) AS iv
  FROM embeddings
)
"""

_SQDIST = (
    "list_sum(list_transform(range(1, {dim} + 1), "
    "k -> ({a}[k] - {b}[k]) * ({a}[k] - {b}[k])))"
)


def _assign_sql(cent: str, out: str) -> str:
    d = _SQDIST.format(a="t.iv", b="s.c", dim=DIM)
    return f"""
{out} AS (
  SELECT vec_id, iv, cid, dist FROM (
    SELECT t.vec_id, t.iv, s.cid, CAST({d} AS BIGINT) AS dist,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY {d}, s.cid) AS rn
    FROM ivt t CROSS JOIN {cent} s) z
  WHERE rn = 1
)"""


def _update_sql(assigned: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT cid, list(c ORDER BY dim) AS c FROM (
    SELECT cid, dim, (2 * SUM(v) + COUNT(*)) // (2 * COUNT(*)) AS c
    FROM (SELECT cid, unnest(range(1, {DIM} + 1)) AS dim, unnest(iv) AS v FROM {assigned}) e
    GROUP BY cid, dim) m
  GROUP BY cid
)"""


KMEANS_ORACLE = f"""
WITH {_IVT},
seeds AS (
  SELECT vec_id AS cid, iv AS c FROM ivt
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {K})
),{_assign_sql('seeds', 'a1')},{_update_sql('a1', 'c1')},{_assign_sql('c1', 'a2')}
SELECT CAST(a2.cid AS BIGINT) AS cid,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(a2.dist) AS BIGINT) AS inertia,
       CAST(list_sum(any_value(c1.c)) AS BIGINT) AS centroid_l1
FROM a2 JOIN c1 ON a2.cid = c1.cid
GROUP BY a2.cid
ORDER BY cid
"""


@query("cluster_kmeans_embeddings", oracle=KMEANS_ORACLE, category="llm-cluster")
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations of k-means (k=4, seeds = the K
    lowest-id vectors): assign → update → assign, reporting per-cluster
    membership, inertia (exact integer Σ squared distance to the updated
    centroid), and the centroid's L1 mass as a checksum.

    See the module docstring for why this is bit-deterministic and how
    the plan scales (row-local broadcast assignment, one (cid, dim)
    aggregate per update)."""
    emb = table(spark, sf_dir, "embeddings")
    # The quantized working set feeds BOTH assignments (and the seed
    # branch); persist it so iterations hit cache instead of re-scanning
    # and re-quantizing the corpus — the standard Spark iterative-ML
    # pattern (the relation is (id, 64 longs): a fraction of the raw
    # corpus, MEMORY_AND_DISK spills if it ever outgrows memory).
    vecs = emb.select("vec_id", _iv(F.col("embedding")).alias("iv")).persist()
    seeds = (
        vecs.orderBy("vec_id")
        .limit(K)
        .select(F.col("vec_id").alias("cid"), F.col("iv").alias("c"))
    )
    a1 = _assign(vecs, seeds)
    c1 = _update(a1)
    a2 = _assign(vecs, c1)
    stats = a2.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("dist").cast("bigint").alias("inertia"),
    )
    c1_mass = c1.select(
        "cid",
        F.aggregate(F.col("c"), F.lit(0).cast("long"), lambda a, v: a + v).alias(
            "centroid_l1"
        ),
    )
    return (
        stats.join(c1_mass, "cid")
        .select(
            F.col("cid").cast("bigint"),
            "n_members",
            "inertia",
            F.col("centroid_l1").cast("bigint"),
        )
        .orderBy("cid")
    )
