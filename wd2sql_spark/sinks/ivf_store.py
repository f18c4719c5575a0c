"""Materialized IVF index: the ANN index as a parquet store partitioned
by inverted-list id.

The in-session IVF cache (operators/similarity.py::ivf_index) notes its
own limits at cluster scale: localCheckpoint blocks die with executors,
and the index should really be "a TABLE written partitioned by cid".
This sink IS that table: write the assigned corpus once under
``lists/cid=<k>/`` plus a tiny codebook relation, and every later query
batch probes its nprobe lists through PARTITION PRUNING — the scan reads
(nprobe / n_centroids) of the files, no session state, survives any
executor loss, and serves cold from any cluster that can read the path.

Layout:
    <path>/codebook/   (cid int, cv array<double>)       — n_centroids rows
    <path>/lists/      (vec_id, cv, cn) partitioned by cid

The store keeps the per-vector norm ``cn`` so serving never recomputes
it; it does NOT keep the per-centroid score array the session cache
carries (that is probe-side work, cheaper to redo per query batch than
to store per row — the exact trade the 100 TB table makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wd2sql_spark.operators.similarity import (
    _centroid_struct_array,
    _scored_base,
    collect_centroids,
    cosine,
    l2_norm,
)


def write_ivf_store(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build the IVF index from ``corpus`` and write it as a partitioned
    store. The same deterministic k-means-trained codebook and argmax
    assignment as the in-session index (shared ``collect_centroids`` /
    ``_scored_base``), minus the transient scores array."""
    spark = corpus.sparkSession
    centroids = collect_centroids(corpus, n_centroids, id_col, vec_col)
    base = _scored_base(corpus, centroids, id_col, vec_col)
    base.select(id_col, "cv", "cn", "cid").write.partitionBy("cid").parquet(
        f"{path}/lists"
    )
    spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "cid int, cv array<double>",
    ).write.parquet(f"{path}/codebook")


def ivf_topk_from_store(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve approximate top-k from a store written by
    :func:`write_ivf_store`. The probe set (≤ n_queries·nprobe list ids)
    is collected to the driver — a few integers, the price of turning
    the list filter into a PARTITION filter the scan can prune on — and
    results are bit-identical to the in-memory ``ivf_topk`` paths (same
    codebook, same assignment, same IEEE scoring ops)."""
    cb = sorted(
        (r.cid, list(r.cv)) for r in spark.read.parquet(f"{path}/codebook").collect()
    )
    q_scored = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            l2_norm(F.col(vec_col)).alias("qn"),
        )
        .select("query_id", "qv", "qn", F.explode(_centroid_struct_array(cb)).alias("c"))
        .select(
            "query_id",
            "qv",
            "qn",
            F.col("c.cid").alias("cid"),
            cosine(F.col("qv"), F.col("c.cv"), na=F.col("qn")).alias("cscore"),
        )
    )
    pw = Window.partitionBy("query_id").orderBy(F.col("cscore").desc(), F.col("cid"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qn", "cid")
    )
    probe_cids = sorted(r.cid for r in probes.select("cid").distinct().collect())
    lists = (
        spark.read.parquet(f"{path}/lists")
        .filter(F.col("cid").isin(probe_cids))
        .select(F.col(id_col).alias("neighbor_id"), "cv", "cn", "cid")
    )
    scored = (
        F.broadcast(probes)
        .join(lists, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
