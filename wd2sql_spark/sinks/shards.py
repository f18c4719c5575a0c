"""Range-sorted shard export: globally ordered training shards.

The write-side twin of the corpus queries: a curated corpus at 100 TB is
consumed as SHARDS (one file-set per trainer worker), and two shard
layouts cover the real access patterns:

- ``write_sorted_shards`` — repartitionByRange + sortWithinPartitions on
  an order key (e.g. a quality/curriculum score, a timestamp): one range
  exchange total, shard k's key range strictly precedes shard k+1's, and
  rows within a shard are sorted, so parquet min/max row-group stats give
  free data skipping on the order key and a curriculum reader streams
  shards in index order to see the corpus in global key order.
- ``write_hash_shards`` — md5-bucket assignment (the reproducible-sampling
  pattern, llm_sampling.py): shard membership is a pure function of the id
  column, stable across runs/cluster sizes/Spark versions, which is what
  makes training-data ablations reproducible. Within-shard order is made
  deterministic by sorting on the id.

Shard-count sizing at scale follows the bucketed-write rule
(sinks/bucketed.py): corpus_bytes / n_shards ≲ a few hundred MB so one
shard is one executor-core's unit of work.

The reference's analog is its single ordered SQLite B-tree (rowid order,
main.rs:223-249 in /root/reference); sorted shards are the distributed
equivalent of "physically organize once so every later scan is cheap".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_sorted_shards(
    df: DataFrame,
    path: str,
    *,
    order_col: str,
    tiebreak_col: str,
    n_shards: int,
) -> None:
    """Write ``df`` as ``n_shards`` parquet files globally ordered by
    ``(order_col, tiebreak_col)``.

    One range exchange (boundaries from Spark's reservoir sample of the
    key distribution — balanced by construction, so a skewed score column
    still yields even shards) + an in-partition sort; no second shuffle.
    The tiebreak column makes the total order — and therefore every
    shard's exact row set — deterministic for a given boundary set."""
    (
        df.repartitionByRange(n_shards, F.col(order_col), F.col(tiebreak_col))
        .sortWithinPartitions(order_col, tiebreak_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_hash_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
) -> None:
    """Write ``df`` partitioned into ``n_shards`` md5-bucket directories
    (``shard=NNN/``). Membership is ``md5(salt:id) % n_shards`` — a pure,
    engine-portable function of the row id, so the same row lands in the
    same shard on any cluster size or engine (the reproducible-sampling
    contract, llm_sampling.py). Directory partitioning means a reader of
    shard k scans only its files (partition pruning)."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 15), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")
    (
        df.withColumn("shard", bucket)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def shard_manifest(spark: SparkSession, path: str, order_col: str) -> DataFrame:
    """Per-file (shard) min/max of ``order_col`` + row count, from one
    scan. For a ``write_sorted_shards`` output the ranges are pairwise
    non-overlapping when sorted by min — the property a range reader
    relies on; tests assert it."""
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), F.col(order_col))
        .groupBy("file")
        .agg(
            F.min(order_col).alias("min_key"),
            F.max(order_col).alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("min_key", "file")
    )


def zvalue(col_a: F.Column, col_b: F.Column, *, bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of two already-quantized non-negative
    integer columns (each in [0, 2^bits)): bit i of ``col_a`` lands at
    z-bit 2i, bit i of ``col_b`` at 2i+1. Pure Catalyst bit arithmetic
    (shift/and/sum over a literal bit range) — no UDF, whole-stage
    codegen keeps it in the scan stage."""
    a = col_a.cast("long")
    b = col_b.cast("long")
    # shiftleft()'s shift amount must be a literal int in the Python API,
    # so shifts are written as exact power-of-two multiplies (2^k is exact
    # in long arithmetic for k < 63; here k ≤ 2·bits+1).
    def _bit(src: F.Column, i: int) -> F.Column:
        return F.shiftright(src, i).bitwiseAND(F.lit(1))

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + _bit(a, i) * F.lit(1 << (2 * i)) + _bit(b, i) * F.lit(1 << (2 * i + 1))
    return z


def write_zordered_shards(
    df: DataFrame,
    path: str,
    *,
    col_a: str,
    col_b: str,
    n_shards: int,
    bits: int = 16,
) -> None:
    """Write ``df`` range-sharded and sorted on the Z-value of
    ``(col_a, col_b)`` — multi-dimensional locality, so parquet row-group
    min/max stats prune scans filtered on EITHER column (a single-column
    sort gives its secondary column the full value range in every file;
    Z-ordering bounds both). This is the OPTIMIZE ZORDER layout of the
    Delta/Iceberg world, expressed as plain Spark:

    1. one tiny 1-row aggregate computes both columns' min/max
       (broadcast back — no shuffle of the data),
    2. each value quantizes to a ``bits``-bit rank by linear scaling
       (rank, not exact order — ties are fine, locality is the goal),
    3. one range exchange on the interleaved z-value + in-partition sort.

    Total cost: the same single exchange as write_sorted_shards."""
    stats = df.agg(
        F.min(col_a).alias("amin"),
        F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"),
        F.max(col_b).alias("bmax"),
    )
    top = float(2**bits - 1)

    def _quant(col: str, lo: F.Column, hi: F.Column) -> F.Column:
        span = (hi - lo).cast("double")
        frac = F.when(span > 0, (F.col(col) - lo).cast("double") / span).otherwise(
            F.lit(0.0)
        )
        return F.floor(frac * F.lit(top)).cast("long")

    withz = (
        df.join(F.broadcast(stats))
        .withColumn(
            "_z",
            zvalue(
                _quant(col_a, F.col("amin"), F.col("amax")),
                _quant(col_b, F.col("bmin"), F.col("bmax")),
                bits=bits,
            ),
        )
        .drop("amin", "amax", "bmin", "bmax")
    )
    (
        withz.repartitionByRange(n_shards, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
