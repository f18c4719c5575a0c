"""Fixed-vs-marginal cost split for the slowest streaming lifecycles
(VERDICT r8 task #6).

The streaming_suite numbers in BENCH_LOCAL.json are whole stream
LIFECYCLES — checkpoint/state-store init, micro-batch planning, memory-
sink commit — not query latencies. This tool measures how much of each
wall time is per-run FIXED overhead vs per-row MARGINAL work, the same
split the ETL and admission sections of SCALE.md already carry: run the
registered query untouched at 1× and K× replicated input, then

    marginal s/row = (wall_K - wall_1) / (rows_K - rows_1)
    fixed s        = wall_1 - rows_1 * marginal

Replication model (same as bench.py's salted_replicas / the scale
harness): replicas are DISTINCT data — events offset user_id/event_id per
replica so per-key density (and thus state-store size per key) matches
the base corpus; documents salt their tokens so cross-replica similarity
is ~0. A marginal rows/s close to the 1× apparent rows/s means the
lifecycle was already throughput-bound; a fixed share near 1 means the
suite number is startup cost, not operator cost.

Usage:
    python tools/stream_cost_split.py [--sf /root/testdata/sf0.1] [--k 8]

Writes SCALE_STREAM_r09.json next to the repo root and prints a
markdown table ready for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def replicate_events(spark, sf_dir: str, out_dir: str, k: int) -> int:
    """K distinct-data replicas of the events fixture: user_id/event_id
    offset per replica (per-key event density — and so state size per
    key — matches the base), ts/value/type untouched."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    reps = ev.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))).select(
        (F.col("event_id") + F.col("rep").cast("long") * F.lit(10**9)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep").cast("long") * F.lit(10**6)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    reps.write.parquet(os.path.join(out_dir, "events.parquet"))
    return n * k


def replicate_documents(spark, sf_dir: str, out_dir: str, k: int) -> int:
    """K distinct-data replicas of the documents fixture: doc_id offset and
    tokens suffixed per replica so cross-replica similarity ~ 0 (the
    near-dup probe's candidate volume scales with rows, not quadratically)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    salted = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            "text", r"(\S+)", F.concat(F.lit("$1~"), F.col("rep").cast("string"))
        )
    )
    reps = docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))).select(
        (F.col("doc_id") + F.col("rep").cast("long") * F.lit(10**9)).alias("doc_id"),
        salted.alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    reps.write.parquet(os.path.join(out_dir, "documents.parquet"))
    return n * k


# lifecycle -> (input replicator, which fixture rows count as "input")
TARGETS = {
    "stream_incremental_neardup": replicate_documents,
    "stream_interval_join": replicate_events,
    "stream_stateful_streaks": replicate_events,
    # r9: the two lifecycles the r8 split did not cover
    "stream_dedup_within_watermark": replicate_events,
    "stream_session_windows": replicate_events,
}


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    k = 8
    argv = sys.argv[1:]
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    if "--k" in argv:
        k = int(argv[argv.index("--k") + 1])

    from wd2sql_spark.queries import load_all_modules
    from wd2sql_spark.session import get_spark

    spark = get_spark("stream-cost-split")
    registry = load_all_modules()

    def loadavg1() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    out: dict = {"sf_dir": sf_dir, "k": k, "targets": {}}
    for name, replicate in TARGETS.items():
        q = registry[name]
        # untimed warmup: codegen + file-listing caches, so both timed
        # runs measure the same warm regime
        q.fn(spark, sf_dir).count()
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        wall_1 = time.perf_counter() - t0
        la_1 = loadavg1()
        base_table = (
            "documents" if replicate is replicate_documents else "events"
        )
        n_1 = spark.read.parquet(f"{sf_dir}/{base_table}.parquet").count()

        root = tempfile.mkdtemp(prefix=f"stream-split-{name}-")
        try:
            n_k = replicate(spark, sf_dir, root, k)
            q.fn(spark, root).count()  # untimed: first-touch of the new files
            t0 = time.perf_counter()
            q.fn(spark, root).count()
            wall_k = time.perf_counter() - t0
            la_k = loadavg1()
        finally:
            shutil.rmtree(root, ignore_errors=True)

        marginal = (wall_k - wall_1) / (n_k - n_1)
        fixed = wall_1 - n_1 * marginal
        out["targets"][name] = {
            "wall_1x_s": round(wall_1, 3),
            "rows_1x": n_1,
            "loadavg_1x": la_1,
            f"wall_{k}x_s": round(wall_k, 3),
            f"rows_{k}x": n_k,
            f"loadavg_{k}x": la_k,
            "marginal_rows_per_s": round(1.0 / marginal, 1) if marginal > 0 else None,
            "fixed_cost_s": round(fixed, 3),
            "fixed_share_of_1x": round(max(0.0, fixed) / wall_1, 3),
        }
        print(f"{name}: 1x {wall_1:.2f}s/{n_1} rows, {k}x {wall_k:.2f}s/{n_k} rows "
              f"-> fixed {fixed:.2f}s ({100*max(0,fixed)/wall_1:.0f}%), "
              f"marginal {1.0/marginal:,.0f} rows/s" if marginal > 0 else
              f"{name}: marginal <= 0 (noise-dominated)", file=sys.stderr)

    path = os.path.join(REPO, "SCALE_STREAM_r09.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}", file=sys.stderr)

    # markdown table for SCALE.md
    hdr = (
        "| lifecycle | 1× wall | fixed (share) | marginal rows/s | "
        f"{k}× wall / rows |\n|---|---|---|---|---|"
    )
    print(hdr)
    for name, t in out["targets"].items():
        print(
            f"| {name} | {t['wall_1x_s']} s / {t['rows_1x']} rows | "
            f"{t['fixed_cost_s']} s ({round(100*t['fixed_share_of_1x'])}%) | "
            f"{t['marginal_rows_per_s']} | "
            f"{t[f'wall_{k}x_s']} s / {t[f'rows_{k}x']} |"
        )


if __name__ == "__main__":
    main()
