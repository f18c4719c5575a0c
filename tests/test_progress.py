"""Live progress surfaces (etl/progress.py — SURVEY §2-A#16's redraw half,
VERDICT r4 'what's missing' #4)."""

from __future__ import annotations

import io
import json
import time

from pyspark.sql import functions as F

from wd2sql_spark.etl.progress import JobProgress, attach_streaming_progress


def test_job_progress_emits_final_line_and_survives_fast_jobs(spark):
    buf = io.StringIO()
    with JobProgress(spark, label="t", interval=0.05, stream=buf) as jp:
        spark.range(1000).select(F.sum("id")).collect()
    out = buf.getvalue()
    assert "[t] done in" in out  # deterministic final line
    assert jp.lines_emitted >= 1


def test_job_progress_observes_running_stages(spark):
    """A job long enough to straddle poll ticks must produce at least one
    interim stage line. 64 partitions of md5 chains keep the stage busy
    for a few hundred ms without any sleep-in-executor hacks."""
    buf = io.StringIO()
    df = spark.range(0, 2_000_00, 1, 64).select(F.col("id").cast("string").alias("s"))
    for _ in range(12):
        df = df.select(F.md5("s").alias("s"))
    with JobProgress(spark, label="t2", interval=0.02, stream=buf):
        df.select(F.count(F.lit(1))).collect()
    out = buf.getvalue()
    assert "tasks" in out, out  # an interim "stage N: a/b tasks" redraw fired


def test_streaming_listener_reports_per_batch_rows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        with open(src / f"f{i}.json", "w") as f:
            for j in range(5):
                f.write(json.dumps({"v": i * 5 + j}) + "\n")
    buf = io.StringIO()
    listener = attach_streaming_progress(spark, label="ingest", stream=buf)
    try:
        q = (
            spark.readStream.schema("v long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .groupBy()
            .count()
            .writeStream.format("memory")
            .queryName("progress_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        # listener events are delivered asynchronously on the bus
        deadline = time.time() + 10
        while time.time() < deadline and sum(n for _, n in listener.batches) < 15:
            time.sleep(0.2)
        assert sum(n for _, n in listener.batches) == 15, listener.batches
        assert len(listener.batches) >= 3  # one progress line per file-trigger batch
        assert "batch" in buf.getvalue()
    finally:
        spark.streams.removeListener(listener)
