"""Compaction maintenance for the appendable parquet stores.

Admission appends (lsh_store, postings_store) are the right write path —
the corpus is never re-hashed — but every append adds files per touched
partition, and appended files carry their OWN sort ranges, so over many
drops a partition accumulates small files with overlapping min/max
spans: scan listing cost grows and row-group skipping degrades toward
useless. The standard fix every table format schedules (Delta/Iceberg
OPTIMIZE, Hive compaction) is a periodic rewrite: read the store,
re-apply the canonical layout (range-spread + within-file sort), write
beside the live dataset, and swap atomically.

``compact_dataset`` is that rewrite for a plain parquet directory:

- the rewrite job targets ``<dir>.compacting`` (a failed job leaves the
  live store untouched);
- the swap is two renames (live → ``.old``, compacted → live) — atomic
  per rename on a POSIX filesystem; on an object store this maps to the
  committer's atomic dir swap — then the old generation is deleted;
- content equality with the pre-compaction store is the maintenance
  contract (pinned by tests/test_lsh_store.py /
  tests/test_postings_store.py), bit-for-bit, because compaction only
  re-arranges rows.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def compact_dataset(
    spark: SparkSession,
    dataset_dir: str,
    layout: Callable[[DataFrame], DataFrame],
    partition_by: list[str],
) -> None:
    """Rewrite ``dataset_dir`` (a partitioned parquet dataset) through
    ``layout`` and swap it in atomically. Content is preserved exactly;
    only file boundaries and within-file order change."""
    tmp = dataset_dir.rstrip("/") + ".compacting"
    old = dataset_dir.rstrip("/") + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    df = spark.read.parquet(dataset_dir)
    layout(df).write.partitionBy(*partition_by).parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(dataset_dir, old)
    os.rename(tmp, dataset_dir)
    shutil.rmtree(old, ignore_errors=True)
