"""Compressed-dump source parity (VERDICT r3 task 7).

The reference's primary mode is a bz2-compressed dump piped through
``bzcat`` (/root/reference/README.md:59-61: ``bzcat latest-all.json.bz2 |
wd2sql - output.db``); Spark has no stdin source, but ``spark.read.text``
decompresses ``.bz2``/``.gz`` shards transparently via the Hadoop codecs,
which is the cluster-native equivalent (and better: bzip2 is a SPLITTABLE
codec, so one large .bz2 shard still fans out across executors, where the
reference's pipe is single-stream). This test pins that a compressed shard
directory produces BIT-IDENTICAL 8-table output to the uncompressed run.
"""

from __future__ import annotations

import bz2
import glob
import gzip
import os

import pytest

from wd2sql_spark.etl.pipeline import wd2spark
from wd2sql_spark.etl.synthdump import write_dump


def _compress_dump(src_root: str, dst_root: str, codec) -> None:
    os.makedirs(dst_root)
    ext = {bz2: "bz2", gzip: "gz"}[codec]
    for path in sorted(glob.glob(os.path.join(src_root, "shard-*.json"))):
        with open(path, "rb") as f:
            data = f.read()
        out = os.path.join(dst_root, os.path.basename(path) + "." + ext)
        with codec.open(out, "wb") as f:
            f.write(data)


def _table_rows(spark, paths: dict[str, str]) -> dict[str, list]:
    return {
        name: sorted(tuple(r) for r in spark.read.parquet(p).collect())
        for name, p in paths.items()
    }


@pytest.mark.parametrize("codec", [bz2, gzip], ids=["bz2", "gzip"])
def test_compressed_dump_matches_uncompressed(spark, tmp_path, codec):
    plain = str(tmp_path / "dump-plain")
    write_dump(plain, n=512, shards=4)
    comp = str(tmp_path / "dump-comp")
    _compress_dump(plain, comp, codec)

    paths_plain = wd2spark(spark, plain, str(tmp_path / "out-plain"), staged=True)
    paths_comp = wd2spark(spark, comp, str(tmp_path / "out-comp"), staged=True)

    rows_plain = _table_rows(spark, paths_plain)
    rows_comp = _table_rows(spark, paths_comp)
    assert set(rows_plain) == set(rows_comp)
    for name in rows_plain:
        assert rows_comp[name] == rows_plain[name], f"table {name} differs"
    # sanity: the corrupt-line quarantine also survived decompression,
    # i.e. the compressed run parsed the same number of meta rows (> 0)
    assert len(rows_plain["meta"]) > 0
