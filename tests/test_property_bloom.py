"""Property-based checks of the Bloom prefilter arithmetic
(queries/profiling.py — join_bloom_prefilter_semi).

The query's correctness rests on two facts, neither of which its oracle
exercises directly (the oracle asserts the plain semi-join result, so a
broken filter only surfaces as missing rows):

1. The k salted probe positions Spark computes (`_bloom_positions`,
   md5-prefix mod m — the md5_bucket idiom) equal a pure-Python md5 twin
   for arbitrary keys — pinning the arithmetic against Spark conv/
   substring/md5 edge cases (sign, leading zeros, 1-based substring).
2. NO FALSE NEGATIVES end-to-end: for any key set, building the word
   array through the query's own explode→bit_or aggregation and probing
   through its own element_at/shiftleft test accepts every member key.
   This is the property that makes the prefilter semantically invisible;
   an off-by-one in the 1-based element_at or the pos%64 shift would
   silently drop matching fact rows.
"""

from __future__ import annotations

import hashlib
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wd2sql_spark.queries.profiling import (
    _BLOOM_BITS,
    _BLOOM_PROBES,
    _bloom_positions,
    _one_shifted,
)

KEY = st.integers(min_value=-(2**31), max_value=2**31 - 1)


def _py_positions(key: int) -> list[int]:
    """Pure-Python twin of profiling._bloom_positions (md5_bucket salted
    per probe): first 8 md5 hex digits of "<key>:<j>" as int, mod m."""
    return [
        int(hashlib.md5(f"{key}:{j}".encode()).hexdigest()[:8], 16) % _BLOOM_BITS
        for j in range(_BLOOM_PROBES)
    ]


@settings(max_examples=10, deadline=None)
@given(st.lists(KEY, min_size=1, max_size=20, unique=True))
def test_probe_positions_match_python_md5(spark, keys):
    sdf = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: [r[f"p{j}"] for j in range(_BLOOM_PROBES)]
        for r in sdf.select(
            "k",
            *[
                p.alias(f"p{j}")
                for j, p in enumerate(_bloom_positions(F.col("k")))
            ],
        ).collect()
    }
    assert got == {k: _py_positions(k) for k in keys}


@settings(max_examples=5, deadline=None)
@given(st.lists(KEY, min_size=1, max_size=50, unique=True))
def test_members_always_pass_the_filter(spark, keys):
    dim = spark.createDataFrame([(k,) for k in keys], ["k"])
    words_rows = (
        dim.select(F.explode(F.array(*_bloom_positions(F.col("k")))).alias("pos"))
        .groupBy((F.col("pos") / 64).cast("int").alias("w"))
        .agg(F.bit_or(_one_shifted(F.col("pos"))).alias("bits"))
        .collect()
    )
    words = [0] * (_BLOOM_BITS // 64)
    for r in words_rows:
        words[r["w"]] = r["bits"]
    words_lit = F.array(*[F.lit(w).cast("long") for w in words])

    tests = []
    for pos in _bloom_positions(F.col("k")):
        word = F.element_at(words_lit, ((pos / 64).cast("int") + 1))
        tests.append(word.bitwiseAND(_one_shifted(pos)) != 0)
    accepted = dim.filter(tests[0] & tests[1] & tests[2])
    assert accepted.count() == len(keys)  # every member passes: no false negatives
