"""HLL error-margin pin (ADVICE r9 #1).

``agg_approx_count_distinct``'s oracle asserts the sketch estimate lands
within 5% of exact; the sketch runs at rsd 0.02 (2.5σ for that bound).
The estimate is deterministic (fixed hash, fixed registers), so the
honest guard is to measure the ACTUAL relative error at every scale
factor the driver can grade and assert it stays well inside the verdict
bound — a fixture regeneration or Spark upgrade that drifts the error
toward the 5% cliff fails loudly here instead of flipping the oracle
verdict at an unattested SF.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_hll_relative_error_well_inside_verdict_bound(spark, sf):
    l = table(spark, f"/root/testdata/{sf}", "lineitem")
    rows = (
        l.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("exact"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
        )
        .collect()
    )
    assert rows, f"no groups at {sf}"
    for r in rows:
        rel = abs(r["approx"] - r["exact"]) / r["exact"]
        # verdict bound is 0.05; demand a 20% margin below it
        assert rel <= 0.04, (sf, r["l_returnflag"], rel)
