"""Cross-engine determinism helpers for floating-point aggregates.

Double-precision SUM is order-sensitive, and Spark and DuckDB will not sum
partitions in the same order — so ``round(SUM(price*(1-disc)), 2)`` can flip
on a rounding boundary between the two engines. Two rules make a money
aggregate bit-identical in both engines:

1. If the summed values carry ≤k exact decimals, ``round(SUM(x), k)`` is
   safe: the true total sits ON a k-decimal point, never on a boundary, and
   reorder noise (≪ half-gap) cannot move it across one.
2. Otherwise, sum exactly in integer units: per-row ``round(x·10^s)`` is
   deterministic (same IEEE operands → same double in both engines), the
   integer SUM is associative/exact, and the final division by ``10^s`` is
   a single deterministic IEEE op. This is the classic money-in-cents
   pattern, at scale s.

``exact_sum`` implements rule 2 on the Spark side; oracles use the textual
twin ``SUM(CAST(round(x * 10^s, 0) AS BIGINT)) / 10^s.0``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(expr: Column, scale: int = 6) -> Column:
    """Order-insensitive exact sum of ``expr`` in 10^-scale units → DOUBLE.

    SQL twin: ``SUM(CAST(round(expr * POW10, 0) AS BIGINT)) / POW10.0``.
    """
    pow10 = 10**scale
    return F.sum(F.round(expr * F.lit(pow10), 0).cast("long")) / F.lit(float(pow10))


def exact_avg(expr: Column, scale: int = 6) -> Column:
    """Order-insensitive exact mean (integer-units sum / count)."""
    pow10 = 10**scale
    return (
        F.sum(F.round(expr * F.lit(pow10), 0).cast("long")) / F.lit(float(pow10))
    ) / F.count(F.lit(1))
