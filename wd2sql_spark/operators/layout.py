"""Storage-layout operators: Z-order (Morton) clustering keys and the
min/max data-skipping arithmetic they exist to serve.

At 100 TB the cheapest query is the one that never reads the file:
parquet footers carry per-file/per-row-group min-max stats, and the
fraction of files a 2-D predicate can SKIP is decided entirely by how
rows were laid out at write time. A single-column sort bounds one
dimension's spans and leaves every other dimension full-range per file;
interleaving the bits of both dimensions (the Z-order / Morton curve,
as used by lakehouse OPTIMIZE ZORDER BY implementations) bounds BOTH,
which is the whole trick. These helpers compute the key as pure
integer Catalyst expressions — deterministic, engine-portable (the
DuckDB oracle repeats the identical shift/mask arithmetic), and cheap
enough to run in the write path of every ingestion job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scale_to_bits(x: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Min-max scale an integer column onto [0, 2**bits - 1] with pure
    integer arithmetic: ((x - mn) * (2**bits - 1)) div max(mx - mn, 1).
    The ``div`` is Spark's integral division, textually mirrored by
    DuckDB's ``//``; the greatest(..., 1) guards a constant column."""
    span = F.greatest(mx - mn, F.lit(1).cast("long"))
    return F.call_function(
        "div", (x.cast("long") - mn) * F.lit(2**bits - 1), span
    )


def zorder_value(cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each column (already scaled to
    [0, 2**bits)) into one Morton key: bit i of column d lands at
    position i * len(cols) + d. Pure shift/mask terms summed — the
    terms occupy disjoint bit positions, so + is |."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + d)
    return z


def zorder_sql(cols: list[str], bits: int) -> str:
    """The identical Morton interleave as DuckDB SQL text (for oracles):
    sum of (((c >> i) & 1) << (i*n + d)) terms."""
    n = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * n + d})"
        for i in range(bits)
        for d, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def hilbert_value(x: Column, y: Column, bits: int) -> Column:
    """Hilbert-curve index of (x, y) on a 2^bits × 2^bits grid — the
    classic xy2d quadrant-rotation loop, run as ONE ``F.aggregate`` fold
    over the bit levels with a struct accumulator (x, y, d, s).

    Two Spark-specific shapes matter: the per-level shift amount varies,
    and ``shiftright`` only takes a literal — so the half-size ``s``
    rides IN the accumulator and bits extract as ``(v div s) & 1``; and a
    naive Python unroll would inline each level's x/y into the next
    (every level references them ~4×, an exponential expression tree) —
    the fold's lambda variable binds them once per level. Pure integer
    arithmetic; :func:`hilbert_sql` is the textual DuckDB twin
    (list_reduce over the same struct), and a pure-Python reference pins
    both in tests/test_property_layout.py."""
    zero = F.lit(0).cast("long")
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        zero.alias("d"),
        F.lit(2 ** (bits - 1)).cast("long").alias("s"),
    )

    n_minus_1 = F.lit(2**bits - 1).cast("long")  # reflect about the FULL grid

    def step(acc: Column, _: Column) -> Column:
        s = acc["s"]
        rx = F.call_function("div", acc["x"], s).bitwiseAND(F.lit(1))
        ry = F.call_function("div", acc["y"], s).bitwiseAND(F.lit(1))
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        reflect = (ry == 0) & (rx == 1)
        x1 = F.when(reflect, n_minus_1 - acc["x"]).otherwise(acc["x"])
        y1 = F.when(reflect, n_minus_1 - acc["y"]).otherwise(acc["y"])
        return F.struct(
            F.when(ry == 0, y1).otherwise(x1).alias("x"),
            F.when(ry == 0, x1).otherwise(y1).alias("y"),
            d2.alias("d"),
            F.call_function("div", s, F.lit(2)).alias("s"),
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)), init, step, lambda acc: acc["d"]
    )


def hilbert_ctes(src: str, carry: list[str], x: str, y: str, bits: int) -> tuple[str, str]:
    """The identical Hilbert fold as a DuckDB chained-CTE fragment (for
    oracles). NOT a list_reduce lambda: DuckDB 1.0.0's vectorized
    list_reduce miscomputes this fold on multi-row inputs (correct on a
    1-row table, wrong beyond — each primitive passes in isolation, the
    full struct fold does not), so each bit level is its own projection
    CTE over named columns, which also keeps the expression tree linear
    (a scalar unroll would reference x/y twice per level — exponential).

    Returns (cte_fragment, final_cte_name); the final CTE carries
    ``carry`` plus ``hd`` = the Hilbert index of (x, y)."""
    n1 = 2**bits - 1  # reflect about the FULL grid (the canonical rot())
    cols = ", ".join(carry)
    ctes = [
        f"hil0 AS (SELECT {cols}, CAST({x} AS BIGINT) AS hx, "
        f"CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    for lvl in range(bits):
        s = 2 ** (bits - 1 - lvl)
        rx = f"((hx // {s}) & 1)"
        ry = f"((hy // {s}) & 1)"
        ctes.append(
            f"hil{lvl + 1} AS (SELECT {cols}, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n1} - hy ELSE hy END) "
            f"ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n1} - hx ELSE hx END) "
            f"ELSE hy END AS hy, "
            f"hd + {s * s} * xor({rx} * 3, {ry}) AS hd FROM hil{lvl})"
        )
    return ",\n".join(ctes), f"hil{bits}"
