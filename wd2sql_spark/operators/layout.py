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
