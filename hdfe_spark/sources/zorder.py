"""Z-order (Morton-curve) layout: multi-dimensional data skipping.

The reference has no storage layer (SURVEY.md §2.5). Bucketing
(`bucketing.py`) co-locates JOINS; Z-ordering co-locates RANGE
predicates: interleaving the bits of several columns into one Morton
key and range-partitioning + sorting the write on that key makes each
parquet file's min/max footer stats TIGHT in every interleaved
dimension at once. A 2-D predicate like ``x BETWEEN a AND b AND y
BETWEEN c AND d`` then prunes most files/row-groups at planning time
— the standard lakehouse trick (Morton 1966; used by Delta/Iceberg
``OPTIMIZE ZORDER BY``, all public).

Everything here is JVM-side bit arithmetic (``shiftleft``/
``shiftright``/``&``/``|``) inside whole-stage codegen — no UDFs, no
shuffle beyond the one range-repartition any sorted write needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column
    (column i contributes bit j to output position ``j*len(cols)+i``).
    Callers bucket/clamp values into ``[0, 2^bits)`` first —
    ``zorder_bucket`` does it rank-free. Constant ``bits ×
    len(cols)`` bitwise ops per row, fully codegen'd; result fits a
    bigint for ``bits*len(cols) <= 63``."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a bigint")
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def zorder_bucket(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into ``[0, 2^bits)`` by linear scaling
    over a FIXED [lo, hi] domain (clamped). Fixed bounds keep the
    key STABLE as the table grows — rank-based bucketing (ntile)
    would reshuffle every existing key on append, which is exactly
    what a layout key must never do."""
    span = float(hi) - float(lo)
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(
        float(2**bits - 1)
    )
    clamped = F.least(
        F.greatest(F.round(scaled, 0), F.lit(0.0)), F.lit(float(2**bits - 1))
    )
    return clamped.cast("bigint")


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: Column,
    n_files: int = 32,
) -> None:
    """Write ``df`` parquet range-partitioned AND sorted by the Morton
    key: file k holds a contiguous z-range, rows sorted inside, so
    every file's footer min/max is tight in each interleaved dimension
    — the property parquet row-group skipping needs. One range
    exchange (sampling pass + shuffle), the same cost as any global
    sort."""
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
