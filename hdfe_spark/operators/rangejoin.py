"""Binned range join: point-in-interval joins as co-partitioned
equi-joins.

Spark plans a join whose condition is an inequality
(``l.ts BETWEEN r.start AND r.end``) as a BroadcastNestedLoopJoin (or
a cartesian product when neither side broadcasts) — O(n·m) compares
and a single-task disaster at scale. The standard fix (the same
binning strategy behind commercial "range join optimization" hints)
rewrites it as an equi-join on a time bucket:

- each RIGHT interval explodes to the buckets it overlaps
  (``floor(start/w) .. floor(end/w)`` — bounded fan-out when interval
  length is bounded by ~w);
- each LEFT point maps to exactly ONE bucket (``floor(ts/w)``), so
  the rewrite cannot duplicate a match;
- the join runs on ``(keys…, bucket)`` — a plain hash shuffle join
  Catalyst/AQE can plan, size, and skew-split — and the exact
  interval predicate filters the bucket-collision candidates.

Pick ``bucket_width`` ≈ the typical interval length: fan-out stays
≤ 2-3 and each bucket's candidate set is small. All arithmetic is
integer (µs) — no float boundary wobble.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hdfe_spark.operators._guards import quote_ident


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` rows sharing ``on`` with
    ``right_start <= left_point < right_end`` (all three integer
    columns in the same unit, e.g. epoch-µs from
    ``sources.tables.ts_micros``).

    ``how='inner'`` only: outer forms of a binned join need
    dedup-after-union semantics that belong to the caller.
    """
    if how != "inner":
        raise ValueError("range_join supports how='inner' only")
    on = [on] if isinstance(on, str) else list(on)
    w = int(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {w}")

    # integer div, not float division + cast: the values are epoch-µs
    # longs near 2^60 where double division loses low bits
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{quote_ident(right_start)} div {w}"),
                F.expr(f"{quote_ident(right_end)} div {w}"),
            )
        ),
    )
    l = left.withColumn(
        "__bucket", F.expr(f"{quote_ident(left_point)} div {w}")
    )
    cond = (F.col(left_point) >= F.col(right_start)) & (
        F.col(left_point) < F.col(right_end)
    )
    return l.join(r, [*on, "__bucket"], "inner").filter(cond).drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval × interval OVERLAP join (half-open:
    ``l_start < r_end AND r_start < l_end``) sharing ``on`` — the
    second nested-loop shape Spark plans badly, rewritten like
    ``range_join`` but with BOTH sides exploded to their covered
    buckets.

    Exploding both sides makes an overlapping pair collide in EVERY
    shared bucket, so the naive rewrite needs a distinct() pass over
    the join output — a second full shuffle. Avoided with the
    representative-bucket trick: a pair is emitted only from the
    bucket containing ``greatest(l_start, r_start)`` (the first
    instant of the overlap region). That instant lies in exactly one
    bucket, and both intervals cover it whenever they overlap (it is
    ≥ each start by construction and < each end by the overlap
    predicate), so every overlapping pair is emitted exactly once —
    no dedup, one shuffle join, AQE-plannable.

    Empty intervals (``end <= start``) match nothing. All integer
    arithmetic (epoch-µs), same contract as ``range_join``.
    """
    on = [on] if isinstance(on, str) else list(on)
    w = int(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {w}")

    def buckets(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.filter(F.col(end) > F.col(start)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"{quote_ident(start)} div {w}"),
                    F.expr(f"({quote_ident(end)} - 1) div {w}"),
                )
            ),
        )

    l = buckets(left, left_start, left_end)
    r = buckets(right, right_start, right_end)
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    representative = F.col("__bucket") == F.expr(
        f"greatest({quote_ident(left_start)},"
        f" {quote_ident(right_start)}) div {w}"
    )
    return (
        l.join(r, [*on, "__bucket"], "inner")
        .filter(overlap & representative)
        .drop("__bucket")
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    x_col: str,
    y_col: str,
    radius: int,
    suffixes: tuple = ("_l", "_r"),
) -> DataFrame:
    """Planar radius join (the 2D spatial analogue of
    ``interval_overlap_join``): every (left, right) pair with
    squared Euclidean distance <= radius^2, over INTEGER coordinates
    (fixed-point micro-degrees / millimeters — integer distance
    arithmetic is what makes the predicate engine-exact; haversine's
    trig would diverge in the last ulp across engines).

    Grid-bucketed rewrite of the quadratic cross join: right points
    land in their single radius-sized grid cell; left points probe
    the 3x3 neighborhood (a 9x explode of the SMALLER side beats a
    |L|x|R| nested loop by orders of magnitude, and every qualifying
    pair is found exactly once because the right point owns exactly
    one cell — no dedup pass). The equi-join on cell ids hash-
    partitions; AQE handles hot cells. Columns are emitted with
    ``suffixes``. Contract: radius >= 1, and |coordinates| < 2^52 —
    the cell id comes from floor(c/r) in double arithmetic, which
    loses integer precision beyond that (a point could land one
    cell off and a boundary pair be silently missed).
    """
    r = int(radius)
    if r < 1:
        raise ValueError(
            "radius_join: radius must be >= 1 (radius 0 would "
            "divide the grid-cell computation by zero; for exact "
            "coordinate matches use a plain equi-join on (x, y))"
        )
    lx, ly = F.col(x_col), F.col(y_col)

    def cell(c):
        return F.floor(c / F.lit(r)).cast("long")

    rt = right.select(
        *[F.col(c).alias(c + suffixes[1]) for c in right.columns],
        cell(lx).alias("__cx"),
        cell(ly).alias("__cy"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    lt = left.select(
        *[F.col(c).alias(c + suffixes[0]) for c in left.columns],
        F.explode(
            F.array(
                *[
                    F.struct(
                        (cell(lx) + F.lit(dx)).alias("cx"),
                        (cell(ly) + F.lit(dy)).alias("cy"),
                    )
                    for dx, dy in offs
                ]
            )
        ).alias("__cell"),
    ).select(
        "*",
        F.col("__cell.cx").alias("__cx"),
        F.col("__cell.cy").alias("__cy"),
    ).drop("__cell")
    xl = F.col(x_col + suffixes[0])
    yl = F.col(y_col + suffixes[0])
    xr = F.col(x_col + suffixes[1])
    yr = F.col(y_col + suffixes[1])
    d2 = (xl - xr) * (xl - xr) + (yl - yr) * (yl - yr)
    return (
        lt.join(rt, ["__cx", "__cy"])
        .filter(d2 <= F.lit(r) * F.lit(r))
        .drop("__cx", "__cy")
    )
