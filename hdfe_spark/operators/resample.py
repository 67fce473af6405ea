"""Time-series resampling with gap filling.

Downsample an event stream to fixed-width bins per entity, emitting a
row for EVERY bin between the entity's first and last event — empty
bins zero-filled. This is the transform that feeds fixed-interval
models (forecasting, anomaly detection, rate dashboards): the raw
stream has holes; the model wants a dense grid.

Plan shape (100 TB): one map-side-combined grouped aggregate over
(entity, bin) — the only pass over event-sized data; a per-entity
min/max of the BIN AGGREGATE (rows ∝ entities); then the dense bin
spine generates from ``sequence``+``explode`` over the aggregate, so
spine cost is rows ∝ total bins, never touching raw events again; a
left join snaps stats onto the spine. All bin arithmetic is integer
``div`` on epoch-µs — engine-exact.

Out-of-the-box Spark has no gap-fill primitive (pandas ``resample``
does); this is the declarative, distributed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hdfe_spark.operators._guards import quote_ident


def resample_events(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_us_col: str = "ts",
    value_col: str = "value",
    bin_us: int = 3_600_000_000,
    max_bins_per_entity: int = 10_000_000,
) -> DataFrame:
    """Per-entity dense resample: (entity, bin, n, sum_value) for every
    ``bin_us``-wide bin in the entity's active span, zero-filled where
    no events fall. ``ts_us_col`` is bigint epoch-µs
    (``sources.tables.ts_micros``).

    ``sequence`` materializes each entity's spine as ONE in-memory
    array before explode, so an entity whose span/bin ratio is huge
    (second-wide bins over years) would allocate a giant row; the
    ``max_bins_per_entity`` guard fails fast with the offending span
    instead of OOMing an executor — pick a coarser ``bin_us`` or split
    the time range."""
    w = int(bin_us)
    binned = (
        df.withColumn(
            "__bin", F.expr(f"{quote_ident(ts_us_col)} div {w}")
        )
        .groupBy(entity_col, "__bin")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(value_col).alias("__sv"),
        )
    )
    spans = binned.groupBy(entity_col).agg(
        F.min("__bin").alias("__lo"), F.max("__bin").alias("__hi")
    )
    guarded = spans.withColumn(
        "__lo",
        F.when(
            F.col("__hi") - F.col("__lo") < F.lit(int(max_bins_per_entity)),
            F.col("__lo"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("resample_events: entity span exceeds "
                          f"max_bins_per_entity={max_bins_per_entity} bins ("),
                    (F.col("__hi") - F.col("__lo")).cast("string"),
                    F.lit(") — use a coarser bin_us"),
                )
            ).cast("long")
        ),
    )
    spine = guarded.select(
        entity_col,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__bin"),
    )
    return (
        spine.join(binned, [entity_col, "__bin"], "left")
        .select(
            F.col(entity_col),
            F.col("__bin").cast("bigint").alias("bin"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n"),
            F.coalesce(F.col("__sv"), F.lit(0.0)).alias("sum_value"),
        )
    )


def interpolate_gaps(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    value_col: str,
    out_col: str = "value_interp",
) -> DataFrame:
    """Linear interpolation of NULL values across a per-key integer
    grid (the dense spine ``resample_events`` emits, with empty bins
    as NULL instead of zero): every interior NULL at index t between
    known neighbors (t0, y0) and (t1, y1) becomes
    y0 + (y1-y0) * (t-t0)/(t1-t0); leading/trailing NULLs (no known
    neighbor on one side) stay NULL — interpolation only, never
    extrapolation.

    Two frame-bounded window passes over ONE (key, idx) sort: an
    ignore-nulls last() looking back carries (t0, y0), an
    ignore-nulls first() looking forward carries (t1, y1) — the
    pandas ``Series.interpolate(limit_area='inside')`` semantics,
    distributed. All index arithmetic is integer; the interpolation
    itself is one deterministic IEEE expression on doubles, so a SQL
    oracle reproduces it exactly.
    """
    known = F.when(
        F.col(value_col).isNotNull(),
        F.struct(
            F.col(idx_col).cast("long").alias("i"),
            F.col(value_col).cast("double").alias("v"),
        ),
    )
    w = Window.partitionBy(key_col).orderBy(idx_col)
    back = F.last(known, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = F.first(known, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    t = F.col(idx_col).cast("long")
    y0, t0 = back.getField("v"), back.getField("i")
    y1, t1 = fwd.getField("v"), fwd.getField("i")
    interp = y0 + (y1 - y0) * (
        (t - t0).cast("double") / (t1 - t0).cast("double")
    )
    out = (
        F.when(F.col(value_col).isNotNull(),
               F.col(value_col).cast("double"))
        .when(back.isNotNull() & fwd.isNotNull(), interp)
        .otherwise(F.lit(None).cast("double"))
    )
    return df.withColumn(out_col, out)
