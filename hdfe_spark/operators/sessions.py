"""Gap-based sessionization over event streams/tables.

Beyond-reference surface (the reference is panel econometrics; event
sessionization is its direct analogue for training-data event logs —
SURVEY.md §2.5 scopes beyond-reference operators to the driver's
fixture tables). Batch form is the classic gap-and-islands rewrite:
one window pass (lag → boundary flag → running sum), so cost is one
shuffle+sort on the entity key regardless of session count. The
streaming form is Spark's native ``session_window`` (state merged per
key, evicted by watermark).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: "int | float" = 1_800,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign every event a per-entity session index: a new session
    starts when the time since the entity's previous event exceeds
    ``gap`` (in ``ts_col`` units — pass nanoseconds for the events
    fixture's bigint-ns timestamps).

    One window pass; sessions are 0-indexed in time order per entity.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap))
    ).cast("long")
    run = Window.partitionBy(entity_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(run) - 1)


def session_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: "int | float" = 1_800,
) -> DataFrame:
    """Per-session summary (one row per (entity, session)): event
    count, start/end, duration. Builds on ``sessionize``; the grouped
    agg reuses the sessionize shuffle's partitioning (same key
    prefix), so AQE plans a single exchange."""
    s = sessionize(df, entity_col, ts_col, gap)
    return s.groupBy(entity_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )


def attribute_last_touch(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    type_col: str,
    touch_types: Sequence[str],
    conversion_types: Sequence[str],
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Last-touch attribution: every conversion event is credited to
    the entity's most recent STRICTLY PRECEDING touch event (by the
    ``order_cols`` total order); conversions with no prior touch
    attribute to NULL (organic).

    The marketing-analytics workhorse over the same event logs the
    curation pipeline reads: one window pass per entity (frame
    UNBOUNDED PRECEDING .. 1 PRECEDING with an ignore-nulls last()),
    shuffles only on the entity key — never a self-join of the event
    table against itself, which at 100 TB would square the touch
    volume.

    Output: the conversion rows plus ``touch_type`` and
    ``touch_<c>`` for each carry column (all NULL when organic).
    ``order_cols`` must totally order each entity's events (ties
    would make "most recent" nondeterministic).
    """
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    touch_struct = F.when(
        is_touch,
        F.struct(
            F.col(type_col).alias("t"),
            *[F.col(c).alias(c) for c in carry_cols],
        ),
    )
    last_touch = F.last(touch_struct, ignorenulls=True).over(w)
    out = df.withColumn("_lt", last_touch).filter(
        F.col(type_col).isin(list(conversion_types))
    )
    sel = [
        *df.columns,
        F.col("_lt").getField("t").alias("touch_type"),
        *[
            F.col("_lt").getField(c).alias(f"touch_{c}")
            for c in carry_cols
        ],
    ]
    return out.select(*sel)
