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
