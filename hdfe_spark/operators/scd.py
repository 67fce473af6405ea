"""Slowly-changing-dimension (SCD Type 2) interval builder: turn a
change/event stream into validity intervals per key.

The warehouse pattern the reference's panel machinery gestures at but
never materializes (its `make_lags` orders rows positionally within
an entity — ``hdfe/hdfe.py:253-263`` — which is exactly the ordered-
per-key structure SCD2 needs, minus the explicit time column Spark
requires): each observed state of a key is valid from its own
timestamp until the NEXT observation of the same key, the latest
state per key staying open (``valid_to`` NULL). Training-data uses:
point-in-time-correct feature joins ("the user's state AS OF the
example's timestamp" — an as-of join against these intervals never
leaks the future), audit trails, and dimension tables for
repeatable backfills.

Plan: one window function (``lead`` over ``partitionBy(key)
.orderBy(order)``) — a single hash shuffle on the key, every
partition processed in parallel (this is the partitioned window
Spark is good at, NOT the single-task global window
``operators/rank.py`` exists to avoid). Collapsing consecutive
duplicate states first (optional) is the same window plus a lag
filter — still one shuffle, reused by both steps.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    state_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
    collapse_unchanged: bool = False,
) -> DataFrame:
    """Build SCD2 validity intervals: one row per observed state of a
    key, columns ``key_cols + state_cols + (valid_from, valid_to)``
    where ``valid_from`` is the observation's ``order_col`` and
    ``valid_to`` the next observation's (NULL = still current).

    ``order_col`` (+ ``tiebreak_cols``) must totally order each key's
    observations — same contract as ``operators/rank.py``; ties
    without a tiebreak would make interval bounds nondeterministic.

    With ``collapse_unchanged=True``, consecutive observations whose
    ``state_cols`` are unchanged merge into one interval (the
    canonical SCD2 compaction): a row survives only if its state
    differs null-safely from the previous row's, then intervals are
    re-linked with the same window.
    """
    order = [F.col(order_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    if collapse_unchanged:
        state = F.struct(*[F.col(c) for c in state_cols])
        prev = F.lag(state).over(w)
        df = df.withColumn(
            "__chg", prev.isNull() | ~state.eqNullSafe(prev)
        ).filter(F.col("__chg")).drop("__chg")
        w = Window.partitionBy(*key_cols).orderBy(*order)
    return df.select(
        *key_cols,
        *state_cols,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w).alias("valid_to"),
    )
