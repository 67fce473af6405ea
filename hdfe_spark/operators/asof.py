"""As-of (most-recent-prior) joins — the panel-data alignment
operator Spark lacks natively.

``asof_join(left, right)`` attaches to every left row the right row
with the greatest ``right_ts ≤ left_ts`` for the same entity
(``direction="backward"``, ties inclusive — the pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` contract).

Scale design: NOT a range join (which Catalyst plans as a broadcast
nested loop or a cartesian per key). Instead the two sides are tagged
and UNIONed, one window pass per entity ordered by (ts, side) carries
the last right row forward as an atomic struct, and left rows are
filtered back out — one shuffle+sort on the entity key, linear in
rows, the same cost class as any grouped window op. This is the
standard log-merge formulation and survives 100× scale wherever a
window agg does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt) -> bool:
    """Whether Spark can sort on this type (maps cannot be orderBy
    keys; arrays/structs are orderable iff their element types are)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _order_proxy(col, dt):
    """An orderable, content-derived sort proxy for ``col``, or None.
    Orderable types sort as themselves; a map with orderable keys and
    values sorts as its key-sorted entry list (``array_sort ∘
    map_entries`` — arrays of structs ARE orderable), so even all-map
    right rows tiebreak deterministically by CONTENT, not arrival
    order. Only a map nested inside another map's values stays
    proxy-less (no deterministic rendering without recursion Spark's
    type system can't express in one expression)."""
    if _orderable(dt):
        return col
    if (
        isinstance(dt, T.MapType)
        and _orderable(dt.keyType)
        and _orderable(dt.valueType)
    ):
        return F.array_sort(F.map_entries(col))
    return None


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: every left row gains
    ``<col><suffix>`` columns from the latest right row at or before
    its timestamp (NULL when no prior right row exists).

    ``right_cols`` defaults to every right column except the key and
    timestamp. A right timestamp equal to ``left_ts`` is included
    (ties resolve to the right row — pandas ``merge_asof`` / DuckDB
    ``ASOF JOIN`` ``>=`` semantics). The right row is carried as one
    struct, so its columns stay row-consistent even with NULLs.
    """
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    rstruct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    r_type = rhs.schema["__r"].dataType

    lhs = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    rhs = rhs.select(*lhs.columns)

    merged = lhs.unionByName(rhs)
    # right (side 0) sorts before left (side 1) at equal timestamps,
    # so `last ignoring nulls` includes ties — the >= contract. The
    # carried struct's orderable content is the final sort key so
    # DUPLICATE right rows at one (key, ts) resolve deterministically
    # (greatest value wins, every run) instead of whichever the
    # shuffle delivered last. Map-typed right columns can't be sort
    # keys directly (Spark rejects them at analysis) — they tiebreak
    # via their key-sorted entry lists (`_order_proxy`), so even an
    # all-map right side picks by content; only a map nested inside a
    # map's values stays outside the tiebreak.
    tiebreak = []
    for f in r_type.fields:
        proxy = _order_proxy(F.col("__r").getField(f.name), f.dataType)
        if proxy is not None:
            tiebreak.append(proxy)
    if not tiebreak:
        # Last resort for a right side whose EVERY column is
        # unorderable even via proxy (map nested in map values):
        # to_json of the carried struct. Deterministic for a given
        # stored row; two semantically-equal maps serialized with
        # different entry order could still rank apart — documented
        # residual, strictly better than shuffle-order nondeterminism.
        tiebreak.append(F.to_json(F.col("__r")))
    order_keys = [F.col("__t"), F.col("__side")]
    order_keys.append(F.struct(*tiebreak))
    w = (
        Window.partitionBy(on)
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "__r", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[
                F.col("__r").getField(c).alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
    )
