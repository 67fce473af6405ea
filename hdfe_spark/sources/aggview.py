"""Incremental aggregate-view maintenance (insert-only deltas).

The materialized-view half of a warehouse lifecycle the engine's
snapshot/upsert sinks don't cover yet: keep a keyed aggregate table
(count / sum / min / max per group) current as new fact rows arrive,
WITHOUT rescanning the base facts. Classic self-maintainable-view
theory (Gupta & Mumick's incremental view maintenance): for
insert-only deltas, these four aggregates are distributive/algebraic,
so `refresh(base_agg, delta) = aggregate(base_facts ∪ delta)` holds
exactly — and the driver query `agg_refresh` proves that identity
against a full-recompute oracle.

100 TB shape: refresh cost is one aggregation of the DELTA plus one
key-partitioned outer join against the AGG table (group-cardinality
sized, typically orders of magnitude smaller than facts) — never a
base-fact scan. DELETES are out of contract for min/max (not
self-maintainable without auxiliary state); `refresh_agg` is
insert-only by documented contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# measure spec: (output_col, kind, source_expr) where kind in
# {"count", "sum", "min", "max"} and source_expr is a Column (ignored
# for count).
Measure = tuple


def aggregate_view(
    facts: DataFrame, keys: Sequence[str], measures: Sequence[Measure]
) -> DataFrame:
    """Build the aggregate table: one row per key combination."""
    aggs = []
    for out, kind, src in measures:
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind == "sum":
            aggs.append(F.sum(src).alias(out))
        elif kind == "min":
            aggs.append(F.min(src).alias(out))
        elif kind == "max":
            aggs.append(F.max(src).alias(out))
        else:
            raise ValueError(f"unsupported aggregate kind: {kind}")
    return facts.groupBy(*keys).agg(*aggs)


def refresh_agg(
    base_agg: DataFrame,
    delta_facts: DataFrame,
    keys: Sequence[str],
    measures: Sequence[Measure],
) -> DataFrame:
    """Merge an insert-only delta into ``base_agg`` (built by
    ``aggregate_view`` with the SAME keys/measures): aggregate the
    delta, full-outer join on the keys, and combine column-wise —
    count/sum add (null ≡ absent ≡ 0), min/max take least/greatest
    (Spark's least/greatest skip nulls, which is exactly the
    absent-side semantics needed). New keys appear, untouched keys
    pass through unchanged."""
    delta_agg = aggregate_view(delta_facts, keys, measures)
    b, d = base_agg.alias("b"), delta_agg.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"b.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    joined = b.join(d, cond, "full_outer")
    out_cols: list[Column] = [
        F.coalesce(F.col(f"b.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    for out, kind, _src in measures:
        bb, dd = F.col(f"b.{out}"), F.col(f"d.{out}")
        if kind in ("count", "sum"):
            merged = F.coalesce(bb, F.lit(0)) + F.coalesce(dd, F.lit(0))
        elif kind == "min":
            merged = F.least(bb, dd)
        else:  # max
            merged = F.greatest(bb, dd)
        out_cols.append(merged.alias(out))
    return joined.select(*out_cols)
