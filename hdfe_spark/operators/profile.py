"""Data-distribution diagnostics for shuffle planning.

Beyond-reference surface: the reference (single-node numpy) never has
to reason about key distribution, but at cluster scale every
``groupBy``/``join`` shuffles on its key, and one hot key serializes a
whole stage. These operators produce the numbers that drive the
mitigation choices this engine already implements — salting factors
(``grouped_agg`` salted variant), AQE skew-join thresholds, and
broadcast-vs-shuffle decisions.

Plans: one partial-aggregated ``groupBy`` (map-side combine, k-row
result via ``TakeOrderedAndProject``) — the profile of a 100 TB key
column costs one scan and moves only per-key counts, never rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_stats(
    df: DataFrame,
    keys: Sequence[str] | str,
    top_k: int = 10,
) -> DataFrame:
    """Heavy-hitter profile of a prospective shuffle key.

    Returns the ``top_k`` hottest key values with, per key:

    - ``n_rows`` — exact row count;
    - ``share`` — fraction of all rows under this key;
    - ``skew_ratio`` — this key's count over the mean count across
      ALL distinct keys (>> 1 = salting candidate);
    - ``rank`` — 1-based hotness rank (count desc, key asc — total
      order, so the result is deterministic under any partitioning).

    Plan shape: one hash aggregate with map-side partials (the only
    full shuffle, and it moves counts, not rows), then a 1-row global
    summary broadcast back over the k survivors. At 100 TB this is a
    scan plus a per-distinct-key-sized exchange.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    order = [F.desc("n_rows"), *[F.asc(k) for k in keys]]
    # orderBy+limit plans as TakeOrderedAndProject (distributed
    # per-partition heaps, k rows to the driver side) — an
    # unpartitioned row_number window over ALL distinct keys would
    # instead sort every per-key count in one task. The window below
    # ranks only the k survivors.
    top = counts.orderBy(*order).limit(top_k)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            *keys,
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n_rows") * F.col("__n_keys") / F.col("__total"), 6
            ).alias("skew_ratio"),
        )
    )
