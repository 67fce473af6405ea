"""Bucketed-table layout: shuffle-free co-located joins and aggs.

The reference has no storage layer at all (SURVEY.md §2.5); at 100 TB
the dominant cost of a fact⋈fact join or a repeated groupBy is the
shuffle, and Spark's answer is bucketing: write the table hash-
partitioned AND sorted by the join/group key into a fixed number of
buckets (``DataFrameWriter.bucketBy``). Two tables bucketed the same
way join with ZERO Exchange nodes — each task zips bucket i with
bucket i — and a groupBy on the bucket key skips its Exchange too.

This module wraps the idiom so callers don't re-derive the contract:

- both sides must have the SAME bucket count and bucket keys;
- the join keys must be exactly the bucket keys;
- bucketed tables live in the session catalog (saveAsTable — Spark's
  bucketing metadata is catalog-only, a bare ``.parquet(path)`` write
  loses it);
- ``spark.sql.sources.bucketing.enabled`` (default true) and
  ``spark.sql.legacy.bucketedTableScan.outputOrdering`` control
  whether the scan exposes the layout to the planner.

Verified by ``tests/test_bucketing.py``: the bucketed join plan has
no shuffle Exchange (only the bucketed scans), vs ≥2 for the plain
parquet join of the same data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str] | str,
    n_buckets: int = 32,
    sort_cols: Sequence[str] | str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``n_buckets`` sizes the parallelism floor for every downstream
    co-located operation — pick it like ``spark.sql.shuffle.partitions``
    for the table's steady-state size, NOT its current size (buckets
    are forever; re-bucketing is a full rewrite).

    ``path`` pins the files as an EXTERNAL table at that location
    (bucketing metadata still catalog-tracked). Without it the table
    is managed and lands under ``spark.sql.warehouse.dir`` — a STATIC
    conf resolved from the process CWD at first catalog use, so
    callers that must not scatter files (the driver's vanilla session
    runs from an unknown CWD) should always pass ``path``.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sort_cols = (
        bucket_cols
        if sort_cols is None
        else ([sort_cols] if isinstance(sort_cols, str) else list(sort_cols))
    )
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
        .sortBy(sort_cols[0], *sort_cols[1:])
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed catalog table (bucketing metadata intact)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys —
    planned with zero shuffle Exchanges (bucket-co-located zip). The
    caller owns the precondition that both tables were written via
    ``write_bucketed`` with identical ``n_buckets``/``bucket_cols``;
    if they weren't, Spark silently falls back to shuffling one or
    both sides (assert with ``plans.assert_plan(df, n_exchanges=0)``
    in tests, as ``tests/test_bucketing.py`` does).
    """
    on = [on] if isinstance(on, str) else list(on)
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how
    )
