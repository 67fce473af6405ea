"""Copy-on-write MERGE (upsert) for parquet directories.

Beyond-reference surface: the reference does no I/O; a production
pipeline needs keyed updates ("re-score these documents", "replace
these users' rows"). Table formats (Delta/Iceberg/Hudi) solve this
with file-level metadata; this is the dependency-free parquet form
with the same plan discipline:

- **MERGE semantics**: update rows replace same-key base rows, new
  keys append — expressed as ``base LEFT ANTI updates ∪ updates``,
  one shuffle on the key (the anti-join), no driver-side data.
- **Partition-aware rewrite** (the scale path): with a
  ``partition_col``, only partitions the update batch touches are
  read (pushed-down ``isin`` → partition pruning at the scan) and
  only those are replaced (``partitionOverwriteMode=dynamic``), so
  the cost scales with the update's partition footprint, not the
  table. The touched-partition list is collected to the driver —
  it is partition *names*, bounded by the batch's spread, never data.
- Unpartitioned: full rewrite to a NEW directory (honest COW — no
  atomic in-place swap exists without a metadata layer, and Spark
  refuses to overwrite a path it is reading).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key: str,
    out_path: str,
) -> None:
    """Unpartitioned COW merge: full rewrite of ``base_path`` with
    ``updates`` applied, into ``out_path``."""
    base = spark.read.parquet(base_path)
    merged = base.join(
        updates.select(key).distinct(), key, "left_anti"
    ).unionByName(updates.select(*base.columns))
    merged.write.mode("overwrite").parquet(out_path)


def merge_upsert_partitioned(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
    staging_path: str,
) -> list:
    """Partition-pruned COW merge, in place via dynamic partition
    overwrite. Returns the list of partition values rewritten.

    PRECONDITION (same contract as Hudi's partitioned upsert without
    a global index): a key's partition value never changes. The
    anti-join only scans partitions the update batch touches, so an
    update that MOVES a key to a new partition value would leave the
    stale row alive in its old, unscanned partition — duplicate keys
    after the merge. Callers whose keys can migrate must delete from
    the old partition first (or use the unpartitioned
    ``merge_upsert``, which scans everything).

    The merged affected-partition data is staged to ``staging_path``
    first (Spark cannot overwrite a path that feeds the running plan),
    then dynamically overwrites ONLY the touched partitions of
    ``base_path``. Both writes move affected-partition bytes only.
    """
    parts = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    # The declared-schema read (updates.schema) exists ONLY for the
    # zero-file bootstrap (e.g. the first micro-batch of a streaming
    # MERGE sink), where inference fails and the empty read is just
    # 0 rows. For a NON-empty base, reading with updates.schema would
    # silently reshape drifted data — base-only columns dropped,
    # updates-only columns read as NULL — and then REWRITE the touched
    # partitions in that projected shape: silent data loss where the
    # old inference path failed loudly. So when the base has data
    # files, compare the inferred schema against the batch's and
    # refuse on drift.
    try:
        inferred = spark.read.parquet(base_path).schema
    except Exception:
        inferred = None  # zero-file bootstrap: nothing to drift from
    if inferred is not None:
        # The partition column's inferred type comes from parsing
        # directory names (p=10 -> int even when written from a long
        # column), so it is compared by NAME only; data columns are
        # dtype-strict.
        base_fields = sorted(
            (f.name, None if f.name == partition_col else f.dataType)
            for f in inferred.fields
        )
        upd_fields = sorted(
            (f.name, None if f.name == partition_col else f.dataType)
            for f in updates.schema.fields
        )
        if base_fields != upd_fields:
            raise ValueError(
                "merge_upsert_partitioned: update batch schema does not "
                f"match the existing base at {base_path!r}.\n"
                f"  base:    {base_fields}\n  updates: {upd_fields}\n"
                "A COW merge would rewrite touched partitions in the "
                "batch's shape (dropping base-only columns, nulling "
                "updates-only columns). Migrate the base explicitly "
                "first."
            )
    base = spark.read.schema(updates.schema).parquet(base_path).filter(
        F.col(partition_col).isin(parts)
    )
    merged = base.join(
        updates.select(key).distinct(), key, "left_anti"
    ).unionByName(updates.select(*base.columns))
    merged.write.mode("overwrite").parquet(staging_path)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            spark.read.parquet(staging_path)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(base_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return parts
