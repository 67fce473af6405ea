"""Snapshot/manifest table layer: atomic publish, time travel,
crash-isolation."""

import os

import pyspark.sql.functions as F
import pytest

from hdfe_spark.sources.snapshots import (
    current_version,
    publish_snapshot,
    read_snapshot,
    snapshot_versions,
)


def test_publish_read_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    df1 = spark.range(0, 100).withColumn("v", F.lit("a"))
    assert publish_snapshot(df1, root) == 0
    df2 = spark.range(0, 50).withColumn("v", F.lit("b"))
    assert publish_snapshot(df2, root) == 1

    assert current_version(root) == 1
    assert read_snapshot(spark, root).count() == 50          # latest
    old = read_snapshot(spark, root, version=0)              # time travel
    assert old.count() == 100 and old.select("v").first().v == "a"
    assert snapshot_versions(root) == [0, 1]


def test_unpublished_write_is_invisible(spark, tmp_path):
    """A crashed writer = data dir exists, pointer never flipped:
    readers still see the old version (isolation, not corruption)."""
    root = str(tmp_path / "t")
    publish_snapshot(spark.range(0, 10), root)
    # simulate a crash: v1 written, _LATEST not updated
    spark.range(0, 999).write.parquet(os.path.join(root, "v1"))
    assert current_version(root) == 0
    assert read_snapshot(spark, root).count() == 10
    # the next successful publish skips PAST the orphan (data dirs are
    # immutable, never reused) and becomes the published version
    assert publish_snapshot(spark.range(0, 5), root) == 2
    assert read_snapshot(spark, root).count() == 5


def test_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "none"))
