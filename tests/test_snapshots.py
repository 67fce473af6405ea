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


def test_concurrent_publishers_never_share_a_version(spark, tmp_path):
    """Round-6 stress finding, pinned: Spark's mode('error') existence
    check is check-then-write and races — two writers computing the
    same next version both passed it and interleaved their files in
    one v0/. The mkdir claim makes version ownership atomic: every
    committed version holds exactly one writer's complete data."""
    import threading

    root = str(tmp_path / "t")
    published = {}
    lock = threading.Lock()

    def writer(marker):
        for _ in range(4):
            df = spark.range(0, 200).selectExpr("id", f"{marker} AS w")
            v = publish_snapshot(df, root)
            with lock:
                assert v not in published, f"version {v} claimed twice"
                published[v] = marker

    ts = [threading.Thread(target=writer, args=(m,)) for m in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(published) == 8
    assert sorted(published) == list(range(8))  # dense chain, no gaps
    for v, marker in published.items():
        got = read_snapshot(spark, root, v)
        assert got.count() == 200
        assert [r[0] for r in got.select("w").distinct().collect()] == [marker]


def test_pointer_flip_is_monotonic(spark, tmp_path):
    """A slow writer whose version was claimed earlier must not
    regress _LATEST after a newer version published."""
    from hdfe_spark.sources.snapshots import _flip_pointer

    root = str(tmp_path / "t")
    publish_snapshot(spark.range(0, 10), root)   # v0
    publish_snapshot(spark.range(0, 20), root)   # v1 -> latest
    assert current_version(root) == 1
    assert _flip_pointer(root, 0) is False       # stale flip refused
    assert current_version(root) == 1


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    from hdfe_spark.sources.snapshots import snapshot_diff

    root = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, s string, v long",
    )
    publish_snapshot(v0, root)
    v1 = spark.createDataFrame(
        [(2, "b", 20), (3, "C", 30), (4, "d", 40)],  # 1 gone, 3 changed, 4 new
        "id long, s string, v long",
    )
    publish_snapshot(v1, root)
    got = {
        (r["change"], r["id"], r["s"], r["v"])
        for r in snapshot_diff(spark, root, 0, 1, ["id"]).collect()
    }
    assert got == {
        ("delete", 1, "a", 10),   # old values for deletes
        ("update", 3, "C", 30),   # new values for updates
        ("insert", 4, "d", 40),
    }


def test_snapshot_diff_null_safe_and_schema_guard(spark, tmp_path):
    import pytest

    from hdfe_spark.sources.snapshots import snapshot_diff

    root = str(tmp_path / "t")
    publish_snapshot(
        spark.createDataFrame([(1, None), (2, "x")], "id long, s string"), root
    )
    publish_snapshot(
        spark.createDataFrame([(1, None), (2, None)], "id long, s string"), root
    )
    got = {
        (r["change"], r["id"])
        for r in snapshot_diff(spark, root, 0, 1, ["id"]).collect()
    }
    # NULL == NULL for change detection (null-safe): id 1 unchanged.
    assert got == {("update", 2)}
    publish_snapshot(
        spark.createDataFrame([(1, 5)], "id long, other long"), root
    )
    with pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(spark, root, 1, 2, ["id"])


def test_apply_diff_roundtrip(spark, tmp_path):
    """diff then apply must reconstruct the target version exactly —
    the property that makes snapshot_diff a faithful incremental
    transport."""
    from hdfe_spark.sources.snapshots import apply_diff, snapshot_diff

    root = str(tmp_path / "t")
    v0 = spark.range(0, 500).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS s", "id * 3 AS v"
    )
    publish_snapshot(v0, root)
    v1 = (
        spark.range(100, 650)
        .selectExpr(
            "id",
            "CASE WHEN id % 11 = 0 THEN 'mut' ELSE CAST(id % 7 AS STRING) END AS s",
            "id * 3 AS v",
        )
    )
    publish_snapshot(v1, root)
    d = snapshot_diff(spark, root, 0, 1, ["id"])
    rebuilt = apply_diff(read_snapshot(spark, root, 0), d, ["id"])
    want = read_snapshot(spark, root, 1)
    assert rebuilt.exceptAll(want).count() == 0
    assert want.exceptAll(rebuilt).count() == 0
    assert rebuilt.count() == want.count()
