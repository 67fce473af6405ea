"""Upsert sink tests: merge semantics (replace + append), partition
pruning of the base scan, and untouched-partition preservation."""

import pyspark.sql.functions as F

from hdfe_spark.sources.upsert import merge_upsert, merge_upsert_partitioned


def test_merge_upsert_replaces_and_appends(spark, tmp_path):
    base_p = str(tmp_path / "base")
    out_p = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).write.parquet(base_p)
    updates = spark.createDataFrame(
        [(2, "B2"), (9, "new")], "k long, v string"
    )
    merge_upsert(spark, base_p, updates, "k", out_p)
    got = {r.k: r.v for r in spark.read.parquet(out_p).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}


def test_merge_upsert_partitioned_touches_only_affected(spark, tmp_path):
    base_p = str(tmp_path / "pbase")
    stage_p = str(tmp_path / "stage")
    df = spark.createDataFrame(
        [(1, "p1", "a"), (2, "p1", "b"), (3, "p2", "c"), (4, "p3", "d")],
        "k long, part string, v string",
    )
    df.write.partitionBy("part").parquet(base_p)
    # remember p2/p3 file listing to prove untouched partitions keep
    # their physical files
    import glob

    before_p3 = sorted(glob.glob(f"{base_p}/part=p3/*.parquet"))

    updates = spark.createDataFrame(
        [(2, "p1", "B2"), (5, "p2", "e")], "k long, part string, v string"
    )
    parts = merge_upsert_partitioned(
        spark, base_p, updates, "k", "part", stage_p
    )
    assert sorted(parts) == ["p1", "p2"]
    got = {r.k: (r.part, r.v) for r in spark.read.parquet(base_p).collect()}
    assert got == {
        1: ("p1", "a"),
        2: ("p1", "B2"),
        3: ("p2", "c"),
        4: ("p3", "d"),
        5: ("p2", "e"),
    }
    # p3 was never rewritten: same physical files
    assert sorted(glob.glob(f"{base_p}/part=p3/*.parquet")) == before_p3


def test_partitioned_merge_raises_on_schema_drift(spark, tmp_path):
    """Round-5 ADVICE: the declared-schema read must not silently
    reshape a drifted non-empty base (base-only columns dropped,
    updates-only columns nulled, then rewritten). Drift -> raise."""
    import pytest

    from hdfe_spark.sources.upsert import merge_upsert_partitioned

    base_path = str(tmp_path / "base")
    staging = str(tmp_path / "staging")
    spark.createDataFrame(
        [(1, 10, "x", 1.0)], "id long, p long, extra string, v double"
    ).write.partitionBy("p").parquet(base_path)

    drifted = spark.createDataFrame(
        [(1, 10, 2.0)], "id long, p long, v double"  # 'extra' missing
    )
    with pytest.raises(ValueError, match="does not match"):
        merge_upsert_partitioned(
            spark, base_path, drifted, key="id",
            partition_col="p", staging_path=staging,
        )
    # matching schema still works
    ok = spark.createDataFrame(
        [(1, 10, "y", 2.0)], "id long, p long, extra string, v double"
    )
    merge_upsert_partitioned(
        spark, base_path, ok, key="id", partition_col="p",
        staging_path=staging,
    )
    rows = spark.read.parquet(base_path).collect()
    assert len(rows) == 1 and rows[0]["extra"] == "y"
