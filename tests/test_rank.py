"""Exact distributed rank/ntile (``operators/rank.py``): must equal
the single-partition window answer bit-for-bit, with no Window
operator (and hence no one-task global sort) in the plan."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from hdfe_spark.plans import explain_string
from hdfe_spark.operators.rank import exact_ntile, global_rank


def test_global_rank_matches_window_row_number(spark):
    df = (
        spark.range(0, 5000)
        .withColumn("v", (F.col("id") * 2654435761) % 1000)  # many ties
    )
    w = Window.orderBy("v", "id")
    want = {
        (r["id"], r["rn"])
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    got = {
        (r["id"], r["rank"])
        for r in global_rank(df, ["v", "id"], num_partitions=7).collect()
    }
    assert got == want


def test_exact_ntile_matches_window_ntile(spark):
    # 5003 rows, 10 tiles: N % k != 0 exercises the uneven-first-tiles
    # branch of NTILE semantics.
    df = spark.range(0, 5003).withColumn("v", (F.col("id") * 48271) % 500)
    w = Window.orderBy("v", "id")
    want = {
        (r["id"], r["t"])
        for r in df.select("id", F.ntile(10).over(w).alias("t")).collect()
    }
    got = {
        (r["id"], r["tile"])
        for r in exact_ntile(df, ["v", "id"], 10, num_partitions=5).collect()
    }
    assert got == want


def test_rank_plan_has_no_window_operator(spark):
    df = spark.range(0, 1000).withColumn("v", F.col("id") % 97)
    ranked = global_rank(df, ["v", "id"], num_partitions=4)
    plan = explain_string(ranked, "simple")
    assert "Window" not in plan  # the single-task funnel never appears
    tiled = exact_ntile(df, ["v", "id"], 10, num_partitions=4)
    assert "Window" not in explain_string(tiled, "simple")


def test_rank_partition_count_independent(spark):
    """Ranks are a pure function of the data — partitioning must not
    leak into the answer."""
    df = spark.range(0, 2000).withColumn("v", F.col("id") % 3)  # huge ties
    a = sorted(
        r["rank"] for r in global_rank(df, ["v", "id"], num_partitions=2).collect()
    )
    b = sorted(
        r["rank"] for r in global_rank(df, ["v", "id"], num_partitions=13).collect()
    )
    assert a == b == list(range(1, 2001))


def test_prefix_sum_matches_window_cumsum(spark):
    from hdfe_spark.operators.rank import prefix_sum

    df = spark.range(0, 5000).withColumn("v", (F.col("id") * 37) % 101)
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r["id"], r["c"])
        for r in df.select("id", F.sum("v").over(w).alias("c")).collect()
    }
    got = {
        (r["id"], r["cumsum"])
        for r in prefix_sum(df, ["id"], "v", num_partitions=7).collect()
    }
    assert got == want


def test_prefix_sum_plan_has_no_global_window(spark):
    """The per-partition window is fine (parallel); what must never
    appear is a single-partition sort feeding it."""
    from hdfe_spark.operators.rank import prefix_sum
    from hdfe_spark.plans import explain_string

    df = spark.range(0, 1000).withColumn("v", F.col("id") % 7)
    plan = explain_string(prefix_sum(df, ["id"], "v", num_partitions=4), "simple")
    assert "SinglePartition" not in plan


def test_pack_sequences_bins_and_offsets(spark):
    from hdfe_spark.operators.packing import pack_sequences

    rows = [(1, 3000), (2, 3000), (3, 3000), (4, 100), (5, 9000)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        (r.doc_id, r.bin, r.offset)
        for r in pack_sequences(df, "n", ["doc_id"], 8192).collect()
    }
    # prefixes: 0, 3000, 6000, 9000, 9100
    assert got == {
        (1, 0, 0),
        (2, 0, 3000),
        (3, 0, 6000),
        (4, 1, 808),
        (5, 1, 908),
    }


def test_prefix_sum_raises_on_float_value_col(spark):
    """Float addition is non-associative: the distributed blocked sum
    is not bit-exact, so hash-verified pipelines must not use it
    silently (same guard pattern as bloom's key-dtype raise)."""
    import pytest

    from hdfe_spark.operators.rank import prefix_sum

    df = spark.range(0, 100).withColumn(
        "v", (F.col("id") % 7).cast("double")
    )
    with pytest.raises(ValueError, match="non-associative"):
        prefix_sum(df, ["id"], "v", num_partitions=4)
    # Opt-in still works and matches the window answer on this
    # exactly-representable fixture.
    got = {
        (r["id"], r["cumsum"])
        for r in prefix_sum(
            df, ["id"], "v", num_partitions=4, allow_float=True
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r["id"], r["c"])
        for r in df.select("id", F.sum("v").over(w).alias("c")).collect()
    }
    assert got == want


def test_prefix_sum_int32_offsets_are_long(spark):
    """The broadcast offset table must carry Spark's sum result type
    (long), not value_col's own int32 — cumulative offsets of an int
    column overflow int32 once the corpus total passes 2^31. Values
    near int32-max make any narrow-typed offset path blow up."""
    from hdfe_spark.operators.rank import prefix_sum

    big = 2_000_000_000  # 3 rows -> offsets up to 4e9 > int32 max
    df = spark.range(0, 3).withColumn("v", F.lit(big).cast("int"))
    out = prefix_sum(df, ["id"], "v", num_partitions=3)
    assert dict(out.dtypes)["cumsum"] == "bigint"
    got = sorted(r["cumsum"] for r in out.collect())
    assert got == [big, 2 * big, 3 * big]


def test_prefix_sum_decimal_value_col_exact(spark):
    """DecimalType path: offsets widen to Spark's sum result type
    decimal(p+10, s); the running total stays exact."""
    import decimal

    from hdfe_spark.operators.rank import prefix_sum

    df = spark.range(0, 50).withColumn(
        "v", (F.col("id") % 9).cast("decimal(10,2)")
    )
    out = prefix_sum(df, ["id"], "v", num_partitions=5)
    rows = sorted(
        ((r["id"], r["cumsum"]) for r in out.collect())
    )
    acc = decimal.Decimal(0)
    for i, (rid, c) in enumerate(rows):
        acc += i % 9
        assert rid == i and c == acc
