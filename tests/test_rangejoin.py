"""Binned range join: equivalence to the naive inequality join on the
events fixture, boundary semantics, and the no-nested-loop plan."""

import pyspark.sql.functions as F
import pytest

from hdfe_spark.operators.rangejoin import range_join
from hdfe_spark.plans import plan_report


def test_range_join_matches_naive(spark, sf_dir):
    """Clicks joined to each same-user purchase's 30-minute lookback
    window must equal the naive inequality join, for a bucket width
    equal to, smaller than, and larger than the window."""
    from hdfe_spark.sources.tables import ts_micros

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("ts", ts_micros(ev, "ts")).limit(4000)
    w_us = 30 * 60 * 1_000_000
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_start"),
        (F.col("ts") + w_us).alias("p_end"),
    )
    want = sorted(
        (r.user_id, r.c_ts, r.p_start)
        for r in clicks.join(pur, "user_id")
        .filter((F.col("c_ts") >= F.col("p_start")) & (F.col("c_ts") < F.col("p_end")))
        .collect()
    )
    for bw in (w_us, w_us // 3, 4 * w_us):
        got = sorted(
            (r.user_id, r.c_ts, r.p_start)
            for r in range_join(
                clicks, pur, "user_id", "c_ts", "p_start", "p_end", bw
            ).collect()
        )
        assert got == want, f"bucket_width={bw}"


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 19), (1, 20), (1, 9)], "k long, t long"
    )
    right = spark.createDataFrame([(1, 10, 20)], "k long, s long, e long")
    got = sorted(
        r.t for r in range_join(left, right, "k", "t", "s", "e", 7).collect()
    )
    assert got == [10, 19]  # start inclusive, end exclusive


def test_range_join_plan_no_nested_loop(spark):
    left = spark.range(1000).selectExpr("id % 7 AS k", "id * 100 AS t")
    right = spark.range(100).selectExpr(
        "id % 7 AS k", "id * 1000 AS s", "id * 1000 + 500 AS e"
    )
    plan = (
        range_join(left, right, "k", "t", "s", "e", 500)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_rejects_outer(spark):
    df = spark.range(1).selectExpr("id AS k", "id AS t", "id AS s", "id AS e")
    with pytest.raises(ValueError):
        range_join(df, df, "k", "t", "s", "e", 10, how="left")


def test_interval_overlap_join_exact_no_duplicates(spark):
    """Every overlapping pair exactly once — including pairs spanning
    many shared buckets (the case the representative-bucket trick
    exists for) — and empty/touching intervals match nothing."""
    from hdfe_spark.operators.rangejoin import interval_overlap_join

    a = spark.createDataFrame(
        [
            (1, 10, 0, 100),     # long: covers many buckets
            (1, 11, 50, 60),
            (1, 12, 200, 210),
            (1, 13, 300, 300),   # empty interval
            (2, 20, 0, 50),
        ],
        "k long, id_a long, s_a long, e_a long",
    )
    b = spark.createDataFrame(
        [
            (1, 90, 5, 95),      # overlaps 10 (many shared buckets), 11
            (1, 91, 99, 205),    # overlaps 10 (by 1), 12
            (1, 92, 100, 101),   # touches 10 at 100: half-open, NO match
            (2, 93, 50, 60),     # touches 20 at 50: NO match
        ],
        "k long, id_b long, s_b long, e_b long",
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(
            a, b, "k", "s_a", "e_a", "s_b", "e_b", bucket_width=10
        ).collect()
    )
    assert got == [(10, 90), (10, 91), (11, 90), (12, 91)]


def test_interval_overlap_join_matches_brute_force(spark):
    import pyspark.sql.functions as F

    from hdfe_spark.operators.rangejoin import interval_overlap_join

    a = (
        spark.range(0, 300)
        .selectExpr(
            "id % 7 AS k", "id AS id_a",
            "(id * 37) % 1000 AS s_a",
            "(id * 37) % 1000 + 1 + (id % 90) AS e_a",
        )
    )
    b = (
        spark.range(0, 300)
        .selectExpr(
            "id % 7 AS k", "id + 1000 AS id_b",
            "(id * 53) % 1000 AS s_b",
            "(id * 53) % 1000 + 1 + (id % 70) AS e_b",
        )
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(
            a, b, "k", "s_a", "e_a", "s_b", "e_b", bucket_width=64
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, "k")
        .filter((F.col("s_a") < F.col("e_b")) & (F.col("s_b") < F.col("e_a")))
        .collect()
    }
    assert got == want and len(got) > 100


def test_radius_join_matches_brute_force(spark):
    import numpy as np

    from hdfe_spark.operators.rangejoin import radius_join

    rng = np.random.default_rng(8)
    pa = rng.integers(0, 1000, (120, 2))
    pb = rng.integers(0, 1000, (150, 2))
    a = spark.createDataFrame(
        [(i, int(x), int(y)) for i, (x, y) in enumerate(pa)],
        "id long, x long, y long",
    )
    b = spark.createDataFrame(
        [(i, int(x), int(y)) for i, (x, y) in enumerate(pb)],
        "id long, x long, y long",
    )
    r = 75
    got = {
        (row["id_l"], row["id_r"])
        for row in radius_join(a, b, "x", "y", r).collect()
    }
    d2 = ((pa[:, None, :] - pb[None, :, :]) ** 2).sum(axis=2)
    want = {
        (i, j)
        for i in range(len(pa))
        for j in range(len(pb))
        if d2[i, j] <= r * r
    }
    assert got == want and len(want) > 100


def test_radius_join_negative_coords(spark):
    from hdfe_spark.operators.rangejoin import radius_join

    a = spark.createDataFrame([(1, -5, -5)], "id long, x long, y long")
    b = spark.createDataFrame(
        [(2, -8, -9), (3, 40, 0)], "id long, x long, y long"
    )
    got = radius_join(a, b, "x", "y", 10).collect()
    assert len(got) == 1 and got[0]["id_r"] == 2
