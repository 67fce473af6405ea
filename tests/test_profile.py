"""Key-skew profiler tests: exact counts on a synthesized skewed
table, and the 100 TB plan shape (heap top-k, no global sort)."""

import pyspark.sql.functions as F

from hdfe_spark.operators.profile import key_skew_stats
from hdfe_spark.plans import plan_report


def test_key_skew_stats_counts(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_stats(df, "k", top_k=3).toPandas().set_index("rank")
    assert list(got.index) == [1, 2, 3]
    assert got.loc[1, "k"] == "hot" and got.loc[1, "n_rows"] == 60
    assert got.loc[2, "k"] == "warm" and got.loc[2, "n_rows"] == 30
    # tie at 5 rows: 'a' < 'b' wins rank 3 deterministically
    assert got.loc[3, "k"] == "a"
    assert abs(got.loc[1, "share"] - 0.6) < 1e-9
    # 4 distinct keys, mean 25 rows -> hot's skew_ratio = 60/25
    assert abs(got.loc[1, "skew_ratio"] - 2.4) < 1e-9


def test_key_skew_stats_plan(spark, sf_dir):
    """Top-k must compile to TakeOrderedAndProject (distributed
    per-partition heaps), not a single-task global sort over all
    distinct keys."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rep = plan_report(key_skew_stats(ev, "user_id", top_k=10))
    assert rep["has_take_ordered"]
