"""Plan-shape pins for the round-14 second-batch operators.

conformal_by must stay ONE scan + ONE segment-keyed exchange (three
chained Window ops over a single sort, groupBy reusing the
partitioning — no join, no Python stage). synthetic_control's output
series must stay ONE period-keyed aggregation with the weights
folded back as literals (no join, no window, no Python stage)."""

import pyspark.sql.functions as F
import pytest

from hdfe_spark.plans import assert_plan
from hdfe_spark.plans.audit import explain_string


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_conformal_by_single_scan_single_exchange(li):
    from hdfe_spark.operators.stats import conformal_by

    base = li.select(
        F.col("l_returnflag").alias("seg"),
        F.col("l_extendedprice").cast("double").alias("score"),
        (F.col("l_orderkey") % 3 > 0).alias("cal"),
    )
    out = conformal_by(base, "seg", "score", "cal", 0.1)
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0)
    s = explain_string(out)
    assert "Join" not in s
    assert s.count("Scan parquet") <= 2  # tree + detail of ONE scan
    # filters/pruning reach the scan
    assert "PushedFilters: [IsNotNull" in s


def test_synthetic_control_series_single_aggregation(spark):
    from hdfe_spark.operators.causal import synthetic_control

    rows = []
    for t in range(10):
        d1, d2 = float(3 + t % 5), float(10 + t % 7)
        rows += [("d1", t, d1), ("d2", t, d2),
                 ("tr", t, 2.0 * d1 + 0.5 * d2)]
    df = spark.createDataFrame(rows, "unit string, period int, y double")
    out = synthetic_control(df, "unit", "period", "y", "tr", 6)
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0)
    s = explain_string(out)
    assert "Join" not in s and "Window" not in s


def test_group_sequential_by_one_data_exchange(spark, sf_dir):
    from hdfe_spark.operators.stats import group_sequential_by

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        (F.col("user_id") % 5).cast("long").alias("segment"),
        (F.col("event_id") % 4 + 1).cast("long").alias("look"),
        "event_type", "value",
    )
    out = group_sequential_by(
        base, "segment", "event_type", "value", "look",
        "click", "view",
    )
    # one data-sized shuffle (the (group, look) aggregation with
    # map-side partials); the second exchange feeds the cumulative
    # window over the segment x look CELL table only
    assert_plan(out, n_exchanges=2, n_python_stages=0,
                n_sortmerge_joins=0)
    s = explain_string(out)
    assert "Join" not in s
    assert "partial" in s.lower() or "HashAggregate" in s
