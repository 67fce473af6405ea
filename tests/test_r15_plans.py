"""Plan-shape pins for the round-15 operators.

The single-aggregation panel members (cuped2_by, mediation_by,
manski_bounds, regression_kink, wilson_ci_by, cohens_d_by, e_value,
iv_first_stage) must each stay ONE shuffle (ungrouped forms: one
partial/final agg pair, zero joins) with ZERO Python stages — the
{<= 1 exchange, 0 Python} contract the r14 panel pinned.
newey_west_by is the documented 3-pass shape: its joins must stay
BROADCAST (group-cardinality-sized heads, never sort-merge) and its
window must partition by group (never a global sort)."""

import pyspark.sql.functions as F
import pytest

from hdfe_spark.plans import assert_plan
from hdfe_spark.plans.audit import explain_string


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_cuped2_by_single_exchange(li):
    from hdfe_spark.operators.stats import cuped2_by

    base = li.select(
        F.col("l_linenumber").alias("seg"),
        F.col("l_returnflag").alias("arm"),
        F.col("l_extendedprice").alias("y"),
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
    )
    out = cuped2_by(base, "seg", "arm", "y", "x1", "x2", "A", "R")
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0, n_broadcast_joins=0)


def test_mediation_by_single_exchange(li):
    from hdfe_spark.operators.causal import mediation_by

    base = li.select(
        F.col("l_linenumber").alias("seg"),
        F.col("l_extendedprice").alias("y"),
        F.col("l_discount").alias("t"),
        F.col("l_quantity").alias("m"),
    )
    out = mediation_by(base, "seg", "y", "t", "m")
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0, n_broadcast_joins=0)


def test_cohens_d_by_single_exchange(ev):
    from hdfe_spark.operators.stats import cohens_d_by

    base = ev.select(
        (F.col("user_id") % 10).alias("seg"), "event_type", "value"
    )
    out = cohens_d_by(base, "seg", "event_type", "value",
                      "click", "view")
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0, n_broadcast_joins=0)


def test_wilson_ci_by_single_exchange(ev):
    from hdfe_spark.operators.stats import wilson_ci_by

    base = ev.select(
        (F.col("user_id") % 7).alias("seg"),
        F.when(F.col("event_id") % 3 == 0, F.lit(1.0))
        .otherwise(F.lit(0.0)).alias("s"),
    )
    out = wilson_ci_by(base, "seg", "s")
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0, n_broadcast_joins=0)


def test_ungrouped_scalar_panel_single_exchange(spark, li):
    """manski_bounds / regression_kink / e_value / iv_first_stage:
    ungrouped single-row outputs — one partial/final aggregation,
    zero joins, zero Python stages."""
    from hdfe_spark.operators.causal import (
        e_value,
        iv_first_stage,
        manski_bounds,
        regression_kink,
    )

    o = li.select(
        (F.col("l_orderkey") % 2 == 0).alias("t"),
        F.when(F.col("l_quantity") > 25, F.lit(1.0))
        .otherwise(F.lit(0.0)).alias("y"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("q"),
    )
    for out in (
        e_value(o, "t", "y"),
        iv_first_stage(
            li.select(F.col("l_quantity").alias("x"),
                      F.least(F.col("l_quantity"),
                              F.lit(25.0)).alias("z")),
            "x", "z",
        ),
        manski_bounds(
            o.select("t",
                     F.when(F.col("q") > 45,
                            F.lit(None).cast("double"))
                     .otherwise(F.col("price")).alias("y")),
            "y", "t", 0.0, 600000.0,
        ),
        regression_kink(li, "l_extendedprice", "l_quantity",
                        25.0, 10.0),
    ):
        assert_plan(out, n_exchanges=1, n_python_stages=0,
                    n_sortmerge_joins=0, n_broadcast_joins=0)


def test_newey_west_by_broadcast_heads_grouped_window(li):
    """The 3-pass HAC shape: BOTH head joins broadcast (the group
    tables are group-cardinality-sized — the gamma join would
    otherwise sort-merge), the lag window partitions by group with a
    LOCAL sort only (no RangePartitioning = no global single-task
    ordering anywhere), zero Python stages."""
    from hdfe_spark.operators.stats import newey_west_by
    from hdfe_spark.plans.audit import explain_string

    base = li.groupBy(
        F.col("l_linenumber").cast("long").alias("seg"),
        F.col("l_orderkey").alias("tt"),
    ).agg(
        F.sum((F.col("l_partkey") % 1000).cast("double")).alias("y"),
        F.sum(F.col("l_quantity")).alias("x"),
    )
    out = newey_west_by(base, "seg", "y", "x", "tt", max_lag=2)
    rep = assert_plan(out, n_python_stages=0, n_sortmerge_joins=0)
    assert rep["n_broadcast_joins"] >= 2
    simple = explain_string(out, "simple")
    assert "Window" in simple
    assert "rangepartitioning" not in simple.lower()
