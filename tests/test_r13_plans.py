"""Plan-shape pins for the round-13 operators — the 100 TB checklist
asserted on physical plans (`test_plans.py` / `test_r12_plans.py`
style). The experimentation ops must stay aggregation-only (no
Window, no sort, no join, no Python stage) with the expected shuffle
count; ri_pvalue's fused permutation scan must stay ONE global
reduce regardless of n_perm."""

import pyspark.sql.functions as F
import pytest

from hdfe_spark.plans import assert_plan
from hdfe_spark.plans.audit import explain_string


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def od(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_cuped_by_single_group_exchange(li):
    from hdfe_spark.operators.stats import cuped_by

    base = li.select(
        F.col("l_linenumber").cast("long").alias("seg"),
        F.col("l_returnflag").alias("arm"),
        F.col("l_extendedprice").alias("y"),
        F.col("l_quantity").alias("x"),
    )
    out = cuped_by(base, "seg", "arm", "y", "x", "A", "R")
    # one group-keyed aggregation: partial->final over a single
    # hash exchange; pooled AND per-arm moments ride the same pass
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0)
    s = explain_string(out)
    assert "Window" not in s and "Sort" not in s


def test_smd_by_single_reduce(li):
    from hdfe_spark.operators.stats import smd_by

    out = smd_by(li, "l_returnflag",
                 ["l_quantity", "l_discount", "l_tax"], "A", "R")
    # ungrouped fused aggregation (one global reduce), then a
    # generate/stack projection — no second shuffle for the k rows
    assert_plan(out, n_exchanges=1, n_python_stages=0)
    s = explain_string(out)
    assert "Window" not in s and "Sort" not in s


def test_mde_by_single_group_exchange(spark, sf_dir):
    from hdfe_spark.operators.stats import mde_by

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        (F.col("user_id") % 10).cast("long").alias("segment"),
        "event_type", "value",
    )
    out = mde_by(base, "segment", "event_type", "value",
                 "click", "view")
    assert_plan(out, n_exchanges=1, n_python_stages=0)
    s = explain_string(out)
    assert "Window" not in s and "Sort" not in s


def test_ri_pvalue_one_fused_scan(od):
    """The permutation distribution must be ONE aggregation (plus the
    count-only calibration pre-pass that already ran at build time) —
    never a per-permutation rescan: the final plan carries a single
    global-reduce exchange and zero joins/windows even at n_perm=25
    (100 conditional aggregates)."""
    from hdfe_spark.operators.causal import ri_pvalue

    base = od.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        (F.col("o_custkey") % 2 == 0).alias("t"),
    )
    out = ri_pvalue(base, "y", "t", n_perm=25, id_col="id")
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0)
    s = explain_string(out)
    assert "Window" not in s and "Sort" not in s
