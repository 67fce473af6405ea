"""Plan-shape pins for the round-12 econometrics/causal panel — the
100 TB checklist asserted on physical plans, `test_plans.py` style.
Every operator here must stay: aggregation-only (no Window, no sort,
no join), Python-free, and with the expected shuffle count — a
regression that adds a shuffle or drops to a Python stage fails here,
not on the cluster."""

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


def test_did_single_reduce_no_window(od):
    from hdfe_spark.operators.causal import did

    base = od.select(
        F.col("o_totalprice").alias("y"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("t"),
        (F.col("o_totalprice") > 150000).alias("p"),
    )
    out = did(base, "y", "t", "p")
    # global aggregate: one partial->final exchange pair collapses to
    # a single-partition exchange; nothing else.
    rep = assert_plan(out, n_exchanges=1, n_python_stages=0,
                      n_sortmerge_joins=0)
    s = explain_string(out)
    assert "Window" not in s and "Sort" not in s


def test_ipw_single_reduce_no_window(od):
    from hdfe_spark.operators.causal import ipw_ate

    base = od.select(
        F.col("o_totalprice").alias("y"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("t"),
        F.lit(0.4).alias("e"),
    )
    out = ipw_ate(base, "y", "t", "e")
    assert_plan(out, n_exchanges=1, n_python_stages=0)
    s = explain_string(out)
    assert "Window" not in s and "Sort" not in s


def test_rdd_single_reduce(li):
    from hdfe_spark.operators.causal import rdd

    out = rdd(li, "l_extendedprice", "l_quantity", 25.0, 10.0)
    assert_plan(out, n_exchanges=1, n_python_stages=0)
    s = explain_string(out)
    assert "Window" not in s and "Sort" not in s


def test_aipw_single_reduce(od):
    from hdfe_spark.operators.causal import aipw_ate

    base = od.select(
        F.col("o_totalprice").alias("y"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("t"),
        F.lit(0.4).alias("e"),
        (F.col("o_totalprice") * 0.5).alias("mu1"),
        (F.col("o_totalprice") * 0.4).alias("mu0"),
    )
    out = aipw_ate(base, "y", "t", "e", "mu1", "mu0")
    assert_plan(out, n_exchanges=1, n_python_stages=0)
    s = explain_string(out)
    assert "Window" not in s and "Sort" not in s


def test_event_study_grouped_agg_only(od):
    """Period-grouped aggregate: one hash exchange on the period key,
    no window, no join — the base row folds in as literals."""
    from hdfe_spark.operators.causal import event_study

    base = od.select(
        F.col("o_totalprice").alias("y"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("t"),
        F.year("o_orderdate").cast("int").alias("k"),
    )
    out = event_study(base, "y", "t", "k", 1996)
    s = explain_string(out)
    assert "Window" not in s
    assert "Join" not in s
    assert "BatchEvalPython" not in s and "ArrowEval" not in s


def test_cluster_meat_is_two_aggregations_no_collect_shape(li):
    """The distributed meat: cluster-keyed partial/final aggregation,
    then a global reduce — k(k+1)/2 doubles out. No window, no sort,
    no Python; exactly two logical aggregation layers (≤ 2 hash
    exchanges: one on the cluster key, one single-partition)."""
    from hdfe_spark.operators.estimate import _append_residuals

    # Build the meat's grouped stage directly via the public path:
    # estimate() with cluster executes it eagerly, so here reproduce
    # the plan from the helper to pin its shape.
    import numpy as np

    from pyspark.sql import functions as SF

    with_resid = _append_residuals(
        li.select("l_quantity", "l_discount", "l_extendedprice",
                  "l_suppkey", "l_partkey"),
        ["l_extendedprice"], ["l_quantity", "l_discount"],
        np.array([[900.0], [100.0]]),
    )
    grouped = with_resid.groupBy("l_suppkey", "l_partkey").agg(
        SF.sum(SF.col("resid_l_extendedprice") * SF.col("l_quantity"))
        .alias("u1"),
        SF.sum(SF.col("resid_l_extendedprice") * SF.col("l_discount"))
        .alias("u2"),
    )
    out = grouped.agg(
        SF.sum(SF.col("u1") * SF.col("u1")).alias("m11"),
        SF.sum(SF.col("u1") * SF.col("u2")).alias("m12"),
        SF.sum(SF.col("u2") * SF.col("u2")).alias("m22"),
    )
    assert_plan(out, n_python_stages=0, n_exchanges_max=2)
    s = explain_string(out)
    assert "Window" not in s and "SortMergeJoin" not in s


def test_iv_moment_pass_single_reduce(li):
    """iv_2sls's fused moment block is ONE global aggregation: pin
    the equivalent projection+agg plan (the operator collects it
    eagerly, so the shape is reproduced from the same expressions)."""
    z = F.least(F.col("l_quantity"), F.lit(25.0))
    out = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(z * F.col("l_quantity")).alias("zx11"),
        F.sum(z * F.col("l_discount")).alias("zx12"),
        F.sum(F.col("l_discount") * F.col("l_quantity")).alias("zx21"),
        F.sum(F.col("l_discount") * F.col("l_discount")).alias("zx22"),
        F.sum(z * F.col("l_extendedprice")).alias("r1"),
        F.sum(F.col("l_discount") * F.col("l_extendedprice")).alias("r2"),
    )
    assert_plan(out, n_exchanges=1, n_python_stages=0)
