"""Pins for the round-10 /code-review findings on the eval-family
batch: 0/1 domain guards, empty-input counter zeros, hll_finalize's
negative-bucket/NULL-rho coverage, silhouette's wrong-dimension
raise, lift_table's distributed NTILE, and precision_at_k's
single-scan cutoffs."""

import pytest
from pyspark.sql import functions as F


def test_confusion_rejects_out_of_domain_labels(spark):
    from hdfe_spark.operators.ml import confusion_stats

    df = spark.createDataFrame([(2, 1), (1, 1)], "y long, p long")
    with pytest.raises(Exception, match="outside"):
        confusion_stats(df, "y", "p").collect()


def test_confusion_empty_input_counters_are_zero(spark):
    from hdfe_spark.operators.ml import confusion_stats

    df = spark.createDataFrame([], "y long, p long")
    r = confusion_stats(df, "y", "p").collect()[0]
    assert (r["n"], r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 0, 0)
    assert r["accuracy"] is None


def test_precision_at_k_rejects_out_of_domain(spark):
    from hdfe_spark.operators.ml import precision_at_k

    df = spark.createDataFrame(
        [(1, 1.0, 2)], "id long, s double, y long"
    )
    with pytest.raises(Exception, match="outside"):
        precision_at_k(df, "id", "s", "y", ks=[1]).collect()


def test_ndcg_rejects_negative_relevance(spark):
    from hdfe_spark.operators.ml import ndcg_by

    df = spark.createDataFrame(
        [("a", 1, 1.0, -1)], "q string, id long, s double, rel long"
    )
    with pytest.raises(Exception, match="negative relevance"):
        ndcg_by(df, "q", "id", "s", "rel").collect()


def test_lift_table_rejects_out_of_domain_and_has_no_window(spark):
    from hdfe_spark.operators.ml import lift_table

    bad = spark.createDataFrame([(1, 1.0, 3)], "id long, s double, y long")
    with pytest.raises(Exception, match="outside"):
        lift_table(bad, "id", "s", "y", n_buckets=2).collect()
    # the single-task ntile() Window must be gone from the plan
    ok = spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(8)],
        "id long, s double, y long",
    )
    plan = lift_table(ok, "id", "s", "y", n_buckets=2)._jdf
    assert "ntile" not in plan.queryExecution().executedPlan().toString()


def test_brier_rejects_out_of_domain_label(spark):
    from hdfe_spark.operators.ml import brier_score

    df = spark.createDataFrame([(2, 0.5)], "y long, p double")
    with pytest.raises(Exception, match="outside"):
        brier_score(df, "y", "p").collect()


def test_hll_finalize_rejects_negative_bucket_and_null_rho(spark):
    from hdfe_spark.operators.sketch import hll_finalize

    neg = spark.createDataFrame(
        [(-1, 5), (0, 3)], "__bkt long, __mx long"
    )
    with pytest.raises(Exception, match="inconsistent with b=8"):
        hll_finalize(neg, b=8).collect()
    nullmx = spark.createDataFrame(
        [(5, None), (1, 3)], "__bkt long, __mx long"
    )
    with pytest.raises(Exception, match="inconsistent with b=8"):
        hll_finalize(nullmx, b=8).collect()


def test_silhouette_raises_on_wrong_dimension(spark):
    from hdfe_spark.operators.similarity import silhouette_fixed

    cents = [[0.0, 0.0], [1.0, 0.0]]
    df = spark.createDataFrame(
        [(1, [0.5, 0.0, 0.0])], "id long, v array<float>"
    )
    with pytest.raises(Exception, match="dimension"):
        silhouette_fixed(df, "v", cents).collect()


def test_precision_at_k_single_scan(spark):
    # the per-cutoff agg used to re-run the TakeOrdered scan once
    # per k; the rewrite computes all cutoffs in ONE aggregation —
    # assert the union-of-aggs shape is gone (no Union in the plan)
    from hdfe_spark.operators.ml import precision_at_k

    df = spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(20)],
        "id long, s double, y long",
    )
    out = precision_at_k(df, "id", "s", "y", ks=(2, 5, 10))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    got = {r["k"]: r["n_rel_at_k"] for r in out.collect()}
    # scores desc = ids desc; odd ids are relevant; top2 = {19, 18}
    assert got == {2: 1, 5: 3, 10: 5}


def test_spearman_by_null_group_is_a_group(spark):
    # review r10b: the rank joins must be NULL-SAFE on the group key
    from hdfe_spark.operators.stats import spearman_by

    df = spark.createDataFrame(
        [(None, 1.0, 1.0), (None, 2.0, 3.0), (None, 3.0, 2.0),
         ("a", 1.0, 2.0), ("a", 2.0, 4.0)],
        "g string, x double, y double",
    )
    out = {r["g"]: r for r in spearman_by(df, "g", "x", "y").collect()}
    assert None in out and out[None]["n"] == 3
    assert out[None]["rho"] == 0.5  # ranks (1,2,3) vs (1,3,2)
    assert out["a"]["rho"] == 1.0


def test_spearman_by_constant_gate_uses_exact_moments(spark):
    # the gate must run on exact DECIMAL moments; with doubles a
    # constant column's variance cancels to nonzero past 2^53
    # (measured at n=10M in the review) — pin the small case AND
    # the decimal expression by checking NULL, not near-zero
    from hdfe_spark.operators.stats import spearman_by

    df = spark.createDataFrame(
        [("c", 1.0, float(i)) for i in range(50)],
        "g string, x double, y double",
    )
    assert spearman_by(df, "g", "x", "y").collect()[0]["rho"] is None


def test_calibration_bins_plan_has_no_sort(spark):
    from hdfe_spark.operators.ml import calibration_bins

    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.1)], "y long, p double"
    )
    plan = calibration_bins(df, "y", "p")._jdf
    assert "Sort" not in plan.queryExecution().executedPlan().toString()
