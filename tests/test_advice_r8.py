"""Round-8 ADVICE regression tests: weighted_quantiles decimal-scale
and negative-weight guards, seasonal_decompose NULL-order loud
failure, anova_oneway single-action totals, lm_score_buckets
unhinted vocabulary join, pca2 eigenvalue clamp."""

import math

import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.rank import weighted_quantiles
from hdfe_spark.operators.stats import anova_oneway, pca2, seasonal_decompose
from hdfe_spark.operators.text import lm_score_buckets


# ------------------------------------------------ weighted_quantiles


def test_weighted_quantiles_rejects_fractional_decimal_weights(spark):
    """DECIMAL(p, s>0) weights used to slip past the float-only guard
    and cast('long') silently truncated fractional mass."""
    df = spark.createDataFrame(
        [(1.0, "1.5"), (2.0, "2.5")], "v double, w string"
    ).select("v", F.col("w").cast("decimal(10,2)").alias("w"))
    with pytest.raises(ValueError, match="integral weights"):
        weighted_quantiles(df, "v", "w", [50])


def test_weighted_quantiles_accepts_integral_decimal_weights(spark):
    df = spark.createDataFrame(
        [(1.0, "1"), (2.0, "3")], "v double, w string"
    ).select("v", F.col("w").cast("decimal(10,0)").alias("w"))
    rows = weighted_quantiles(df, "v", "w", [25, 100]).orderBy("pct").collect()
    assert [(r["pct"], r["value"]) for r in rows] == [(25, 1.0), (100, 2.0)]


def test_weighted_quantiles_rejects_negative_weights(spark):
    """Negative weights make the cumulative sum non-monotone; the old
    code silently returned a wrong 'exact' quantile."""
    df = spark.createDataFrame(
        [(1.0, 5), (2.0, -3), (3.0, 4)], "v double, w long"
    )
    with pytest.raises(ValueError, match="negative weight"):
        weighted_quantiles(df, "v", "w", [50])


# ---------------------------------------------- seasonal_decompose


def test_seasonal_decompose_null_order_raises(spark):
    """NULL order rows were silently dropped — which shifts later
    rows' phases exactly like the loudly-rejected NULL values do."""
    rows = [("k", i, float(i % 3)) for i in range(12)]
    rows.append(("k", None, 9.9))
    df = spark.createDataFrame(rows, "k string, t long, v double")
    with pytest.raises(ValueError, match="NULL order"):
        seasonal_decompose(df, "k", "t", "v", period=3)


def test_seasonal_decompose_clean_series_still_works(spark):
    rows = [("k", i, float(i) + [0.0, 5.0, -2.0][i % 3]) for i in range(15)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = seasonal_decompose(df, "k", "t", "v", period=3).collect()
    assert len(out) == 13  # 15 - 2 edge rows
    for r in out:
        assert r["v"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["resid"], abs=1e-6
        )


# --------------------------------------------------- anova_oneway


def test_anova_totals_derived_from_cells(spark):
    """Totals now come from the collected cells (one action); the
    statistic must match the two-scan value — exact integer sums are
    order-free, so bit-identical."""
    rows = [("a", 1.0), ("a", 2.0), ("b", 4.0), ("b", 6.0), ("c", 3.0),
            ("c", 5.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    # hand computation (scale cancels in F): group sums 3, 10, 15
    vals = {"a": [1.0, 2.0], "b": [4.0, 6.0], "c": [3.0, 5.0, 7.0]}
    n = 7
    s = sum(sum(v) for v in vals.values())
    t = sum(sum(v) ** 2 / len(v) for v in vals.values())
    ssb = t - s * s / n
    ssw = sum(sum(x * x for x in v) for v in vals.values()) - t
    assert r["k"] == 3 and r["n"] == 7
    assert r["f_stat"] == pytest.approx((ssb / 2) / (ssw / 4), rel=1e-9)
    assert r["ssb"] == pytest.approx(ssb, rel=1e-9)
    assert r["ssw"] == pytest.approx(ssw, rel=1e-9)


# ------------------------------------------------ lm_score_buckets


def test_lm_buckets_plan_has_no_forced_vocab_broadcast(spark):
    """The corpus-vocabulary join must not carry an explicit
    broadcast hint (vocabulary size is unbounded); AQE picks the
    strategy from measured sizes instead."""
    df = spark.createDataFrame(
        [(i, "alpha beta gamma " + ("rare%d" % i)) for i in range(20)],
        "doc_id long, text string",
    )
    out = lm_score_buckets(df, n_buckets=2)
    plan = out._jdf.queryExecution().analyzed().toString()
    # exact_ntile's bounded per-partition offsets table is
    # legitimately hinted; the unbounded vocabulary count table must
    # not be — exactly ONE hint, and it's the offsets one
    hints = plan.split("ResolvedHint")[1:]
    assert len(hints) == 1
    assert "__off" in hints[0][:400]
    # and it still buckets correctly: equal tiers
    rows = out.collect()
    assert len(rows) == 20
    assert sorted(r["bucket"] for r in rows).count(1) == 10


# ------------------------------------------------------------- pca2


def test_pca2_var_explained_never_exceeds_one(spark):
    """Near-degenerate (rank-1) data: float cancellation could push
    lambda2 slightly negative, emitting var_explained > 1. Clamped."""
    # perfectly collinear points -> true lambda2 == 0
    rows = [(float(i), 2.0 * i + 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = pca2(df, "x", "y").collect()[0]
    assert r["lambda2"] >= 0.0
    assert r["var_explained"] <= 1.0
    assert r["var_explained"] == pytest.approx(1.0, abs=1e-12)
    # axis along (1, 2)/sqrt(5)
    assert r["v1x"] == pytest.approx(1.0 / math.sqrt(5.0), rel=1e-6)
    assert r["v1y"] == pytest.approx(2.0 / math.sqrt(5.0), rel=1e-6)
