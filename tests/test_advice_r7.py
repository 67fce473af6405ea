"""Round-7 ADVICE regression tests: hard_negatives tie-break +
exact-cosine contract, ks_2sample decimal numerator, huber_irls2
degenerate guards, target_encode_loo prior population, ewma
duplicate-order loud failure, mahalanobis/ridge general-k paths,
kaplan_meier cell cap."""

import decimal
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.encoding import target_encode_loo
from hdfe_spark.operators.similarity import hard_negatives
from hdfe_spark.operators.stats import (
    ewma,
    huber_irls2,
    kaplan_meier,
    ks_2sample,
    ridge2,
)
from hdfe_spark.operators.validate import mahalanobis_outliers


# ---------------------------------------------------- hard_negatives


def test_hard_negatives_boundary_ties_keep_lowest_ids(spark):
    """>k corpus vectors tie exactly at the top-k boundary cosine
    (duplicate vectors): the survivors must be the LOWEST ids — the
    old argpartition truncation kept an arbitrary subset."""
    anchor = [1.0, 0.0]
    dup = [3.0, 4.0]          # cosine 0.6 with anchor, duplicated 8x
    closer = [9.0, 1.0]       # cosine ~0.994 -> excluded by hi=0.95
    mid = [1.0, 1.0]          # cosine ~0.707
    rows = [(0, mid)] + [(i, dup) for i in range(1, 9)] + [(9, closer)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = hard_negatives(
        df, np.array([anchor]), k=5, lo=0.2, hi=0.95,
    ).orderBy(F.desc("cosine"), "vec_id").collect()
    got = [(r["vec_id"], round(r["cosine"], 9)) for r in out]
    # mid first (0.707...), then the four LOWEST duplicate ids at 0.6
    assert [g[0] for g in got] == [0, 1, 2, 3, 4]
    assert got[1][1] == pytest.approx(0.6)


def test_hard_negatives_single_partition_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    corpus = np.round(rng.normal(size=(300, 8)) * 64)  # integer-valued
    queries = np.round(rng.normal(size=(3, 8)) * 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(corpus)],
        "vec_id long, embedding array<double>",
    ).repartition(7)
    got = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in hard_negatives(df, queries, k=4, lo=0.2, hi=0.95).collect()
    }
    # brute force with the operator's exact op order
    qn = np.sqrt((queries * queries).sum(axis=1))
    cn = np.sqrt((corpus * corpus).sum(axis=1))
    S = (corpus @ queries.T) / np.maximum(np.outer(cn, qn), 1e-30)
    exp = {}
    for q in range(3):
        cand = [
            (S[i, q], i) for i in range(300)
            if 0.2 <= S[i, q] < 0.95
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for s, i in cand[:4]:
            exp[(q, i)] = s
    assert set(got) == set(exp)
    for k_ in got:
        assert got[k_] == exp[k_]  # bit-identical, not approx


# ---------------------------------------------------------- ks_2sample


def test_ks_d_num_is_decimal(spark):
    rows = [("a", float(v)) for v in (1, 2, 3)] + [
        ("b", float(v)) for v in (2, 3, 4)
    ]
    df = spark.createDataFrame(rows, "side string, v double")
    out = ks_2sample(df, "side", "v", "a", "b")
    assert dict(out.dtypes)["d_num"] == "decimal(38,0)"
    r = out.collect()[0]
    assert isinstance(r["d_num"], decimal.Decimal)
    # ECDF gap at v=1: |1*3 - 0*3| = 3 -> D = 3/9
    assert int(r["d_num"]) == 3
    assert r["d"] == pytest.approx(3 / 9)


# ---------------------------------------------------------- huber


def test_huber_constant_x_raises(spark):
    df = spark.createDataFrame(
        [(1.0, float(y)) for y in range(5)], "x double, y double"
    )
    with pytest.raises(ValueError, match="degenerate design"):
        huber_irls2(df, "x", "y", delta=1.0)


def test_huber_empty_raises(spark):
    df = spark.createDataFrame(
        [(None, 1.0)], "x double, y double"
    )
    with pytest.raises(ValueError, match="no rows"):
        huber_irls2(df, "x", "y", delta=1.0)


# ------------------------------------------------- target_encode_loo


def test_target_encode_prior_excludes_null_categories(spark):
    """NULL-category rows with skewed targets must NOT bias the
    prior that singleton/unseen categories are pulled toward."""
    rows = (
        [("a", 1.0)] * 3
        + [("b", 3.0)] * 3          # population mean over cats = 2.0
        + [(None, 1000.0)] * 10     # skewed NULL-category block
        + [("single", 2.0)]
    )
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {
        r["cat"]: r["cat_te"]
        for r in target_encode_loo(
            df, "cat", "y", prior_weight=10.0
        ).select("cat", "cat_te").distinct().collect()
        if r["cat"] in (None, "single")
    }
    # prior mu over category-non-null rows: (3*1 + 3*3 + 2)/7 = 2.0
    mu = (3 * 1.0 + 3 * 3.0 + 2.0) / 7
    # singleton: (sum - own + m*mu)/(n - 1 + m) = (2 - 2 + 10*mu)/10 = mu
    assert out["single"] == pytest.approx(mu, abs=1e-9)
    assert out[None] == pytest.approx(mu, abs=1e-9)


def test_target_encode_empty_raises(spark):
    df = spark.createDataFrame([(None, 1.0)], "cat string, y double")
    with pytest.raises(ValueError, match="prior mean is undefined"):
        target_encode_loo(df, "cat", "y")


# ---------------------------------------------------------- ewma


def test_ewma_duplicate_order_raises(spark):
    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 1, 2.0), ("k", 2, 3.0)],
        "key string, o long, v double",
    )
    with pytest.raises(Exception, match="duplicate order"):
        ewma(df, "key", "o", "v", alpha=0.5).collect()


def test_ewma_unique_order_still_matches_pandas(spark):
    import pandas as pd

    vals = [3.0, 1.0, 4.0, 1.5, 9.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)],
        "key string, o long, v double",
    )
    got = ewma(df, "key", "o", "v", alpha=0.3).collect()[0]
    exp = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().iloc[-1]
    assert got["ewma"] == pytest.approx(exp, rel=1e-12)


# ------------------------------------------- mahalanobis general k


def test_mahalanobis_k3_matches_numpy(spark):
    rng = np.random.default_rng(5)
    X = np.round(rng.normal(size=(500, 3)), 6)
    X[0] = [8.0, -8.0, 8.0]  # a clear joint outlier
    df = spark.createDataFrame(
        [(i, *[float(v) for v in r]) for i, r in enumerate(X)],
        "id long, a double, b double, c double",
    )
    out = mahalanobis_outliers(
        df, ["a", "b", "c"], threshold=16.266
    ).collect()
    mu = X.mean(axis=0)
    C = np.cov(X, rowvar=False, bias=True)
    inv = np.linalg.inv(C)
    d2 = np.einsum("ij,jk,ik->i", X - mu, inv, X - mu)
    exp_ids = {i for i in range(500) if d2[i] > 16.266}
    assert {r["id"] for r in out} == exp_ids
    assert 0 in exp_ids
    got = {r["id"]: r["mahalanobis_sq"] for r in out}
    for i in exp_ids:
        assert got[i] == pytest.approx(d2[i], rel=1e-6)


def test_mahalanobis_k2_unchanged_closed_form(spark):
    rng = np.random.default_rng(6)
    X = np.round(rng.normal(size=(200, 2)), 6)
    X[0] = [9.0, -9.0]
    df = spark.createDataFrame(
        [(i, float(r[0]), float(r[1])) for i, r in enumerate(X)],
        "id long, a double, b double",
    )
    out = mahalanobis_outliers(df, ["a", "b"]).collect()
    assert 0 in {r["id"] for r in out}


def test_mahalanobis_singular_raises(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i, 1.0) for i in range(10)],
        "a double, b double, c double",
    )
    with pytest.raises(ValueError, match="singular covariance"):
        mahalanobis_outliers(df, ["a", "b", "c"])


# ------------------------------------------------- ridge general p


def test_ridge_p3_matches_numpy(spark):
    rng = np.random.default_rng(8)
    X = np.round(rng.normal(size=(400, 3)), 6)
    y = np.round(
        1.5 + X @ np.array([2.0, -1.0, 0.5]) + rng.normal(size=400) * 0.1,
        6,
    )
    df = spark.createDataFrame(
        [
            (float(a), float(b), float(c), float(t))
            for (a, b, c), t in zip(X, y)
        ],
        "x1 double, x2 double, x3 double, y double",
    )
    lam = 2.5
    got = ridge2(df, ["x1", "x2", "x3"], "y", lam=lam).collect()[0]
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    A = Xc.T @ Xc + lam * np.eye(3)
    b = np.linalg.solve(A, Xc.T @ yc)
    icept = y.mean() - b @ X.mean(axis=0)
    assert got["b_x1"] == pytest.approx(b[0], rel=1e-6)
    assert got["b_x2"] == pytest.approx(b[1], rel=1e-6)
    assert got["b_x3"] == pytest.approx(b[2], rel=1e-6)
    assert got["intercept"] == pytest.approx(icept, rel=1e-6)
    assert got["n"] == 400


# ------------------------------------------------- kaplan_meier cap


def test_kaplan_meier_cell_cap_raises(spark):
    df = spark.createDataFrame(
        [(i, True) for i in range(50)], "t long, ev boolean"
    )
    with pytest.raises(ValueError, match="cells exceed"):
        kaplan_meier(df, "t", "ev", max_cells=10)


def test_kaplan_meier_under_cap_ok(spark):
    df = spark.createDataFrame(
        [(1, True), (2, False), (2, True), (3, True)],
        "t long, ev boolean",
    )
    rows = kaplan_meier(df, "t", "ev", max_cells=10).collect()
    assert [r["t"] for r in rows] == [1, 2, 3]
    assert rows[0]["s"] == pytest.approx(1 - 1 / 4)
