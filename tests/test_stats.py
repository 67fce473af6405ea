"""Welch t-test, chi-squared independence, ridge closed form, EWMA
fold — each checked against an independent reference computation
(scipy-free: closed forms on tiny fixtures)."""

import math

import numpy as np
import pytest

from hdfe_spark.operators.stats import (
    chi2_independence,
    ewma,
    ridge2,
    welch_ttest,
)


def test_welch_ttest_matches_numpy(spark):
    rng = np.random.default_rng(7)
    a = np.round(rng.normal(10.0, 2.0, 400), 6)
    b = np.round(rng.normal(10.5, 3.0, 300), 6)
    df_a = spark.createDataFrame([(float(v),) for v in a], "v double")
    df_b = spark.createDataFrame([(float(v),) for v in b], "v double")
    got = welch_ttest(df_a, df_b, "v").collect()[0]
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["mean_a"] == pytest.approx(a.mean(), rel=1e-9)
    assert got["var_b"] == pytest.approx(vb, rel=1e-9)
    assert got["t_stat"] == pytest.approx(t, rel=1e-9)
    assert got["dof"] == pytest.approx(dof, rel=1e-9)


def test_welch_ttest_rejects_tiny(spark):
    one = spark.createDataFrame([(1.0,)], "v double")
    two = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="2 non-null"):
        welch_ttest(one, two, "v")


def test_chi2_independence_2x2_closed_form(spark):
    # classic 2x2: obs [[10, 20], [30, 40]]
    rows = (
        [("x", "p")] * 10
        + [("x", "q")] * 20
        + [("y", "p")] * 30
        + [("y", "q")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = {
        (r["a"], r["b"]): r
        for r in chi2_independence(df, "a", "b").collect()
    }
    assert len(out) == 4
    # margins: x=30, y=70, p=40, q=60, N=100
    cell = out[("x", "p")]
    assert cell["obs"] == 10
    assert cell["expected"] == pytest.approx(30 * 40 / 100.0)
    assert cell["chi2_term"] == pytest.approx((10 - 12.0) ** 2 / 12.0)
    chi2 = sum(r["chi2_term"] for r in out.values())
    # classic formula for 2x2: N(ad-bc)^2 / (row1 row2 col1 col2)
    expect = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert chi2 == pytest.approx(expect, rel=1e-12)


def test_ewma_matches_pandas_recursion(spark):
    import pandas as pd

    rows = [(1, i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9])]
    rows += [(2, 0, 7.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = {
        r["k"]: r for r in ewma(df, "k", "t", "v", alpha=0.5).collect()
    }
    want = (
        pd.Series([3, 1, 4, 1, 5, 9], dtype=float)
        .ewm(alpha=0.5, adjust=False)
        .mean()
        .iloc[-1]
    )
    assert got[1]["ewma"] == pytest.approx(want, rel=1e-12)
    assert got[1]["n"] == 6
    assert got[2]["ewma"] == 7.0  # single element: y_0 = x_0


def test_ewma_ignores_order_of_input_rows(spark):
    rows = [(1, 2, 4.0), (1, 0, 3.0), (1, 1, 1.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = ewma(df, "k", "t", "v", alpha=0.5).collect()[0]["ewma"]
    # fold over t-order [3,1,4]: y=3 -> 2 -> 3
    assert got == 3.0


def test_ridge2_matches_numpy_closed_form(spark):
    rng = np.random.default_rng(11)
    x1 = np.round(rng.normal(0, 1, 500), 6)
    x2 = np.round(0.8 * x1 + rng.normal(0, 0.3, 500), 6)  # collinear-ish
    y = np.round(2.0 * x1 - 1.0 * x2 + 0.5 + rng.normal(0, 0.1, 500), 6)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    lam = 3.0
    got = ridge2(df, ["x1", "x2"], "y", lam).collect()[0]
    xc = np.column_stack([x1 - x1.mean(), x2 - x2.mean()])
    yc = y - y.mean()
    b = np.linalg.solve(xc.T @ xc + lam * np.eye(2), xc.T @ yc)
    assert got["b_x1"] == pytest.approx(b[0], rel=1e-6)
    assert got["b_x2"] == pytest.approx(b[1], rel=1e-6)
    a = y.mean() - b[0] * x1.mean() - b[1] * x2.mean()
    assert got["intercept"] == pytest.approx(a, rel=1e-6)
    # lam -> 0 recovers OLS
    ols = np.linalg.solve(xc.T @ xc, xc.T @ yc)
    got0 = ridge2(df, ["x1", "x2"], "y", 0.0).collect()[0]
    assert got0["b_x1"] == pytest.approx(ols[0], rel=1e-6)


def test_ridge2_shrinks_toward_zero(spark):
    rng = np.random.default_rng(3)
    x1 = rng.normal(0, 1, 200)
    x2 = rng.normal(0, 1, 200)
    y = x1 + x2
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    b_small = ridge2(df, ["x1", "x2"], "y", 0.1).collect()[0]
    b_big = ridge2(df, ["x1", "x2"], "y", 1e6).collect()[0]
    assert abs(b_big["b_x1"]) < abs(b_small["b_x1"]) < 1.01
    assert abs(b_big["b_x1"]) < 0.05


def test_mann_whitney_matches_scipy_formula(spark):
    from hdfe_spark.operators.stats import mann_whitney_u

    # small fixture with ties, hand-checkable
    a = [1.0, 2.0, 2.0, 5.0, 7.0]
    b = [2.0, 3.0, 6.0, 6.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "side string, v double")
    got = mann_whitney_u(df, "side", "v", "a", "b").collect()[0]
    # reference: average ranks of pooled [1,2,2,2,3,5,6,6,7]
    # ranks:     [1, 3,3,3, 5, 6, 7.5,7.5, 9]
    ra = 1 + 3 + 3 + 6 + 9  # side a holds 1,2,2,5,7
    ua = ra - 5 * 6 / 2
    assert got["n_a"] == 5 and got["n_b"] == 4
    assert got["u_a"] == ua
    assert got["u_b"] == 5 * 4 - ua
    # tie groups: three 2s (c=3), two 6s (c=2)
    assert got["tie_term"] == (27 - 3) + (8 - 2)
    import math

    n = 9
    var = 5 * 4 / 12 * ((n + 1) - got["tie_term"] / (n * (n - 1)))
    assert got["z"] == pytest.approx(
        (ua - 5 * 4 / 2) / math.sqrt(var), rel=1e-12
    )


def test_ks_2sample_exact(spark):
    from hdfe_spark.operators.stats import ks_2sample

    a = [1.0, 2.0, 3.0, 4.0]
    b = [3.0, 4.0, 5.0, 6.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "side string, v double")
    got = ks_2sample(df, "side", "v", "a", "b").collect()[0]
    # ECDFs: at v=2, Fa=2/4, Fb=0 -> gap 1/2 (max)
    assert got["d_num"] == 8  # |2*4 - 0*4| = 8
    assert got["d"] == 0.5


def test_spearman_matches_scipy_style(spark):
    from hdfe_spark.operators.stats import spearman_corr

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(9)
    x = np.round(rng.normal(0, 1, 300), 3)  # 3 decimals -> real ties
    y = np.round(0.6 * x + rng.normal(0, 1, 300), 3)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)],
        "x double, y double",
    )
    got = spearman_corr(df, "x", "y").collect()[0]
    rx = pd.Series(x).rank(method="average")
    ry = pd.Series(y).rank(method="average")
    want = np.corrcoef(rx, ry)[0, 1]
    assert got["n"] == 300
    assert got["rho"] == pytest.approx(want, rel=1e-9)


def test_spearman_perfect_monotone(spark):
    from hdfe_spark.operators.stats import spearman_corr

    rows = [(float(i), float(i * i)) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0]["rho"] == pytest.approx(
        1.0
    )


def test_standardize_zero_mean_unit_var(spark):
    from hdfe_spark.operators.stats import standardize

    import numpy as np

    rng = np.random.default_rng(2)
    v = np.round(rng.normal(50, 10, 500), 6)
    df = spark.createDataFrame([(float(x),) for x in v], "v double")
    z = standardize(df, ["v"]).toPandas()["v_z"]
    assert z.mean() == pytest.approx(0.0, abs=1e-9)
    assert z.std(ddof=1) == pytest.approx(1.0, rel=1e-9)
    want = (v - v.mean()) / v.std(ddof=1)
    assert np.allclose(np.sort(z), np.sort(want), rtol=1e-6)


def test_huber_irls2_matches_numpy_replica(spark):
    from hdfe_spark.operators.stats import huber_irls2

    rng = np.random.default_rng(6)
    x = np.round(rng.uniform(0, 10, 400), 6)
    y = np.round(3.0 * x + 1.0 + rng.normal(0, 0.5, 400), 6)
    y[:8] += 500.0  # gross outliers
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)],
        "x double, y double",
    )
    delta = 2.0
    got = huber_irls2(df, "x", "y", delta=delta, n_iter=2).collect()[0]

    # numpy replica of the exact quantized algorithm
    xu = np.round(x * 1e6)
    yu = np.round(y * 1e6)
    W = 1 << 20

    def wls(w):
        sw = float((w).sum())
        swx, swy = float((w * xu).sum()), float((w * yu).sum())
        swxx = float((w * xu * xu).sum())
        swxy = float((w * xu * yu).sum())
        den = sw * swxx - swx * swx
        b1 = (sw * swxy - swx * swy) / den
        b0 = (swy - b1 * swx) / sw
        return b0, b1

    b0, b1 = wls(np.full_like(xu, W))
    ds = delta * 1e6
    for _ in range(2):
        r = np.abs(yu - b0 - b1 * xu)
        w = np.where(r <= ds, W, np.floor(ds / r * W))
        b0, b1 = wls(w)
    nd = int((w < W).sum())
    assert got["b1"] == pytest.approx(b1, rel=1e-12)
    assert got["b0"] == pytest.approx(b0 / 1e6, rel=1e-9)
    assert got["n_downweighted"] == nd
    # robustness: huber slope strictly closer to truth than OLS
    ols_b1 = np.polyfit(x, y, 1)[0]
    assert abs(got["b1"] - 3.0) < 0.1
    assert abs(got["b1"] - 3.0) < abs(ols_b1 - 3.0) / 2


def test_auc_score_exact(spark):
    from hdfe_spark.operators.stats import auc_score

    # perfect separation -> 1.0; ties at the boundary -> 0.5 credit
    rows = [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)]
    df = spark.createDataFrame(rows, "y boolean, s double")
    assert auc_score(df, "y", "s").collect()[0]["auc"] == 1.0

    rows = [(True, 0.9), (True, 0.5), (False, 0.5), (False, 0.1)]
    df = spark.createDataFrame(rows, "y boolean, s double")
    # pairs: (0.9>0.5)=1, (0.9>0.1)=1, (0.5=0.5)=0.5, (0.5>0.1)=1
    assert auc_score(df, "y", "s").collect()[0]["auc"] == 3.5 / 4

    # random scores -> near 0.5
    import numpy as np

    rng = np.random.default_rng(1)
    rows = [
        (bool(rng.integers(2)), float(round(rng.random(), 6)))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "y boolean, s double")
    got = auc_score(df, "y", "s").collect()[0]["auc"]
    assert 0.45 < got < 0.55
