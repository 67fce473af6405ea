"""Round-12 econometrics-panel completion: two-way clustered SEs, the
distributed cluster meat, WLS, 2SLS, fit_stats, DiD, event study.
Every estimator is checked against an independent numpy recomputation
on a synthetic fixture with known structure (the F5 convention of
``test_estimate.py``)."""

import numpy as np
import pandas as pd
import pytest

from hdfe_spark.operators.causal import did, event_study, ipw_ate, rdd
from hdfe_spark.operators.estimate import estimate, fit_stats, iv_2sls, wls

N, SEED = 3000, 11


@pytest.fixture(scope="module")
def panel_pdf():
    rng = np.random.RandomState(SEED)
    ca = rng.randint(0, 25, N)
    cb = rng.randint(0, 12, N)
    fe1 = rng.randint(0, 40, N)
    x1, x2 = rng.randn(N), rng.randn(N)
    z = x1 + 0.5 * rng.randn(N)  # relevant instrument
    w = rng.uniform(0.2, 3.0, N)
    alpha = rng.randn(40) * 0.5
    # Correlated-within-cluster errors make the CGM correction bite.
    eps = rng.randn(25)[ca] + rng.randn(12)[cb] + rng.randn(N) * 0.3
    y = 2.0 * x1 - 1.0 * x2 + alpha[fe1] + eps
    return pd.DataFrame(
        {"ca": ca, "cb": cb, "fe1": fe1, "x1": x1, "x2": x2,
         "z": z, "w": w, "y": y}
    )


def _np_cluster_meat(e, X, keys):
    df = pd.DataFrame({"k": keys})
    S = X * e[:, None]
    u = pd.DataFrame(S).groupby(df["k"]).sum().to_numpy()
    return u.T @ u


def test_cluster_oneway_matches_numpy(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf)
    res = estimate(sdf, "y", ["x1", "x2"], estimate_variance=True,
                   cluster="ca")
    X = panel_pdf[["x1", "x2"]].to_numpy()
    yv = panel_pdf["y"].to_numpy()
    b = np.linalg.solve(X.T @ X, X.T @ yv)
    e = yv - X @ b
    Ginv = np.linalg.inv(X.T @ X)
    M = _np_cluster_meat(e, X, panel_pdf["ca"])
    V = Ginv @ M @ Ginv
    assert np.allclose(res.V[0], V, rtol=1e-8)


def test_cluster_twoway_cgm(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf)
    res = estimate(sdf, "y", ["x1", "x2"], estimate_variance=True,
                   cluster=["ca", "cb"])
    X = panel_pdf[["x1", "x2"]].to_numpy()
    yv = panel_pdf["y"].to_numpy()
    b = np.linalg.solve(X.T @ X, X.T @ yv)
    e = yv - X @ b
    Ginv = np.linalg.inv(X.T @ X)
    pair = panel_pdf["ca"].astype(str) + "|" + panel_pdf["cb"].astype(str)
    M = (
        _np_cluster_meat(e, X, panel_pdf["ca"])
        + _np_cluster_meat(e, X, panel_pdf["cb"])
        - _np_cluster_meat(e, X, pair)
    )
    V = Ginv @ M @ Ginv
    assert np.allclose(res.V[0], V, rtol=1e-8)
    assert np.all(np.diag(res.V[0]) > 0)


def test_cluster_twoway_within_plan(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf)
    res = estimate(sdf, "y", ["x1", "x2"], categorical_controls=["fe1"],
                   estimate_variance=True, cluster=["ca", "cb"])
    # numpy within recomputation
    pdf = panel_pdf.copy()
    for c in ["x1", "x2"]:
        pdf[f"d_{c}"] = pdf[c] - pdf.groupby("fe1")[c].transform("mean")
    pdf["d_y"] = pdf["y"] - pdf.groupby("fe1")["y"].transform("mean")
    Xd = pdf[["d_x1", "d_x2"]].to_numpy()
    yd = pdf["d_y"].to_numpy()
    b = np.linalg.solve(Xd.T @ Xd, Xd.T @ yd)
    e = yd - Xd @ b
    Sinv = np.linalg.inv(Xd.T @ Xd)
    pair = pdf["ca"].astype(str) + "|" + pdf["cb"].astype(str)
    M = (
        _np_cluster_meat(e, Xd, pdf["ca"])
        + _np_cluster_meat(e, Xd, pdf["cb"])
        - _np_cluster_meat(e, Xd, pair)
    )
    V = Sinv @ M @ Sinv
    assert np.allclose(res.V[0], V, rtol=1e-6)


def test_cluster_validation(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf.head(50))
    with pytest.raises(ValueError, match="1 or 2"):
        estimate(sdf, "y", ["x1"], estimate_variance=True,
                 cluster=["ca", "cb", "fe1"])
    with pytest.raises(ValueError, match="distinct"):
        estimate(sdf, "y", ["x1"], estimate_variance=True,
                 cluster=["ca", "ca"])


def test_wls_matches_numpy(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf)
    res = wls(sdf, "y", ["x1", "x2"], weights="w", estimate_variance=True)
    X = panel_pdf[["x1", "x2"]].to_numpy()
    yv = panel_pdf["y"].to_numpy()
    wv = panel_pdf["w"].to_numpy()
    G = X.T @ (X * wv[:, None])
    bt = np.linalg.solve(G, X.T @ (wv * yv))
    assert np.allclose(res.b[:, 0], bt, rtol=1e-9)
    e = yv - X @ bt
    sigma2 = float(wv @ (e * e)) / (N - 2)
    V = np.linalg.inv(G) * sigma2
    assert np.allclose(res.V[0], V, rtol=1e-7)


def test_wls_unit_weights_equal_ols(spark, panel_pdf):
    pdf = panel_pdf.assign(ones=1.0)
    sdf = spark.createDataFrame(pdf)
    r_w = wls(sdf, "y", ["x1", "x2"], weights="ones")
    r_o = estimate(sdf, "y", ["x1", "x2"])
    assert np.allclose(r_w.b, r_o.b, rtol=1e-12)


def test_iv_just_identified(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf)
    res = iv_2sls(sdf, "y", "x1", "z", x_exog="x2",
                  estimate_variance=True)
    Z = panel_pdf[["z", "x2"]].to_numpy()
    X = panel_pdf[["x1", "x2"]].to_numpy()
    yv = panel_pdf["y"].to_numpy()
    bt = np.linalg.solve(Z.T @ X, Z.T @ yv)
    assert np.allclose(res.b[:, 0], bt, rtol=1e-8)
    # IV recovers the structural slope ~2 despite fe noise in eps.
    assert abs(res.b[0, 0] - 2.0) < 0.2
    e = yv - X @ bt
    A = np.linalg.inv(Z.T @ Z)
    XPX = X.T @ Z @ A @ Z.T @ X
    V = np.linalg.inv(XPX) * (float(e @ e) / (N - 2))
    assert np.allclose(res.V[0], V, rtol=1e-7)
    # First stage: (Z'Z)^-1 Z'X.
    Pi = A @ Z.T @ X
    assert np.allclose(res.first_stage, Pi, rtol=1e-8)


def test_iv_overidentified(spark, panel_pdf):
    pdf = panel_pdf.assign(z2=panel_pdf["x1"] + np.random.RandomState(3).randn(N))
    sdf = spark.createDataFrame(pdf)
    res = iv_2sls(sdf, "y", "x1", ["z", "z2"], x_exog="x2")
    Z = pdf[["z", "z2", "x2"]].to_numpy()
    X = pdf[["x1", "x2"]].to_numpy()
    yv = pdf["y"].to_numpy()
    A = np.linalg.inv(Z.T @ Z)
    XPX = X.T @ Z @ A @ Z.T @ X
    XPy = X.T @ Z @ A @ Z.T @ yv
    bt = np.linalg.solve(XPX, XPy)
    assert np.allclose(res.b[:, 0], bt, rtol=1e-8)


def test_iv_validation(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf.head(50))
    with pytest.raises(ValueError, match="under-identified"):
        iv_2sls(sdf, "y", ["x1", "x2"], ["z"])
    with pytest.raises(ValueError, match="instrument itself"):
        iv_2sls(sdf, "y", "x1", ["x1", "z"])


def test_fit_stats_within(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf)
    fs = fit_stats(sdf, "y", ["x1", "x2"], categorical_controls=["fe1"])
    pdf = panel_pdf.copy()
    for c in ["x1", "x2", "y"]:
        pdf[f"d_{c}"] = pdf[c] - pdf.groupby("fe1")[c].transform("mean")
    Xd = pdf[["d_x1", "d_x2"]].to_numpy()
    yd = pdf["d_y"].to_numpy()
    b = np.linalg.solve(Xd.T @ Xd, Xd.T @ yd)
    rss = float(yd @ yd) - float(b @ (Xd.T @ yd))
    tss = float(yd @ yd)
    G = pdf["fe1"].nunique()
    r2 = 1 - rss / tss
    assert abs(fs["r2"] - r2) < 1e-9
    assert fs["n_groups"] == G
    df2 = N - G - 2
    f_ref = ((tss - rss) / 2) / (rss / df2)
    assert abs(fs["f_stat"] - f_ref) / f_ref < 1e-9
    adj_ref = 1 - (rss / df2) / (tss / (N - G))
    assert abs(fs["adj_r2"] - adj_ref) < 1e-9


def test_fit_stats_pooled_centered(spark, panel_pdf):
    sdf = spark.createDataFrame(panel_pdf)
    fs = fit_stats(sdf, "y", ["x1", "x2"])
    pdf = panel_pdf.copy()
    Xc = pdf[["x1", "x2"]].to_numpy() - pdf[["x1", "x2"]].to_numpy().mean(0)
    yc = (pdf["y"] - pdf["y"].mean()).to_numpy()
    b = np.linalg.solve(Xc.T @ Xc, Xc.T @ yc)
    rss = float(yc @ yc) - float(b @ (Xc.T @ yc))
    tss = float(yc @ yc)
    assert abs(fs["r2"] - (1 - rss / tss)) < 1e-9
    assert fs["n_groups"] == 1
    assert 0.0 < fs["r2"] < 1.0


def test_did_matches_cell_means_and_ols(spark):
    rng = np.random.RandomState(5)
    n = 4000
    t = rng.randint(0, 2, n).astype(bool)
    p = rng.randint(0, 2, n).astype(bool)
    y = 1.0 + 0.5 * t + 0.3 * p + 1.7 * (t & p) + rng.randn(n) * 0.2
    pdf = pd.DataFrame({"t": t, "p": p, "y": y, "ones": 1.0})
    sdf = spark.createDataFrame(pdf)
    row = did(sdf, "y", "t", "p").collect()[0]
    cells = pdf.groupby(["t", "p"])["y"].mean()
    att = (cells[(True, True)] - cells[(True, False)]) - (
        cells[(False, True)] - cells[(False, False)]
    )
    assert abs(row["att"] - att) < 1e-9
    assert row["n_treat_post"] == int((t & p).sum())
    # ATT == interaction coefficient of the saturated OLS.
    pdf2 = pdf.assign(ti=t.astype(float), pi=p.astype(float),
                      tp=(t & p).astype(float))
    res = estimate(spark.createDataFrame(pdf2), "y",
                   ["ones", "ti", "pi", "tp"])
    assert abs(row["att"] - res.b[3, 0]) < 1e-7


def test_did_null_flags_excluded(spark):
    pdf = pd.DataFrame(
        {"t": [True, False, None, True, False],
         "p": [True, True, True, False, False],
         "y": [5.0, 1.0, 100.0, 2.0, 1.0]}
    )
    row = did(spark.createDataFrame(pdf), "y", "t", "p").collect()[0]
    # NULL-treat row contributes to no cell.
    assert row["m_treat_post"] == 5.0
    assert row["m_ctrl_post"] == 1.0
    assert abs(row["att"] - ((5.0 - 2.0) - (1.0 - 1.0))) < 1e-12


def test_event_study_base_normalization(spark):
    rng = np.random.RandomState(9)
    n = 5000
    t = rng.randint(0, 2, n).astype(bool)
    k = rng.randint(-3, 4, n)
    effect = np.where(k >= 0, 1.5 + 0.25 * k, 0.0) * t
    y = 2.0 + 0.1 * k + effect + rng.randn(n) * 0.1
    pdf = pd.DataFrame({"t": t, "k": k, "y": y})
    out = (
        event_study(spark.createDataFrame(pdf), "y", "t", "k", -1)
        .toPandas().set_index("k").sort_index()
    )
    assert abs(out.loc[-1, "att"]) < 1e-12
    # Pre-period placebo ~0, post effects near the injected ramp.
    assert abs(out.loc[-3, "att"]) < 0.05
    for kk in range(0, 4):
        assert abs(out.loc[kk, "att"] - (1.5 + 0.25 * kk)) < 0.05


def test_event_study_validation(spark):
    pdf = pd.DataFrame({"t": [True, False], "k": [0, 0], "y": [1.0, 2.0]})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="no rows"):
        event_study(sdf, "y", "t", "k", 99)
    pdf2 = pd.DataFrame({"t": [True, True], "k": [0, 0], "y": [1.0, 2.0]})
    with pytest.raises(ValueError, match="empty"):
        event_study(spark.createDataFrame(pdf2), "y", "t", "k", 0)
    with pytest.raises(ValueError, match="collides"):
        event_study(sdf.withColumnRenamed("k", "att"), "y", "t", "att", 0)


def test_ipw_ate_matches_numpy(spark):
    rng = np.random.RandomState(21)
    n = 6000
    x = rng.randn(n)
    e_true = 1.0 / (1.0 + np.exp(-x))          # known propensity
    t = rng.uniform(size=n) < e_true
    y = 1.0 + 2.0 * t + 0.8 * x + rng.randn(n) * 0.3  # confounded by x
    pdf = pd.DataFrame({"y": y, "t": t, "e": e_true})
    row = ipw_ate(spark.createDataFrame(pdf), "y", "t", "e").collect()[0]
    ec = np.clip(e_true, 0.01, 0.99)
    w1 = np.where(t, 1.0 / ec, 0.0)
    w0 = np.where(~t, 1.0 / (1.0 - ec), 0.0)
    ate = float(w1 @ y) / w1.sum() - float(w0 @ y) / w0.sum()
    assert abs(row["ate"] - ate) < 1e-9
    # IPW deconfounds: the naive difference is biased upward, the
    # weighted estimate sits near the true effect 2.
    naive = y[t].mean() - y[~t].mean()
    assert abs(row["ate"] - 2.0) < 0.15 < abs(naive - 2.0)
    ess1 = w1.sum() ** 2 / float(w1 @ w1)
    assert abs(row["ess_treat"] - ess1) < 1e-6
    assert row["n_treat"] == int(t.sum())


def test_ipw_clip_disabled(spark):
    pdf = pd.DataFrame(
        {"y": [1.0, 3.0], "t": [True, False], "e": [0.5, 0.5]}
    )
    row = ipw_ate(spark.createDataFrame(pdf), "y", "t", "e",
                  clip=0.0).collect()[0]
    assert abs(row["ate"] - (1.0 - 3.0)) < 1e-12


def test_rdd_recovers_jump(spark):
    rng = np.random.RandomState(33)
    n = 20000
    r = rng.uniform(-2.0, 2.0, n)
    jump = 1.25
    y = 0.5 + 0.7 * r + np.where(r >= 0, jump + 0.2 * r, 0.0) \
        + rng.randn(n) * 0.05
    pdf = pd.DataFrame({"r": r, "y": y})
    row = rdd(spark.createDataFrame(pdf), "y", "r", cutoff=0.0,
              bandwidth=0.5).collect()[0]
    assert abs(row["effect"] - jump) < 0.02
    # Side fits against numpy closed form inside the band.
    m = np.abs(r) < 0.5
    for tag, mask in (("l", m & (r < 0)), ("r", m & (r >= 0))):
        xs, ys = r[mask], y[mask]
        b = ((len(xs) * (xs @ ys) - xs.sum() * ys.sum())
             / (len(xs) * (xs @ xs) - xs.sum() ** 2))
        a = ys.mean() - b * xs.mean()
        key = "intercept_left" if tag == "l" else "intercept_right"
        assert abs(row[key] - a) < 1e-9
    assert row["n_left"] == int((m & (r < 0)).sum())


def test_rdd_degenerate_side_is_null(spark):
    # right side has a single distinct x -> zero-variance denominator
    pdf = pd.DataFrame(
        {"r": [-0.3, -0.2, -0.1, 0.1, 0.1], "y": [1.0, 2.0, 3.0, 9.0, 9.5]}
    )
    row = rdd(spark.createDataFrame(pdf), "y", "r", cutoff=0.0,
              bandwidth=0.5).collect()[0]
    assert row["slope_right"] is None and row["effect"] is None
    assert row["slope_left"] is not None


def test_rdd_cutoff_row_belongs_right(spark):
    pdf = pd.DataFrame({"r": [0.0, 0.2, -0.2, -0.1], "y": [5.0, 6.0, 1.0, 2.0]})
    row = rdd(spark.createDataFrame(pdf), "y", "r", cutoff=0.0,
              bandwidth=1.0).collect()[0]
    assert row["n_right"] == 2 and row["n_left"] == 2


def test_null_outcome_never_dilutes(spark):
    """A NULL y row must not shift any cell mean, arm weight sum, or
    side fit (review-r12 pin: the sum/count rewrite originally
    counted NULL-y rows in the denominator)."""
    pdf = pd.DataFrame(
        {"t": [True, True, False, False],
         "p": [True, True, True, True],
         "y": [4.0, None, 2.0, None],
         "e": [0.5, 0.5, 0.5, 0.5],
         "r": [0.1, 0.2, -0.1, -0.2]}
    )
    sdf = spark.createDataFrame(pdf)
    row = did(sdf, "y", "t", "p").collect()[0]
    assert row["m_treat_post"] == 4.0 and row["n_treat_post"] == 1
    row = ipw_ate(sdf, "y", "t", "e").collect()[0]
    assert abs(row["ate"] - (4.0 - 2.0)) < 1e-12
    assert row["n_treat"] == 1 and row["n_ctrl"] == 1
    pdf2 = pd.DataFrame(
        {"r": [0.1, 0.3, 0.2, -0.1, -0.3, -0.2],
         "y": [1.0, 2.0, None, 1.0, 3.0, None]}
    )
    row = rdd(spark.createDataFrame(pdf2), "y", "r", 0.0, 1.0).collect()[0]
    assert row["n_right"] == 2 and row["n_left"] == 2
    out = event_study(
        spark.createDataFrame(
            pd.DataFrame({"t": [True, False, True],
                          "k": [0, 0, 0],
                          "y": [3.0, 1.0, None]})
        ), "y", "t", "k", 0,
    ).collect()[0]
    assert out["m_treat"] == 3.0 and out["n_treat"] == 1


def test_cluster_on_alternating_plan(spark, panel_pdf):
    """Review-r12 pin: the cluster-list normalization crashed Plan C
    (`cc + [cluster]` appended the list itself — TypeError at
    dict.fromkeys). Both one- and two-way now run and match the
    within plan's slopes-variance on the same data."""
    sdf = spark.createDataFrame(panel_pdf)
    res1 = estimate(sdf, "y", ["x1", "x2"], categorical_controls=["fe1"],
                    within_if_fe=False, estimate_variance=True,
                    cluster="ca")
    res2 = estimate(sdf, "y", ["x1", "x2"], categorical_controls=["fe1"],
                    within_if_fe=False, estimate_variance=True,
                    cluster=["ca", "cb"])
    ref = estimate(sdf, "y", ["x1", "x2"], categorical_controls=["fe1"],
                   estimate_variance=True, cluster=["ca", "cb"])
    assert np.allclose(res2.V[0], ref.V[0], rtol=1e-6)
    assert res1.V[0].shape == (2, 2)


def test_fit_stats_null_fe_level_counts(spark):
    """Review-r12 pin: a NULL FE level is demeaned like any other
    partition, so it must count toward the absorbed dof."""
    pdf = pd.DataFrame(
        {"fe": [None, None, "a", "a", "b", "b"],
         "x": [1.0, 2.0, 3.0, 5.0, 2.0, 4.0],
         "y": [1.0, 3.0, 2.0, 6.0, 1.0, 5.0]}
    )
    fs = fit_stats(spark.createDataFrame(pdf), "y", ["x"],
                   categorical_controls=["fe"])
    assert fs["n_groups"] == 3
    assert fs["df2"] == 6 - 3 - 1


def test_ipw_null_propensity_excluded_from_counts(spark):
    """Review-r12 pin: a NULL propensity contributes zero weight, so
    it must not inflate the reported arm count."""
    pdf = pd.DataFrame(
        {"y": [4.0, 6.0, 2.0], "t": [True, True, False],
         "e": [0.5, None, 0.5]}
    )
    row = ipw_ate(spark.createDataFrame(pdf), "y", "t", "e").collect()[0]
    assert row["n_treat"] == 1
    assert abs(row["m_treat_w"] - 4.0) < 1e-12


def test_aipw_doubly_robust(spark):
    """AIPW with a CORRECT outcome model recovers the effect even
    under a wrong propensity, and matches the numpy influence-psi
    replica exactly."""
    from hdfe_spark.operators.causal import aipw_ate

    rng = np.random.RandomState(41)
    n = 6000
    x = rng.randn(n)
    e_true = 1.0 / (1.0 + np.exp(-x))
    t = rng.uniform(size=n) < e_true
    y = 1.0 + 2.0 * t + 0.8 * x + rng.randn(n) * 0.3
    mu1 = 3.0 + 0.8 * x       # correct outcome model
    mu0 = 1.0 + 0.8 * x
    e_wrong = np.full(n, 0.5)  # deliberately wrong propensity
    pdf = pd.DataFrame({"y": y, "t": t, "e": e_wrong,
                        "mu1": mu1, "mu0": mu0})
    row = aipw_ate(spark.createDataFrame(pdf), "y", "t", "e",
                   "mu1", "mu0").collect()[0]
    ec = np.clip(e_wrong, 0.01, 0.99)
    psi = mu1 - mu0 + np.where(t, (y - mu1) / ec, -(y - mu0) / (1 - ec))
    assert abs(row["ate"] - psi.mean()) < 1e-9
    assert abs(row["ate"] - 2.0) < 0.05
    se = np.sqrt(psi.var(ddof=1) / n)
    assert abs(row["se"] - se) < 1e-9
    assert row["n_used"] == n


def test_aipw_null_ingredient_drops(spark):
    from hdfe_spark.operators.causal import aipw_ate

    pdf = pd.DataFrame(
        {"y": [5.0, 1.0, 7.0], "t": [True, False, True],
         "e": [0.5, 0.5, 0.5],
         "mu1": [5.0, 1.0, None], "mu0": [3.0, 1.0, 2.0]}
    )
    row = aipw_ate(spark.createDataFrame(pdf), "y", "t", "e",
                   "mu1", "mu0").collect()[0]
    assert row["n_used"] == 2


def test_hausman_detects_confounded_pooled(spark):
    """FE-correlated regressor with most x variance BETWEEN FE levels:
    the within fit is the noisier-but-consistent one (the textbook
    orientation), pooled is biased — H rejects. Note the known
    finite-sample pathology: under violent confounding the pooled
    residual variance balloons past the within fit's and the V
    difference turns indefinite; `hausman` PSD-projects (negative
    eigenvalues clipped), so H degenerates toward 0 there instead of
    going negative."""
    from hdfe_spark.operators.estimate import hausman

    rng = np.random.RandomState(55)
    fe1 = rng.randint(0, 40, N)
    shift = rng.randn(40)
    x1 = rng.randn(N) * 0.3 + 3.0 * shift[fe1]
    x2 = rng.randn(N)
    y = 2.0 * x1 - x2 + 0.5 * shift[fe1] + rng.randn(N) * 0.5
    pdf = pd.DataFrame({"fe1": fe1, "x1": x1, "x2": x2, "y": y})
    sdf = spark.createDataFrame(pdf)
    fe = estimate(sdf, "y", ["x1", "x2"], categorical_controls=["fe1"],
                  estimate_variance=True)
    pooled = estimate(sdf, "y", ["x1", "x2"], estimate_variance=True)
    out = hausman(fe, pooled)
    assert out["dof"] >= 1
    assert out["h_stat"] > 20.0  # strong rejection under confounding
    # H0 companion: no FE term in y -> H is small.
    y0 = 2.0 * x1 - x2 + rng.randn(N) * 0.5
    sdf0 = spark.createDataFrame(pdf.assign(y=y0))
    fe0 = estimate(sdf0, "y", ["x1", "x2"], categorical_controls=["fe1"],
                   estimate_variance=True)
    pooled0 = estimate(sdf0, "y", ["x1", "x2"], estimate_variance=True)
    assert hausman(fe0, pooled0)["h_stat"] < 10.0
    with pytest.raises(ValueError, match="estimate_variance"):
        hausman(estimate(sdf, "y", ["x1", "x2"]), pooled)


def test_ri_pvalue_null_effect_not_significant(spark):
    """Under the null (treatment pure noise), the observed effect is
    unremarkable among the pseudo-permutations -> large p."""
    from hdfe_spark.operators.causal import ri_pvalue

    rng = np.random.RandomState(71)
    n = 20000
    ids = np.arange(n)
    t = (rng.uniform(size=n) < 0.5)
    y = rng.randn(n)
    pdf = pd.DataFrame({"id": ids, "t": t, "y": y})
    row = ri_pvalue(spark.createDataFrame(pdf), "y", "t", n_perm=99,
                    id_col="id").collect()[0]
    assert row["p_value"] > 0.05
    assert row["n_perm"] == 99


def test_ri_pvalue_real_effect_minimal_p(spark):
    """With a large injected effect, no pseudo-permutation beats the
    observed difference -> p hits the floor 1/(n_perm+1)."""
    from hdfe_spark.operators.causal import ri_pvalue

    rng = np.random.RandomState(72)
    n = 20000
    ids = np.arange(n)
    t = (ids % 2 == 0)
    y = rng.randn(n) + np.where(t, 2.0, 0.0)
    pdf = pd.DataFrame({"id": ids, "t": t, "y": y})
    row = ri_pvalue(spark.createDataFrame(pdf), "y", "t", n_perm=99,
                    id_col="id").collect()[0]
    assert abs(row["p_value"] - 1.0 / 100.0) < 1e-12
    assert abs(row["observed"] - 2.0) < 0.05


def test_ri_pvalue_matches_numpy_replica(spark):
    """The LCG reassignments are deterministic integer arithmetic —
    the whole randomization distribution replays exactly in numpy."""
    from hdfe_spark.operators.causal import ri_pvalue

    rng = np.random.RandomState(73)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    t = (rng.uniform(size=n) < 0.5)
    y = rng.randn(n) + np.where(t, 0.05, 0.0)
    pdf = pd.DataFrame({"id": ids, "t": t, "y": y})
    n_perm = 49
    row = ri_pvalue(spark.createDataFrame(pdf), "y", "t",
                    n_perm=n_perm, id_col="id").collect()[0]
    # r13: threshold calibrated to the observed treated fraction
    M = 1_000_003
    half = (M * int(t.sum())) // n
    obs = y[t].mean() - y[~t].mean()
    hits = 1
    for k in range(n_perm):
        tk = ((ids * (48271 * (2 * k + 3)) + 7919 * (k + 1)) % M) < half
        eff = y[tk].mean() - y[~tk].mean()
        if abs(eff) >= abs(obs):
            hits += 1
    assert abs(row["p_value"] - hits / (n_perm + 1)) < 1e-12
    assert abs(row["observed"] - obs) < 1e-12


def test_ri_pvalue_negative_ids_balanced(spark):
    """Review-r12b pin: Spark % keeps the dividend's sign, so
    negative ids (or xxhash64 values) must go through pmod — a bare
    % would force every negative row into the treated arm (75/25
    skew). With pmod, permuted arm sizes stay ~50/50 even when all
    ids are negative."""
    from hdfe_spark.operators.causal import ri_pvalue

    rng = np.random.RandomState(81)
    n = 10000
    ids = -np.arange(1, n + 1, dtype=np.int64) * 1001
    t = (rng.uniform(size=n) < 0.5)
    y = rng.randn(n)
    pdf = pd.DataFrame({"id": ids, "t": t, "y": y})
    sdf = spark.createDataFrame(pdf)
    row = ri_pvalue(sdf, "y", "t", n_perm=49, id_col="id").collect()[0]
    assert row["p_value"] > 0.02  # not stuck at the floor
    # replica with explicit double-pmod arithmetic (r13: threshold
    # calibrated to the observed treated fraction)
    M = 1_000_003
    half = (M * int(t.sum())) // n
    obs = y[t].mean() - y[~t].mean()
    hits = 1
    for k in range(49):
        ridm = np.mod(ids, M)  # numpy mod is already non-negative
        tk = np.mod(ridm * (48271 * (2 * k + 3)) + 7919 * (k + 1), M) < half
        frac = tk.mean()
        assert 0.45 < frac < 0.55  # balanced despite negative ids
        eff = y[tk].mean() - y[~tk].mean()
        if abs(eff) >= abs(obs):
            hits += 1
    assert abs(row["p_value"] - hits / 50.0) < 1e-12


def test_ri_pvalue_degenerate_arm_null(spark):
    """Review-r12b pin: an empty arm means no observed effect — the
    result must be NULL observed/p, never the floor p-value."""
    from hdfe_spark.operators.causal import ri_pvalue

    pdf = pd.DataFrame(
        {"id": [1, 2, 3], "t": [True, True, True], "y": [1.0, 2.0, 3.0]}
    )
    row = ri_pvalue(spark.createDataFrame(pdf), "y", "t", n_perm=9,
                    id_col="id").collect()[0]
    assert row["observed"] is None and row["p_value"] is None


def test_ri_pvalue_null_treat_outside_sample(spark):
    """Review-r12b pin: NULL-treat rows are outside the randomization
    distribution — they must not enter the permuted effects either."""
    from hdfe_spark.operators.causal import ri_pvalue

    pdf = pd.DataFrame(
        {"id": [1, 2, 3, 4],
         "t": [True, False, None, None],
         "y": [5.0, 1.0, 100.0, -100.0]}
    )
    row = ri_pvalue(spark.createDataFrame(pdf), "y", "t", n_perm=5,
                    id_col="id").collect()[0]
    # observed uses only rows 1-2; permuted effects likewise: any
    # permuted |effect| is |5-1|=4 or ... bounded by the two valid
    # rows' values, never contaminated by the +-100 rows.
    assert abs(row["observed"] - 4.0) < 1e-12


def test_mde_by_matches_closed_form(spark):
    """Per-segment MDE = (z_{1-a/2} + z_power) * SE_Welch, composed on
    welch_by's exact moments; numpy replica per segment."""
    from hdfe_spark.operators.stats import mde_by

    rng = np.random.RandomState(91)
    n = 12000
    seg = rng.randint(0, 6, n)
    arm = np.where(rng.uniform(size=n) < 0.5, "A", "B")
    v = rng.randn(n) * (1.0 + seg * 0.2) + np.where(arm == "B", 0.05, 0.0)
    pdf = pd.DataFrame({"seg": seg, "arm": arm, "v": v})
    out = {
        r["seg"]: r
        for r in mde_by(
            spark.createDataFrame(pdf), "seg", "arm", "v", "A", "B"
        ).collect()
    }
    z = 1.959963984540054 + 0.8416212335729143
    for s in range(6):
        g = pdf[pdf.seg == s]
        a, b = g[g.arm == "A"]["v"], g[g.arm == "B"]["v"]
        se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
        assert abs(out[s]["mde"] - z * se) < 1e-6
        assert abs(out[s]["observed_diff"] - (b.mean() - a.mean())) < 1e-6
        assert abs(
            out[s]["power_ratio"]
            - abs(b.mean() - a.mean()) / (z * se)
        ) < 1e-4
    with pytest.raises(ValueError, match="alpha"):
        mde_by(spark.createDataFrame(pdf), "seg", "arm", "v", "A", "B",
               alpha=0.07)


def test_mde_by_thin_arm_null(spark):
    from hdfe_spark.operators.stats import mde_by

    pdf = pd.DataFrame(
        {"seg": [1, 1, 1], "arm": ["A", "B", "B"],
         "v": [1.0, 2.0, 3.0]}
    )
    row = mde_by(spark.createDataFrame(pdf), "seg", "arm", "v",
                 "A", "B").collect()[0]
    assert row["mde"] is None and row["power_ratio"] is None
