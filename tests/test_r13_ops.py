"""Round-13 pins: the ADVICE-r12 fixes (ri_pvalue calibration, the
wls/iv_2sls/fit_stats NULL contract, hausman's degenerate convention)
plus the round's new operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- ri_pvalue


def test_ri_pvalue_unbalanced_design_calibrated(spark):
    """ADVICE r12: a 10/90 design must permute at ~10/90, not 50/50 —
    otherwise the permuted null has the wrong variance (anti-
    conservative p). The threshold is now (M*n1)//(n1+n0); the numpy
    replica checks both the arm fractions and the exact p."""
    from hdfe_spark.operators.causal import ri_pvalue

    rng = np.random.RandomState(131)
    n = 20000
    ids = np.arange(n, dtype=np.int64)
    t = rng.uniform(size=n) < 0.10
    y = rng.randn(n)
    pdf = pd.DataFrame({"id": ids, "t": t, "y": y})
    n_perm = 49
    row = ri_pvalue(spark.createDataFrame(pdf), "y", "t",
                    n_perm=n_perm, id_col="id").collect()[0]
    M = 1_000_003
    half = (M * int(t.sum())) // n
    obs = y[t].mean() - y[~t].mean()
    hits = 1
    fracs = []
    for k in range(n_perm):
        tk = ((ids * (48271 * (2 * k + 3)) + 7919 * (k + 1)) % M) < half
        fracs.append(tk.mean())
        if tk.sum() == 0 or (~tk).sum() == 0:
            hits += 1  # NULL eff_k is a hit (conservative)
            continue
        eff = y[tk].mean() - y[~tk].mean()
        if abs(eff) >= abs(obs):
            hits += 1
    # permuted treated share tracks the design's own rate
    assert 0.07 < float(np.mean(fracs)) < 0.13
    assert abs(row["p_value"] - hits / (n_perm + 1)) < 1e-12
    # under the null a calibrated test is NOT anti-conservative
    assert row["p_value"] > 0.02


def test_ri_pvalue_empty_permuted_arm_is_hit(spark):
    """A tiny sample at an extreme fraction can empty a permuted arm;
    the undefined effect must count AGAINST significance (p floor is
    never reachable through NULLs)."""
    from hdfe_spark.operators.causal import ri_pvalue

    # 1 treated of 6: many 1/6-rate permutations draw zero treated
    pdf = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "t": [True, False, False, False, False, False],
        "y": [10.0, 0.0, 0.1, -0.1, 0.05, -0.05],
    })
    row = ri_pvalue(spark.createDataFrame(pdf), "y", "t",
                    n_perm=19, id_col="id").collect()[0]
    M = 1_000_003
    half = (M * 1) // 6
    ids = np.arange(6, dtype=np.int64)
    y = pdf["y"].to_numpy()
    t = pdf["t"].to_numpy()
    obs = y[t].mean() - y[~t].mean()
    hits = 1
    for k in range(19):
        tk = ((ids * (48271 * (2 * k + 3)) + 7919 * (k + 1)) % M) < half
        if tk.sum() == 0 or (~tk).sum() == 0:
            hits += 1
            continue
        eff = y[tk].mean() - y[~tk].mean()
        if abs(eff) >= abs(obs):
            hits += 1
    assert abs(row["p_value"] - hits / 20.0) < 1e-12


# -------------------------------------------------- NULL contract (moments)


@pytest.fixture(scope="module")
def null_pdf():
    rng = np.random.RandomState(132)
    n = 500
    pdf = pd.DataFrame({
        "one": 1.0,
        "x1": rng.randn(n),
        "x2": rng.randn(n),
        "z": rng.randn(n),
        "w": rng.uniform(0.5, 2.0, size=n),
        "fe": rng.randint(0, 7, size=n),
    })
    pdf["x1"] = pdf["x1"] + 0.5 * pdf["z"]
    pdf["y"] = 1.0 + 2.0 * pdf["x1"] - 1.0 * pdf["x2"] + rng.randn(n)
    return pdf


def _with_null_rows(pdf, col, k=25):
    extra = pdf.head(k).copy()
    extra[col] = np.nan
    return pd.concat([pdf, extra], ignore_index=True)


def test_wls_null_y_rows_ignored(spark, null_pdf):
    """ADVICE r12: a NULL-y row must change neither b nor dof — the
    moment sums and n share one estimating-sample mask."""
    from hdfe_spark.operators.estimate import wls

    clean = wls(spark.createDataFrame(null_pdf), "y", ["one", "x1", "x2"],
                "w", estimate_variance=True)
    dirty = wls(spark.createDataFrame(_with_null_rows(null_pdf, "y")),
                "y", ["one", "x1", "x2"], "w", estimate_variance=True)
    assert dirty.n == clean.n == len(null_pdf)
    np.testing.assert_allclose(dirty.b, clean.b, rtol=1e-12)
    np.testing.assert_allclose(dirty.V[0], clean.V[0], rtol=1e-12)


def test_wls_null_x_and_w_rows_ignored(spark, null_pdf):
    from hdfe_spark.operators.estimate import wls

    clean = wls(spark.createDataFrame(null_pdf), "y", ["one", "x1"],
                "w", estimate_variance=True)
    for col in ("x1", "w"):
        dirty = wls(spark.createDataFrame(_with_null_rows(null_pdf, col)),
                    "y", ["one", "x1"], "w", estimate_variance=True)
        assert dirty.n == clean.n
        np.testing.assert_allclose(dirty.b, clean.b, rtol=1e-12)


def test_wls_negative_weight_raises(spark, null_pdf):
    from hdfe_spark.operators.estimate import wls

    bad = null_pdf.copy()
    bad.loc[3, "w"] = -1.0
    with pytest.raises(ValueError, match="negative weight"):
        wls(spark.createDataFrame(bad), "y", ["one", "x1"], "w")


def test_iv_2sls_null_rows_ignored(spark, null_pdf):
    """Same contract for 2SLS: NULL in y, x, OR the instrument drops
    the row from every moment block and from n."""
    from hdfe_spark.operators.estimate import iv_2sls

    clean = iv_2sls(spark.createDataFrame(null_pdf), "y", "x1", "z",
                    x_exog=["one", "x2"], estimate_variance=True)
    for col in ("y", "x1", "z"):
        dirty = iv_2sls(spark.createDataFrame(_with_null_rows(null_pdf, col)),
                        "y", "x1", "z", x_exog=["one", "x2"],
                        estimate_variance=True)
        assert dirty.n == clean.n == len(null_pdf)
        np.testing.assert_allclose(dirty.b, clean.b, rtol=1e-12)
        np.testing.assert_allclose(dirty.V[0], clean.V[0], rtol=1e-12)


def test_fit_stats_null_rows_ignored(spark, null_pdf):
    """Both fit_stats paths (centered and absorbed-FE) estimate on the
    complete-row sample only; NULL rows change nothing."""
    from hdfe_spark.operators.estimate import fit_stats

    for cc in (None, ["fe"]):
        clean = fit_stats(spark.createDataFrame(null_pdf), "y",
                          ["x1", "x2"], categorical_controls=cc)
        dirty = fit_stats(
            spark.createDataFrame(_with_null_rows(null_pdf, "y")),
            "y", ["x1", "x2"], categorical_controls=cc)
        assert dirty["n"] == clean["n"] == len(null_pdf)
        assert dirty["n_groups"] == clean["n_groups"]
        assert abs(dirty["r2"] - clean["r2"]) < 1e-12
        assert abs(dirty["f_stat"] - clean["f_stat"]) < 1e-9


# ------------------------------------------------------- hausman degenerate


def test_hausman_degenerate_convention(spark, null_pdf):
    """ADVICE r12: dof=0 must come with an explicit degenerate flag
    and p_value=1.0 so callers never evaluate a 0-dof chi-square.
    Comparing a fit against ITSELF forces dV = 0 -> degenerate."""
    from hdfe_spark.operators.estimate import estimate, hausman

    sdf = spark.createDataFrame(null_pdf)
    fit = estimate(sdf, "y", ["x1", "x2"], estimate_variance=True)
    out = hausman(fit, fit)
    assert out["degenerate"] is True
    assert out["dof"] == 0
    assert out["h_stat"] == 0.0
    assert out["p_value"] == 1.0
    # non-degenerate case carries the flag too (False): make x mostly
    # BETWEEN-group variation so the within fit is much noisier than
    # the pooled one (dV strictly positive)
    rng = np.random.RandomState(133)
    n = 400
    fe = rng.randint(0, 5, size=n)
    fe_eff = np.array([0.0, 2.0, -1.0, 3.0, 1.0])
    x = fe_eff[fe] + 0.05 * rng.randn(n)
    y = 1.5 * x + rng.randn(n)
    sdf2 = spark.createDataFrame(pd.DataFrame({"y": y, "x": x, "fe": fe}))
    fe_fit = estimate(sdf2, "y", ["x"], categorical_controls=["fe"],
                      estimate_variance=True)
    pooled2 = estimate(sdf2, "y", ["x"], estimate_variance=True)
    out2 = hausman(fe_fit, pooled2)
    assert out2["degenerate"] is False
    assert out2["dof"] >= 1
    assert "p_value" not in out2


# ------------------------------------------------------------ new operators


def test_cuped_by_matches_numpy(spark):
    from hdfe_spark.operators.stats import cuped_by

    rng = np.random.RandomState(134)
    n = 6000
    g = rng.randint(0, 5, size=n)
    arm = np.where(rng.uniform(size=n) < 0.5, "t", "c")
    x = rng.randn(n)                      # pre-period covariate
    y = 0.8 * x + rng.randn(n) + np.where(arm == "t", 0.1, 0.0)
    # keep values on the 1e-6 grid so the scaled moments are exact
    x = np.round(x, 6)
    y = np.round(y, 6)
    pdf = pd.DataFrame({"g": g, "arm": arm, "y": y, "x": x})
    out = (
        cuped_by(spark.createDataFrame(pdf), "g", "arm", "y", "x", "c", "t")
        .toPandas().set_index("g").sort_index()
    )
    for gi in range(5):
        s = pdf[pdf["g"] == gi]
        theta = np.cov(s["y"], s["x"], ddof=0)[0, 1] / s["x"].var(ddof=0)
        a, b = s[s["arm"] == "c"], s[s["arm"] == "t"]
        raw = b["y"].mean() - a["y"].mean()
        adj = raw - theta * (b["x"].mean() - a["x"].mean())
        rho2 = np.corrcoef(s["y"], s["x"])[0, 1] ** 2
        r = out.loc[gi]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert abs(r["theta"] - theta) < 1e-7
        assert abs(r["diff_raw"] - raw) < 1e-9
        assert abs(r["diff_cuped"] - adj) < 1e-8
        assert abs(r["rho2"] - rho2) < 1e-7
        # CUPED with a rho~0.6 covariate should land closer to the
        # true 0.1 effect's noise floor than the raw contrast spread
        assert r["rho2"] > 0.3


def test_cuped_by_null_and_thin_guards(spark):
    from hdfe_spark.operators.stats import cuped_by

    pdf = pd.DataFrame({
        "g": [0] * 6 + [1] * 3,
        "arm": ["c", "c", "t", "t", "c", "t", "c", "c", "t"],
        "y": [1.0, 2.0, 3.0, 4.0, np.nan, 5.0, 1.0, 2.0, 3.0],
        "x": [0.5, 1.0, 1.5, 2.0, 9.0, np.nan, 1.0, 1.0, 1.0],
    })
    out = (
        cuped_by(spark.createDataFrame(pdf), "g", "arm", "y", "x", "c", "t")
        .toPandas().set_index("g").sort_index()
    )
    # group 0: NULL y and NULL x rows are outside the estimating
    # sample entirely (shared mask) -> n_a=2, n_b=2
    assert out.loc[0, "n_a"] == 2 and out.loc[0, "n_b"] == 2
    s = pdf.dropna()
    s0 = s[s["g"] == 0]
    theta0 = (
        np.cov(s0["y"], s0["x"], ddof=0)[0, 1] / s0["x"].var(ddof=0)
    )
    assert abs(out.loc[0, "theta"] - theta0) < 1e-7
    # group 1: thin arm (n_b=1) and zero covariate variance -> NULLs
    assert pd.isna(out.loc[1, "theta"])
    assert pd.isna(out.loc[1, "diff_cuped"])
    assert pd.isna(out.loc[1, "diff_raw"])


def test_smd_by_matches_numpy(spark):
    from hdfe_spark.operators.stats import smd_by

    rng = np.random.RandomState(135)
    n = 4000
    arm = np.where(rng.uniform(size=n) < 0.4, "t", "c")
    pdf = pd.DataFrame({
        "arm": arm,
        "age": np.round(rng.uniform(18, 80, size=n), 6),
        "spend": np.round(rng.lognormal(3, 1, size=n)
                          + np.where(arm == "t", 5.0, 0.0), 6),
    })
    pdf.loc[pdf.index[:50], "age"] = np.nan  # pairwise deletion
    out = (
        smd_by(spark.createDataFrame(pdf), "arm", ["age", "spend"],
               "c", "t")
        .toPandas().set_index("covariate")
    )
    for c in ("age", "spend"):
        s = pdf[["arm", c]].dropna()
        a = s.loc[s["arm"] == "c", c]
        b = s.loc[s["arm"] == "t", c]
        smd = (b.mean() - a.mean()) / np.sqrt(
            (a.var(ddof=1) + b.var(ddof=1)) / 2.0
        )
        r = out.loc[c]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert abs(r["mean_a"] - a.mean()) < 1e-9 * max(1, abs(a.mean()))
        assert abs(r["smd"] - smd) < 1e-7
    # the shifted covariate is flagged, the balanced one is not
    assert abs(out.loc["spend", "smd"]) > 0.1
    assert abs(out.loc["age", "smd"]) < 0.1


def test_smd_by_thin_arm_null(spark):
    from hdfe_spark.operators.stats import smd_by

    pdf = pd.DataFrame({
        "arm": ["c", "c", "c", "t"],
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    out = smd_by(spark.createDataFrame(pdf), "arm", ["v"], "c", "t").collect()
    assert out[0]["n_b"] == 1
    assert out[0]["smd"] is None


def test_power_sample_size_by_matches_numpy(spark):
    from hdfe_spark.operators.stats import power_sample_size_by

    rng = np.random.RandomState(140)
    n = 4000
    g = rng.randint(0, 4, size=n)
    arm = np.where(rng.uniform(size=n) < 0.5, "c", "t")
    v = np.round(rng.randn(n) * (1 + g), 6)
    pdf = pd.DataFrame({"g": g, "arm": arm, "v": v})
    out = (
        power_sample_size_by(
            spark.createDataFrame(pdf), "g", "arm", "v", "c", "t",
            target_effect=0.2)
        .toPandas().set_index("g").sort_index()
    )
    z = 1.959963984540054 + 0.8416212335729143
    for gi in range(4):
        s = pdf[pdf["g"] == gi]
        va = s.loc[s["arm"] == "c", "v"].var(ddof=1)
        vb = s.loc[s["arm"] == "t", "v"].var(ddof=1)
        need = int(np.ceil(z * z * (va + vb) / 0.04))
        r = out.loc[gi]
        assert r["n_required_per_arm"] == need
        assert abs(r["fill_fraction"]
                   - min(r["n_a"], r["n_b"]) / need) < 1e-12
    with pytest.raises(ValueError, match="target_effect"):
        power_sample_size_by(spark.createDataFrame(pdf), "g", "arm",
                             "v", "c", "t", target_effect=0.0)


def test_tost_by_verdicts(spark):
    """Group 0: identical arms -> provably equivalent inside ±0.5.
    Group 1: a 2.0 shift -> NOT equivalent. Group 2: n=4 per arm ->
    the z margin can't close -> not equivalent despite equal means.
    Group 3: a 1-row arm -> NULL verdict (thin guard), never a
    false 'equivalent'."""
    from hdfe_spark.operators.stats import tost_by

    rng = np.random.RandomState(141)
    rows = []
    for gi, (shift, m) in enumerate(
        ((0.0, 2000), (2.0, 2000), (0.0, 8), (0.0, 3))
    ):
        for i in range(m):
            arm = "t" if i % 2 == 0 else "c"
            rows.append((gi, arm,
                         round(rng.randn() * 0.5
                               + (shift if arm == "t" else 0.0), 6)))
    pdf = pd.DataFrame(rows, columns=["g", "arm", "v"])
    out = (
        tost_by(spark.createDataFrame(pdf), "g", "arm", "v", "c", "t",
                margin=0.5)
        .toPandas().set_index("g").sort_index()
    )
    assert out.loc[0, "equivalent"] == True  # noqa: E712
    assert out.loc[1, "equivalent"] == False  # noqa: E712
    assert out.loc[2, "equivalent"] == False  # noqa: E712
    assert pd.isna(out.loc[3, "equivalent"])
    # z replica for group 0
    s = pdf[pdf["g"] == 0]
    a = s.loc[s["arm"] == "c", "v"]
    b = s.loc[s["arm"] == "t", "v"]
    se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    diff = b.mean() - a.mean()
    assert abs(out.loc[0, "z_lower"] - (diff + 0.5) / se) < 1e-9
    assert abs(out.loc[0, "z_upper"] - (diff - 0.5) / se) < 1e-9


def test_qte_by_matches_numpy(spark):
    """Treatment shifts ONLY the upper half: median qte ~ 0, p90 qte
    ~ shift — the readout welch_by cannot give."""
    from hdfe_spark.operators.stats import qte_by

    rng = np.random.RandomState(142)
    n = 20000
    g = rng.randint(0, 2, size=n)
    arm = np.where(rng.uniform(size=n) < 0.5, "c", "t")
    base = rng.uniform(0, 1, size=n)
    v = np.where((arm == "t") & (base > 0.5), base + 1.0, base)
    pdf = pd.DataFrame({"g": g, "arm": arm, "v": np.round(v, 9)})
    out = qte_by(spark.createDataFrame(pdf), "g", "arm", "v", "c", "t",
                 probs=(0.25, 0.9)).toPandas()
    out = out.set_index(["g", "p"]).sort_index()
    for gi in range(2):
        s = pdf[pdf["g"] == gi]
        a = s.loc[s["arm"] == "c", "v"].to_numpy()
        b = s.loc[s["arm"] == "t", "v"].to_numpy()
        for p in (0.25, 0.9):
            qa = np.quantile(a, p)  # linear interpolation = percentile
            qb = np.quantile(b, p)
            r = out.loc[(gi, p)]
            assert abs(r["q_a"] - qa) < 1e-12
            assert abs(r["q_b"] - qb) < 1e-12
            assert abs(r["qte"] - (qb - qa)) < 1e-12
        # shape: no effect at p25, ~1.0 effect at p90
        assert abs(out.loc[(gi, 0.25), "qte"]) < 0.05
        assert out.loc[(gi, 0.9), "qte"] > 0.8


def test_qte_by_accuracy_sketch_path(spark):
    """The billion-row-group escape hatch: accuracy switches every
    cut to the GK sketch; values stay within the 1/accuracy rank
    band of the exact path."""
    from hdfe_spark.operators.stats import qte_by

    rng = np.random.RandomState(143)
    n = 30000
    pdf = pd.DataFrame({
        "g": np.zeros(n, dtype=np.int64),
        "arm": np.where(np.arange(n) % 2 == 0, "c", "t"),
        "v": np.sort(rng.uniform(0, 1, n)),
    })
    sdf = spark.createDataFrame(pdf)
    exact = qte_by(sdf, "g", "arm", "v", "c", "t",
                   probs=(0.5,)).collect()[0]
    approx = qte_by(sdf, "g", "arm", "v", "c", "t", probs=(0.5,),
                    accuracy=10000).collect()[0]
    # rank error 1/10000 of 15000 rows/arm -> value band ~2e-4 on U(0,1)
    assert abs(approx["q_a"] - exact["q_a"]) < 5e-4
    assert abs(approx["q_b"] - exact["q_b"]) < 5e-4
    with pytest.raises(ValueError, match="accuracy"):
        qte_by(sdf, "g", "arm", "v", "c", "t", accuracy=0)


def test_streaming_cuped_equals_batch(spark, sf_dir):
    """availableNow fold == the batch cuped_by table exactly (the
    additive-counter argument; the streaming_welch precedent)."""
    from pyspark.sql import functions as F2

    from hdfe_spark.operators.stats import cuped_by
    from hdfe_spark.streaming.ops import read_table_stream, streaming_cuped

    sel = lambda d: d.select(  # noqa: E731
        F2.col("l_linenumber").cast("long").alias("seg"),
        F2.col("l_returnflag").alias("arm"),
        F2.col("l_extendedprice").alias("y"),
        F2.col("l_quantity").alias("x"),
    )
    stream = sel(read_table_stream(spark, sf_dir, "lineitem"))
    out = streaming_cuped(stream, "seg", "arm", "y", "x", "A", "R")
    import uuid
    sink = "t" + uuid.uuid4().hex[:12]
    q = (
        out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table(sink).toPandas().set_index("seg").sort_index()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = (
        cuped_by(sel(li), "seg", "arm", "y", "x", "A", "R")
        .toPandas().set_index("seg").sort_index()
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_wls_within_matches_numpy(spark, null_pdf):
    """Weighted one-FE within estimation: weighted demeaning + wls ==
    the numpy weighted-dummy regression (FWL under GLS weighting),
    with the within dof n - G - k in the variance."""
    from hdfe_spark.operators.estimate import wls_within

    pdf = null_pdf
    res = wls_within(spark.createDataFrame(pdf), "y", ["x1", "x2"],
                     "fe", "w", estimate_variance=True)
    wv = pdf["w"].to_numpy()
    X = pdf[["x1", "x2"]].to_numpy()
    yv = pdf["y"].to_numpy()
    fe = pdf["fe"].to_numpy()
    # weighted demeaning replica
    import pandas as pd2
    tmp = pd2.DataFrame({"fe": fe, "w": wv})
    Xd = X.copy().astype(float)
    for j in range(2):
        tmp["wc"] = wv * X[:, j]
        m = tmp.groupby("fe").apply(
            lambda s: s["wc"].sum() / s["w"].sum())
        Xd[:, j] = X[:, j] - m[fe].to_numpy()
    tmp["wc"] = wv * yv
    m = tmp.groupby("fe").apply(lambda s: s["wc"].sum() / s["w"].sum())
    yd = yv - m[fe].to_numpy()
    G = Xd.T @ (Xd * wv[:, None])
    bt = np.linalg.solve(G, Xd.T @ (wv * yd))
    np.testing.assert_allclose(res.b[:, 0], bt, rtol=1e-9)
    e = yd - Xd @ bt
    ng = len(np.unique(fe))
    sigma2 = float(wv @ (e * e)) / (len(pdf) - ng - 2)
    V = np.linalg.inv(G) * sigma2
    np.testing.assert_allclose(res.V[0], V, rtol=1e-7)
    assert res.n_absorbed == ng


def test_wls_within_unit_weights_equal_within(spark, null_pdf):
    """With unit weights the estimator equals the plain within plan's
    slopes."""
    from hdfe_spark.operators.estimate import estimate, wls_within

    pdf = null_pdf.assign(ones=1.0)
    sdf = spark.createDataFrame(pdf)
    r_w = wls_within(sdf, "y", ["x1", "x2"], "fe", "ones")
    r_o = estimate(sdf, "y", ["x1", "x2"], categorical_controls=["fe"])
    np.testing.assert_allclose(r_w.b[:, 0], r_o.slopes[:, 0], rtol=1e-9)


def test_dml_plm_matches_numpy(spark):
    """Double-ML partial-linear model: theta/se match the full numpy
    cross-fitting replica; theta recovers the structural effect."""
    from hdfe_spark.operators.causal import dml_plm

    rng = np.random.RandomState(145)
    n = 8000
    ids = np.arange(n, dtype=np.int64)
    x1 = rng.randn(n)
    x2 = rng.randn(n)
    d = 0.7 * x1 - 0.3 * x2 + rng.randn(n)      # m(x) + v
    y = 1.5 * d + 2.0 * x1 + 1.0 * x2 + rng.randn(n)
    pdf = pd.DataFrame({"id": ids, "y": y, "d": d, "x1": x1, "x2": x2})
    row = dml_plm(spark.createDataFrame(pdf), "y", "d", ["x1", "x2"],
                  id_col="id", n_folds=2).collect()[0]
    # numpy replica
    X = np.column_stack([np.ones(n), x1, x2])
    fold = ids % 2
    ry = np.empty(n)
    rv = np.empty(n)
    for f in (0, 1):
        m = fold == f
        o = ~m
        by = np.linalg.solve(X[o].T @ X[o], X[o].T @ y[o])
        bd = np.linalg.solve(X[o].T @ X[o], X[o].T @ d[o])
        ry[m] = y[m] - X[m] @ by
        rv[m] = d[m] - X[m] @ bd
    theta = float(rv @ ry) / float(rv @ rv)
    eps = ry - theta * rv
    se = float(np.sqrt((rv * rv * eps * eps).sum())) / float(rv @ rv)
    assert abs(row["theta"] - theta) < 1e-9 * max(1, abs(theta))
    assert abs(row["se"] - se) < 1e-9
    assert row["n_used"] == n
    assert abs(row["theta"] - 1.5) < 0.05  # structural effect


def test_dml_plm_guards(spark):
    from hdfe_spark.operators.causal import dml_plm

    pdf = pd.DataFrame({
        "id": [0, 1, 2, 3],
        "y": [1.0, 2.0, 3.0, 4.0],
        "d": [1.0, 2.0, 3.0, 4.0],
        "x": [1.0, 2.0, 3.0, 4.0],
    })
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="n_folds"):
        dml_plm(sdf, "y", "d", "x", id_col="id", n_folds=1)
    # d perfectly collinear with x -> residualized d has ~no variance
    with pytest.raises(ValueError, match="variance|collinear"):
        dml_plm(sdf, "y", "d", "x", id_col="id", n_folds=2).collect()


def test_dml_plm_null_rows_ignored(spark):
    from hdfe_spark.operators.causal import dml_plm

    rng = np.random.RandomState(146)
    n = 2000
    ids = np.arange(n, dtype=np.int64)
    x = rng.randn(n)
    d = 0.5 * x + rng.randn(n)
    y = 1.0 * d + x + rng.randn(n)
    pdf = pd.DataFrame({"id": ids, "y": y, "d": d, "x": x})
    clean = dml_plm(spark.createDataFrame(pdf), "y", "d", "x",
                    id_col="id").collect()[0]
    extra = pdf.head(50).copy()
    extra["y"] = np.nan
    dirty = dml_plm(
        spark.createDataFrame(pd.concat([pdf, extra],
                                        ignore_index=True)),
        "y", "d", "x", id_col="id").collect()[0]
    assert dirty["n_used"] == clean["n_used"] == n
    assert abs(dirty["theta"] - clean["theta"]) < 1e-12
