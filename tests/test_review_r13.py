"""Round-13 review pins: the DECIMAL(38,0) overflow guard on the
exact-moment family, ri_pvalue's explicit design-rate parameter, and
the decimal-exact hausman fixture's engine-side algebra."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401


def _huge_pdf():
    # The window the guard owns: every per-row product and per-arm
    # sum FITS decimal(38,0) (u = ±4.8e18, u² = 2.3e37, ss ≈ 4.6e37,
    # mixed signs keep |s| ≈ 0), but the variance numerator's n·ss
    # would overflow — under Spark 4's default ANSI mode that multiply
    # raises a bare NUMERIC_VALUE_OUT_OF_RANGE mid-aggregation (and
    # under non-ANSI it NULLs silently); the guard converts both into
    # a named, actionable error BEFORE the multiply is attempted.
    return pd.DataFrame({
        "g": [0, 0, 0, 0],
        "arm": ["a", "a", "b", "b"],
        "v": [4.8e12, -4.8e12, 4.8e12, -4.8e12],
        "x": [1.0, 2.0, 3.0, 4.0],
    })


def test_welch_by_overflow_guard_raises(spark):
    from hdfe_spark.operators.stats import welch_by

    out = welch_by(spark.createDataFrame(_huge_pdf()), "g", "arm", "v",
                   "a", "b")
    with pytest.raises(Exception, match="overflow DECIMAL"):
        out.collect()


def test_cuped_by_overflow_guard_raises(spark):
    from hdfe_spark.operators.stats import cuped_by

    out = cuped_by(spark.createDataFrame(_huge_pdf()), "g", "arm", "v",
                   "x", "a", "b")
    with pytest.raises(Exception, match="overflow DECIMAL"):
        out.collect()


def test_smd_by_overflow_guard_raises(spark):
    from hdfe_spark.operators.stats import smd_by

    out = smd_by(spark.createDataFrame(_huge_pdf()), "arm", ["v"],
                 "a", "b")
    with pytest.raises(Exception, match="overflow DECIMAL"):
        out.collect()


def test_welch_by_guard_transparent_on_sane_data(spark):
    """The guard must not perturb values in the safe regime."""
    from hdfe_spark.operators.stats import welch_by

    rng = np.random.RandomState(136)
    pdf = pd.DataFrame({
        "g": np.zeros(200, dtype=np.int64),
        "arm": np.where(np.arange(200) % 2 == 0, "a", "b"),
        "v": np.round(rng.randn(200), 6),
    })
    row = welch_by(spark.createDataFrame(pdf), "g", "arm", "v",
                   "a", "b").collect()[0]
    a = pdf.loc[pdf["arm"] == "a", "v"]
    b = pdf.loc[pdf["arm"] == "b", "v"]
    assert abs(row["var_a"] - a.var(ddof=1)) < 1e-12
    assert abs(row["var_b"] - b.var(ddof=1)) < 1e-12


def test_ri_pvalue_treat_frac_matches_autocalibration(spark):
    """Passing the known design rate must reproduce the
    auto-calibrated threshold exactly when the observed fraction
    equals it (here 2500/10000 = 0.25 exactly, and
    int(M*0.25) == (M*2500)//10000)."""
    from hdfe_spark.operators.causal import ri_pvalue

    rng = np.random.RandomState(137)
    n = 10000
    ids = np.arange(n, dtype=np.int64)
    t = ids % 4 == 0  # exactly 25%
    y = rng.randn(n)
    pdf = pd.DataFrame({"id": ids, "t": t, "y": y})
    sdf = spark.createDataFrame(pdf)
    auto = ri_pvalue(sdf, "y", "t", n_perm=19, id_col="id").collect()[0]
    fixed = ri_pvalue(sdf, "y", "t", n_perm=19, id_col="id",
                      treat_frac=0.25).collect()[0]
    assert auto["p_value"] == fixed["p_value"]
    assert auto["observed"] == fixed["observed"]
    with pytest.raises(ValueError, match="treat_frac"):
        ri_pvalue(sdf, "y", "t", id_col="id", treat_frac=1.5)


def test_wls_iv_decimal_moments_exact(spark):
    """The hausman_iv fixture path: DECIMAL(12,2) inputs make every
    wls/iv moment an exact decimal sum, so slopes match an exact-
    fraction replica to the last ulp of the final division."""
    from hdfe_spark.operators.estimate import iv_2sls, wls

    rng = np.random.RandomState(138)
    n = 5000
    x = np.round(rng.uniform(1, 50, n), 2)
    y = np.round(3.0 * x + rng.uniform(0, 10, n), 2)
    z = np.minimum(x, 25.0)
    pdf = pd.DataFrame({"x": x, "y": y, "z": z, "one": 1})
    sdf = spark.createDataFrame(pdf).select(
        F.col("x").cast("decimal(12,2)").alias("x"),
        F.col("y").cast("decimal(12,2)").alias("y"),
        F.col("z").cast("decimal(12,2)").alias("z"),
        F.lit(1).cast("decimal(1,0)").alias("one"),
    )
    eff = wls(sdf, "y", ["x"], weights="one")
    cons = iv_2sls(sdf, "y", "x", "z")
    # exact integer moments at 2 decimals: scale by 100
    xi = np.round(x * 100).astype(object)  # python ints: no overflow
    yi = np.round(y * 100).astype(object)
    zi = np.round(z * 100).astype(object)
    sxx = int(sum(xi * xi))
    sxy = int(sum(xi * yi))
    szx = int(sum(zi * xi))
    szy = int(sum(zi * yi))
    b_ols = (sxy / 1e4) / (sxx / 1e4)
    szz = int(sum(zi * zi))
    xpx = ((szx / 1e4) * (1.0 / (szz / 1e4))) * (szx / 1e4)
    xpy = ((szx / 1e4) * (1.0 / (szz / 1e4))) * (szy / 1e4)
    b_iv = xpy / xpx
    assert abs(float(eff.b[0, 0]) - b_ols) < 1e-12 * abs(b_ols)
    assert abs(float(cons.b[0, 0]) - b_iv) < 1e-10 * abs(b_iv)


# ------------------------------------------------- second review pass (r13b)


def test_funnel_repeated_step_types(spark):
    """review r13b: a 'view -> click -> view' funnel must complete
    when the SAME type appears at two step positions — the greedy
    fold compares the event's type id against the NEEDED step's id,
    not a single event-to-step map."""
    from hdfe_spark.operators.sessions import funnel

    pdf = pd.DataFrame({
        "u": [1, 1, 1, 2, 2],
        "t": [10, 20, 30, 5, 6],
        "e": ["view", "click", "view", "view", "click"],
    })
    out = (
        funnel(spark.createDataFrame(pdf), "u", "t", "e",
               ["view", "click", "view"])
        .toPandas().set_index("u").sort_index()
    )
    assert out.loc[1, "steps_completed"] == 3
    assert (out.loc[1, "t_1"], out.loc[1, "t_2"], out.loc[1, "t_3"]) \
        == (10, 20, 30)
    assert out.loc[2, "steps_completed"] == 2
    assert pd.isna(out.loc[2, "t_3"])


def test_qte_by_nonstring_arm_values(spark):
    """review r13b: arm values bind via F.lit, so dates (and other
    non-repr-able literals) work exactly as they do in welch_by."""
    from datetime import date

    from hdfe_spark.operators.stats import qte_by

    pdf = pd.DataFrame({
        "g": [0] * 8,
        "arm": [date(2026, 1, 1), date(2026, 1, 2)] * 4,
        "v": [1.0, 5.0, 2.0, 6.0, 3.0, 7.0, 4.0, 8.0],
    })
    out = qte_by(spark.createDataFrame(pdf), "g", "arm", "v",
                 date(2026, 1, 1), date(2026, 1, 2),
                 probs=(0.5,)).collect()[0]
    assert out["q_a"] == 2.5 and out["q_b"] == 6.5
    assert out["qte"] == 4.0


def test_qte_by_output_collision_guard(spark):
    from hdfe_spark.operators.stats import qte_by

    pdf = pd.DataFrame({"p": [0, 0], "arm": ["a", "b"],
                        "v": [1.0, 2.0]})
    with pytest.raises(ValueError, match="collid|output"):
        qte_by(spark.createDataFrame(pdf), "p", "arm", "v", "a", "b")


def test_wls_within_zero_weight_group_excluded(spark):
    """review r13b: an FE level whose rows all carry weight 0 must
    not count toward n, n_absorbed, or the within dof."""
    from hdfe_spark.operators.estimate import wls_within

    rng = np.random.RandomState(144)
    n = 300
    pdf = pd.DataFrame({
        "fe": np.arange(n) % 3,
        "x": rng.randn(n),
        "w": 1.0,
    })
    pdf["y"] = 2.0 * pdf["x"] + rng.randn(n)
    # group 2 -> all weights zero
    pdf.loc[pdf["fe"] == 2, "w"] = 0.0
    res = wls_within(spark.createDataFrame(pdf), "y", ["x"], "fe", "w",
                     estimate_variance=True)
    kept = pdf[pdf["fe"] != 2]
    assert res.n == len(kept)
    assert res.n_absorbed == 2
    # replica on the kept sample
    Xd = kept.groupby("fe")["x"].transform(lambda s: s - s.mean())
    yd = kept.groupby("fe")["y"].transform(lambda s: s - s.mean())
    bt = float((Xd * yd).sum() / (Xd * Xd).sum())
    assert abs(float(res.b[0, 0]) - bt) < 1e-9


# -------------------------------------------------- third review pass (r13c)


def test_dml_plm_collinear_x_raises_domain_error(spark):
    """review r13c: exactly- or near-collinear x must raise the
    domain ValueError (naming the fix), never a raw LinAlgError or a
    silently-garbage theta."""
    from hdfe_spark.operators.causal import dml_plm

    rng = np.random.RandomState(147)
    n = 400
    x1 = rng.randn(n)
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x1": x1,
        "x2": x1,  # exact copy
        "d": rng.randn(n),
        "y": rng.randn(n),
    })
    with pytest.raises(ValueError, match="collinear"):
        dml_plm(spark.createDataFrame(pdf), "y", "d", ["x1", "x2"],
                id_col="id")
    pdf["x2"] = x1 + 1e-10 * rng.randn(n)  # near-collinear
    with pytest.raises(ValueError, match="collinear"):
        dml_plm(spark.createDataFrame(pdf), "y", "d", ["x1", "x2"],
                id_col="id")


def test_dml_plm_nan_rows_excluded(spark):
    """review r13c: NaN (not NULL) rows leave the estimating sample
    like NULLs instead of poisoning every moment."""
    from hdfe_spark.operators.causal import dml_plm

    rng = np.random.RandomState(148)
    n = 2000
    ids = np.arange(n, dtype=np.int64)
    x = rng.randn(n)
    d = 0.5 * x + rng.randn(n)
    y = 1.0 * d + x + rng.randn(n)
    pdf = pd.DataFrame({"id": ids, "y": y, "d": d, "x": x})
    clean = dml_plm(spark.createDataFrame(pdf), "y", "d", "x",
                    id_col="id").collect()[0]
    dirty_pdf = pd.concat(
        [pdf, pdf.head(40).assign(y=float("nan"),
                                  id=ids[:40] + n)],
        ignore_index=True,
    )
    # force NaN through (createDataFrame may map NaN->null depending
    # on the arrow path; either way the result must equal clean)
    dirty = dml_plm(spark.createDataFrame(dirty_pdf), "y", "d", "x",
                    id_col="id").collect()[0]
    assert dirty["n_used"] == clean["n_used"] == n
    assert abs(dirty["theta"] - clean["theta"]) < 1e-12


def test_dml_plm_noncastable_id_raises(spark):
    from hdfe_spark.operators.causal import dml_plm

    pdf = pd.DataFrame({
        "id": ["u_1", "u_2", "u_3", "u_4"],
        "y": [1.0, 2.0, 3.0, 4.0],
        "d": [1.0, 0.0, 1.0, 0.0],
        "x": [0.1, 0.2, 0.3, 0.4],
    })
    with pytest.raises(ValueError, match="cast"):
        dml_plm(spark.createDataFrame(pdf), "y", "d", "x", id_col="id")
