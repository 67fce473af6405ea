"""Pins for the four round-13 ADVICE items.

1. The moment estimators (`wls`, `iv_2sls`, `fit_stats`,
   `wls_within`) treat NaN as missing: a NaN in any x/y/weight
   column drops the row from the shared listwise mask instead of
   poisoning every moment (the `dml_plm` discipline).
2. `dml_plm`'s single-x nuisance solve is the closed-form Cramer
   expression (identical operation order to the SQL oracle), not
   LAPACK — ulp-level cross-engine parity.
3. Driver-side scalar rounding in `_q_hausman_iv` /
   `_q_ols_wls_fe` / `_q_dml_plm` uses the `_fround`
   floor(x·10^d + 0.5)/10^d spelling, not Python round() (banker's).
4. `ri_pvalue`'s multiplier family skips pk ≡ 0 (mod M) (first at
   k = 500000 for M = 1000003) and the stale "pk < 1e7" bound is
   gone.
"""

import math

import numpy as np
import pytest


# ---------------------------------------------------------- item 1


def _nan_df(spark):
    rows = [
        # (w, x1, x2, y, fe)  — row 3 carries a NaN x1, row 4 a NaN y,
        # row 5 a NaN w: all three must drop from every estimator.
        (1.0, 1.0, 2.0, 5.0, 1),
        (2.0, 2.0, 1.0, 7.0, 1),
        (1.0, float("nan"), 3.0, 6.0, 2),
        (1.0, 3.0, 1.0, float("nan"), 2),
        (float("nan"), 2.0, 2.0, 8.0, 2),
        (1.5, 4.0, 5.0, 11.0, 2),
        (1.0, 2.5, 0.5, 6.5, 1),
    ]
    return spark.createDataFrame(
        rows, "w double, x1 double, x2 double, y double, fe int"
    )


def _clean_df(spark):
    full = _nan_df(spark)
    import pyspark.sql.functions as F

    cond = None
    for c in ["w", "x1", "x2", "y"]:
        p = ~F.isnan(F.col(c))
        cond = p if cond is None else cond & p
    return full.filter(cond)


def test_wls_nan_rows_drop(spark):
    from hdfe_spark.operators.estimate import wls

    a = wls(_nan_df(spark), "y", ["x1", "x2"], weights="w",
            estimate_variance=True)
    b = wls(_clean_df(spark), "y", ["x1", "x2"], weights="w",
            estimate_variance=True)
    assert a.n == b.n == 4
    np.testing.assert_allclose(a.b, b.b, rtol=1e-12)
    assert np.isfinite(a.b).all()
    np.testing.assert_allclose(a.V[0], b.V[0], rtol=1e-12)


def test_iv_2sls_nan_rows_drop(spark):
    import pyspark.sql.functions as F

    from hdfe_spark.operators.estimate import iv_2sls

    a = iv_2sls(_nan_df(spark), "y", "x1", "x2")
    # iv_2sls's inputs are (y, x1, x2) — the NaN-w row stays (w is
    # not part of its estimating sample), so the clean twin filters
    # only the columns the estimator reads.
    clean = _nan_df(spark).filter(
        ~F.isnan("x1") & ~F.isnan("x2") & ~F.isnan("y")
    )
    b = iv_2sls(clean, "y", "x1", "x2")
    assert a.n == b.n == 5
    np.testing.assert_allclose(a.b, b.b, rtol=1e-12)
    assert np.isfinite(a.b).all()


def test_fit_stats_nan_rows_drop(spark):
    import pyspark.sql.functions as F

    from hdfe_spark.operators.estimate import fit_stats

    # fit_stats reads (y, x1, x2) — the NaN-w row stays in sample
    clean = _nan_df(spark).filter(
        ~F.isnan("x1") & ~F.isnan("x2") & ~F.isnan("y")
    )
    a = fit_stats(_nan_df(spark), "y", ["x1", "x2"])
    b = fit_stats(clean, "y", ["x1", "x2"])
    assert a["n"] == b["n"] == 5
    assert math.isfinite(a["r2"])
    assert a["r2"] == pytest.approx(b["r2"], rel=1e-12)
    # and the within (absorbed-FE) branch reads (y, x1)
    clean1 = _nan_df(spark).filter(~F.isnan("x1") & ~F.isnan("y"))
    af = fit_stats(_nan_df(spark), "y", ["x1"], categorical_controls="fe")
    bf = fit_stats(clean1, "y", ["x1"], categorical_controls="fe")
    assert af["n"] == bf["n"] == 5
    assert math.isfinite(af["r2"])
    assert af["r2"] == pytest.approx(bf["r2"], rel=1e-12)


def test_wls_within_nan_rows_drop(spark):
    from hdfe_spark.operators.estimate import wls_within

    a = wls_within(_nan_df(spark), "y", ["x1"], fe="fe", weights="w")
    b = wls_within(_clean_df(spark), "y", ["x1"], fe="fe", weights="w")
    assert a.n == b.n == 4
    np.testing.assert_allclose(a.b, b.b, rtol=1e-12)
    assert np.isfinite(a.b).all()


# ---------------------------------------------------------- item 2


def test_dml_plm_single_x_matches_cramer_replica(spark):
    """The engine's k=1 nuisance coefficients must be bit-identical
    to the Cramer closed form (the oracle's spelling), not merely
    close: replicate the per-fold moments and the Cramer solve in
    numpy with the same operation order and demand exact equality of
    theta at full double precision (no rounding slack)."""
    from hdfe_spark.operators.causal import dml_plm

    rng = np.random.default_rng(7)
    n = 400
    ids = np.arange(n)
    x = rng.normal(size=n)
    d = 0.5 * x + rng.normal(size=n)
    y = 2.0 * d + 1.5 * x + rng.normal(size=n)
    df = spark.createDataFrame(
        [(int(i), float(yy), float(dd), float(xx))
         for i, yy, dd, xx in zip(ids, y, d, x)],
        "id long, y double, d double, x double",
    )
    out = dml_plm(df, "y", "d", "x", id_col="id", n_folds=2).collect()[0]

    # replica: fold f uses complement moments, Cramer order
    def cramer(nc, sxc, sxxc, s0, s1):
        det = nc * sxxc - sxc * sxc
        return (sxxc * s0 - sxc * s1) / det, (nc * s1 - sxc * s0) / det

    coef = {}
    for f in (0, 1):
        m = ids % 2 != f
        nc = float(m.sum())
        sxc, sxxc = float(x[m].sum()), float((x[m] * x[m]).sum())
        ay, by_ = cramer(nc, sxc, sxxc, float(y[m].sum()),
                         float((x[m] * y[m]).sum()))
        ad, bd_ = cramer(nc, sxc, sxxc, float(d[m].sum()),
                         float((x[m] * d[m]).sum()))
        coef[f] = (ay, by_, ad, bd_)
    fold = ids % 2
    ay = np.where(fold == 0, coef[0][0], coef[1][0])
    by_ = np.where(fold == 0, coef[0][1], coef[1][1])
    ad = np.where(fold == 0, coef[0][2], coef[1][2])
    bd_ = np.where(fold == 0, coef[0][3], coef[1][3])
    ry = y - (ay + by_ * x)
    rv = d - (ad + bd_ * x)
    theta = float((rv * ry).sum()) / float((rv * rv).sum())
    # partition-order-dependent double summation allows ulp drift in
    # the residual SUMS, but the nuisance COEFFICIENTS are exact —
    # theta agrees to ~1e-12 relative (vs ~1e-9 for a LAPACK solve
    # on an ill-conditioned design).
    assert out["theta"] == pytest.approx(theta, rel=1e-10)


# ---------------------------------------------------------- item 3


def test_fround_is_floor_spelling_not_bankers():
    import __spark_entry__ as em

    # banker's round() gives 0.12 at the exact tie; the floor
    # spelling (and SQL's half-away for positives) gives 0.13
    assert round(0.125, 2) == 0.12
    assert em._fround(0.125, 2) == 0.13
    # negative tie: floor spelling rounds toward +inf (matches the
    # SQL floor expression on both engines, by construction)
    assert em._fround(-0.125, 2) == -0.12
    assert em._fround(float("nan"), 4) != em._fround(1.0, 4)
    assert em._fround(2.00005, 4) == math.floor(2.00005 * 1e4 + 0.5) / 1e4


def test_r13_queries_use_fround_and_floor_oracles():
    import inspect

    import __spark_entry__ as em

    for fn in (em._q_hausman_iv, em._q_ols_wls_fe, em._q_dml_plm):
        src = inspect.getsource(fn)
        assert "_fround(" in src
        assert "round(float(" not in src.replace("_fround(float(", "")
    for sql in (em._HAUSMAN_IV_SQL, em._OLS_WLS_FE_SQL, em._DML_PLM_SQL):
        low = sql.lower()
        assert "floor(" in low
        # no bare SQL round() on float outputs remains (round( only
        # appears inside floor spelling or not at all)
        assert " round(" not in low


# ---------------------------------------------------------- item 4


def test_ri_multiplier_skips_zero_mod_m():
    from hdfe_spark.operators.causal import _ri_multiplier

    M = 1_000_003
    # normal k: the plain family value
    for k in (0, 1, 198, 499999):
        assert _ri_multiplier(k, M) == 48271 * (2 * k + 3)
        assert _ri_multiplier(k, M) % M != 0
    # the degenerate k: 2k+3 = M exactly -> bumped, nonzero mod M
    k = (M - 3) // 2
    assert (2 * k + 3) % M == 0
    pk = _ri_multiplier(k, M)
    assert pk == 48271 * (2 * k + 3) + 48271
    assert pk % M == 48271 % M != 0
