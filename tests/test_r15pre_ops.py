"""Round-15 pre-build tests: cuped2_by (two-covariate CUPED) and
bayes_ab (Beta-Binomial posterior A/B readout)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.stats import cuped2_by


def test_cuped2_by_matches_lstsq_replica(spark):
    rng = np.random.RandomState(17)
    rows, blocks = [], {}
    for g in ("g1", "g2"):
        n = 400
        x1 = rng.normal(10, 2, n)
        x2 = rng.normal(-3, 1.5, n)
        arm = np.where(rng.rand(n) < 0.5, "A", "B")
        y = (2.0 * x1 - 1.5 * x2 + rng.normal(0, 1, n)
             + np.where(arm == "B", 0.7, 0.0))
        blocks[g] = (x1, x2, arm, y)
        rows += [(g, str(a), float(yy), float(a1), float(a2))
                 for a, yy, a1, a2 in zip(arm, y, x1, x2)]
    df = spark.createDataFrame(rows, "g string, arm string, y double, x1 double, x2 double")
    out = {r["g"]: r for r in
           cuped2_by(df, "g", "arm", "y", "x1", "x2", "A", "B",
                     scale=1e7).collect()}
    for g, (x1, x2, arm, y) in blocks.items():
        # replica on the scaled integers (matching the engine's
        # exact-moment semantics)
        u1, u2, uy = (np.round(x1*1e7), np.round(x2*1e7), np.round(y*1e7))
        X = np.stack([u1, u2], 1)
        Xc = X - X.mean(0)
        yc = uy - uy.mean()
        theta = np.linalg.solve(Xc.T @ Xc, Xc.T @ yc)
        r = out[g]
        assert r["theta1"] == pytest.approx(theta[0], rel=1e-9)
        assert r["theta2"] == pytest.approx(theta[1], rel=1e-9)
        db = (uy[arm == "B"].mean() - uy[arm == "A"].mean())
        d1 = (u1[arm == "B"].mean() - u1[arm == "A"].mean())
        d2 = (u2[arm == "B"].mean() - u2[arm == "A"].mean())
        adj = (db - theta[0]*d1 - theta[1]*d2) / 1e7
        assert r["effect_adj"] == pytest.approx(adj, rel=1e-9, abs=1e-9)
        assert r["effect_raw"] == pytest.approx(db / 1e7, rel=1e-9)
        ssr = theta @ (Xc.T @ yc)
        rho2 = ssr / (yc @ yc)
        assert r["rho2"] == pytest.approx(rho2, rel=1e-9)
        assert 0 < r["rho2"] < 1


def test_cuped2_by_balanced_shift_recovered_exactly(spark):
    # identical covariate values in BOTH arms (arm orthogonal to X
    # by construction) + y linear in X + a pure +5 arm shift: the
    # pooled theta is exact, and the adjusted effect is exactly 5
    rows = []
    rng = np.random.RandomState(2)
    for i in range(150):
        x1, x2 = float(rng.randint(0, 50)), float(rng.randint(0, 30))
        base = 3.0 * x1 - 2.0 * x2
        rows.append(("g", "A", base, x1, x2))
        rows.append(("g", "B", base + 5.0, x1, x2))
    df = spark.createDataFrame(rows, "g string, arm string, y double, x1 double, x2 double")
    r = cuped2_by(df, "g", "arm", "y", "x1", "x2", "A", "B").collect()[0]
    assert r["theta1"] == pytest.approx(3.0, abs=1e-6)
    assert r["theta2"] == pytest.approx(-2.0, abs=1e-6)
    assert r["effect_adj"] == pytest.approx(5.0, abs=1e-6)
    assert 0.9 < r["rho2"] < 1.0


def test_cuped2_by_degenerate_nulls(spark):
    rows = [
        # x2 constant -> singular Gram -> NULL adjusted block
        ("s", "A", 1.0, 1.0, 7.0), ("s", "A", 2.0, 2.0, 7.0),
        ("s", "B", 3.0, 3.0, 7.0), ("s", "B", 4.0, 4.0, 7.0),
        # NaN x1 row drops from the shared mask entirely
        ("s", "B", 9.0, float("nan"), 7.0),
    ]
    df = spark.createDataFrame(rows, "g string, arm string, y double, x1 double, x2 double")
    r = cuped2_by(df, "g", "arm", "y", "x1", "x2", "A", "B").collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["theta1"] is None and r["effect_adj"] is None
    assert r["effect_raw"] == pytest.approx(2.0)
    with pytest.raises(ValueError, match="distinct"):
        cuped2_by(df, "g", "arm", "y", "x1", "x1", "A", "B")


# --------------------------------------------------- bayes_ab

from hdfe_spark.operators.stats import bayes_ab


def _p_superiority_quad(aA, bA, aB, bB, n_grid=200_001):
    """numpy numerical-integration replica: P(pB > pA) =
    int f_B(x) * F_A(x) dx via trapezoid on a fine grid."""
    x = np.linspace(0.0, 1.0, n_grid)[1:-1]
    lg = math.lgamma

    def logpdf(a, b):
        return ((a - 1) * np.log(x) + (b - 1) * np.log1p(-x)
                - (lg(a) + lg(b) - lg(a + b)))

    fB = np.exp(logpdf(aB, bB))
    fA = np.exp(logpdf(aA, bA))
    dx = x[1] - x[0]
    # cumulative TRAPEZOID (a left-Riemann cumsum is ~dx*f/2 biased,
    # which is 1e-5 at this grid -- bigger than the exact sum's err)
    FA = dx * (np.cumsum(fA) - 0.5 * (fA + fA[0]))
    return float(np.trapz(fB * FA, dx=dx))


def test_bayes_ab_symmetric_is_half(spark):
    rows = [("A", 1), ("A", 0), ("B", 1), ("B", 0)] * 25
    df = spark.createDataFrame(rows, "arm string, s int")
    r = bayes_ab(df, "arm", "s", "A", "B").collect()[0]
    assert r["p_b_beats_a"] == pytest.approx(0.5, abs=1e-12)
    assert r["method"] == "exact"
    assert r["n_a"] == 50 and r["s_a"] == 25


def test_bayes_ab_matches_quadrature(spark):
    rng = np.random.RandomState(9)
    rows = [("A", int(rng.rand() < 0.30)) for _ in range(400)]
    rows += [("B", int(rng.rand() < 0.36)) for _ in range(350)]
    rows += [("C", 1)] * 10  # other arm ignored
    rows += [("B", None)]    # NULL dropped
    df = spark.createDataFrame(rows, "arm string, s int")
    r = bayes_ab(df, "arm", "s", "A", "B").collect()[0]
    aA, bA = 1 + r["s_a"], 1 + r["n_a"] - r["s_a"]
    aB, bB = 1 + r["s_b"], 1 + r["n_b"] - r["s_b"]
    want = _p_superiority_quad(aA, bA, aB, bB)
    assert r["p_b_beats_a"] == pytest.approx(want, abs=1e-7)
    assert r["mean_a"] == pytest.approx(aA / (aA + bA))
    assert 0.5 < r["p_b_beats_a"] < 1.0


def test_bayes_ab_normal_escape_and_guards(spark):
    rows = [("A", 1)] * 30 + [("A", 0)] * 70
    rows += [("B", 1)] * 42 + [("B", 0)] * 58
    df = spark.createDataFrame(rows, "arm string, s int")
    ex = bayes_ab(df, "arm", "s", "A", "B").collect()[0]
    ap = bayes_ab(df, "arm", "s", "A", "B", exact_max=10).collect()[0]
    assert ap["method"] == "normal" and ex["method"] == "exact"
    # the normal approximation should agree to ~1e-2 at n=100
    assert ap["p_b_beats_a"] == pytest.approx(ex["p_b_beats_a"], abs=0.02)
    with pytest.raises(ValueError, match="positive integers"):
        bayes_ab(df, "arm", "s", "A", "B", alpha_prior=0.5)
    bad = spark.createDataFrame([("A", 2)], "arm string, s int")
    with pytest.raises(Exception, match="outside"):
        bayes_ab(bad, "arm", "s", "A", "B")


# --------------------------------------------------- mediation_by

from hdfe_spark.operators.causal import mediation_by


def test_mediation_by_matches_numpy_replica(spark):
    rng = np.random.RandomState(31)
    rows, blocks = [], {}
    for g in ("g1", "g2"):
        n = 500
        t = (rng.rand(n) < 0.5).astype(float)
        m = 1.5 * t + rng.normal(0, 1, n)
        y = 2.0 * m + 0.5 * t + rng.normal(0, 1, n)
        blocks[g] = (t, m, y)
        rows += [(g, float(yy), float(tt), float(mm))
                 for yy, tt, mm in zip(y, t, m)]
    df = spark.createDataFrame(rows, "g string, y double, t double, m double")
    out = {r["g"]: r for r in
           mediation_by(df, "g", "y", "t", "m", scale=1e7).collect()}
    for g, (t, m, y) in blocks.items():
        ut, um, uy = np.round(t*1e7), np.round(m*1e7), np.round(y*1e7)
        tc, mc, yc = ut-ut.mean(), um-um.mean(), uy-uy.mean()
        a = (tc @ mc) / (tc @ tc)
        X = np.stack([tc, mc], 1)
        cd, b = np.linalg.solve(X.T @ X, X.T @ yc)
        c = (tc @ yc) / (tc @ tc)
        n = len(t)
        ssr_a = mc @ mc - (tc @ mc)**2/(tc @ tc)
        var_a = (ssr_a/(n-2))/(tc @ tc)
        resid_j = yc - X @ np.array([cd, b])
        s2j = (resid_j @ resid_j)/(n-3)
        var_b = s2j * np.linalg.inv(X.T @ X)[1, 1]
        se_ind = math.sqrt(b*b*var_a + a*a*var_b)
        r = out[g]
        assert r["a"] == pytest.approx(a, rel=1e-9)
        assert r["b"] == pytest.approx(b, rel=1e-9)
        assert r["c"] == pytest.approx(c, rel=1e-9)
        assert r["c_direct"] == pytest.approx(cd, rel=1e-9)
        # a*b == c - c' identity for nested linear fits
        assert r["indirect"] == pytest.approx(r["c"] - r["c_direct"],
                                              rel=1e-9)
        assert r["se_indirect"] == pytest.approx(se_ind, rel=1e-6)
        assert r["z_sobel"] == pytest.approx(a*b/se_ind, rel=1e-6)
        # construction truth: indirect ~ 1.5*2 = 3, direct ~ 0.5
        assert abs(r["indirect"] - 3.0) < 0.5
        assert abs(r["c_direct"] - 0.5) < 0.4


def test_mediation_by_degenerate_nulls(spark):
    rows = [
        ("s", 1.0, 1.0, 1.0), ("s", 2.0, 1.0, 2.0),
        ("s", 3.0, 1.0, 3.0), ("s", 4.0, 1.0, 4.0),  # var(t)=0
    ]
    df = spark.createDataFrame(rows, "g string, y double, t double, m double")
    r = mediation_by(df, "g", "y", "t", "m").collect()[0]
    assert r["a"] is None and r["indirect"] is None
    with pytest.raises(ValueError, match="distinct"):
        mediation_by(df, "g", "y", "t", "t")


# --------------------------------------------------- manski_bounds

from hdfe_spark.operators.causal import manski_bounds


def test_manski_bounds_replica_and_coverage(spark):
    rng = np.random.RandomState(41)
    rows = []
    for i in range(4000):
        t = i % 2 == 0
        y = float(rng.randint(0, 101))
        miss = rng.rand() < (0.15 if t else 0.25)
        rows.append((t, None if miss else y))
    df = spark.createDataFrame(rows, "t boolean, y double")
    r = manski_bounds(df, "y", "t", 0.0, 100.0).collect()[0]
    arr = np.array([(tt, np.nan if yy is None else yy) for tt, yy in rows])
    tt, yy = arr[:, 0].astype(bool), arr[:, 1]
    def bracket(mask):
        n = mask.sum(); o = mask & ~np.isnan(yy)
        s = yy[o].sum(); miss = n - o.sum()
        return (s + 0.0*miss)/n, (s + 100.0*miss)/n
    lo1, hi1 = bracket(tt); lo0, hi0 = bracket(~tt)
    assert r["lower"] == pytest.approx(lo1 - hi0, rel=1e-12)
    assert r["upper"] == pytest.approx(hi1 - lo0, rel=1e-12)
    assert r["lower"] < 0 < r["upper"]  # null effect inside the bounds
    assert r["width"] == pytest.approx(
        100.0 * ((r["miss_treat"]/r["n_treat"])
                 + (r["miss_ctrl"]/r["n_ctrl"])), rel=1e-12)
    # upper - lower == width identity
    assert (r["upper"] - r["lower"]) == pytest.approx(r["width"], rel=1e-9)


def test_manski_bounds_range_violation_raises(spark):
    df = spark.createDataFrame([(True, 150.0), (False, 5.0)],
                               "t boolean, y double")
    with pytest.raises(Exception, match="outside the stated range"):
        manski_bounds(df, "y", "t", 0.0, 100.0).collect()
    with pytest.raises(ValueError, match="y_min < y_max"):
        manski_bounds(df, "y", "t", 5.0, 5.0)


def test_manski_bounds_no_missing_collapses_to_naive(spark):
    rows = [(True, 10.0), (True, 20.0), (False, 5.0), (False, 15.0)]
    df = spark.createDataFrame(rows, "t boolean, y double")
    r = manski_bounds(df, "y", "t", 0.0, 100.0).collect()[0]
    assert r["lower"] == r["upper"] == r["naive"] == pytest.approx(5.0)
    assert r["width"] == 0.0 and r["miss_treat"] == 0


# ---- second-pass review pins (r14b continuation) ----


def test_meta_analysis_by_null_group_keeps_random_block(spark):
    from hdfe_spark.operators.stats import meta_analysis_by

    rows = [(None, 2.0, 1.0), (None, 3.0, 0.5), (None, 5.0, 2.0),
            ("g", 1.0, 1.0), ("g", 4.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, est double, se double")
    out = {r["g"]: r for r in meta_analysis_by(df, "g", "est", "se").collect()}
    r = out[None]
    assert r["k"] == 3 and r["tau2"] is not None
    assert r["theta_random"] is not None  # eqNullSafe join keeps it
    assert r["se_random"] is not None


def test_meta_analysis_by_homogeneous_i2_zero(spark):
    from hdfe_spark.operators.stats import meta_analysis_by

    rows = [("g", 3.0, float(s)) for s in (0.5, 1.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, est double, se double")
    r = meta_analysis_by(df, "g", "est", "se").collect()[0]
    assert r["i2"] == 0.0  # Q = 0 -> 0% heterogeneity, not NULL


def test_off_policy_eval_nan_propensity_dropped(spark):
    from hdfe_spark.operators.causal import off_policy_eval

    rows = [
        ("x", 0.5, "x", 2.0),
        ("x", float("nan"), "x", 999.0),  # NaN p: row drops entirely
        ("y", 0.5, "x", 1.0),
    ]
    df = spark.createDataFrame(rows, "a string, p double, pi string, r double")
    r = off_policy_eval(df, "r", "a", "p", "pi").collect()[0]
    assert r["n"] == 2  # the NaN row is gone, clip or no clip
    assert r["v_ips"] == pytest.approx(2.0 * 2 / 2)
    r2 = off_policy_eval(df, "r", "a", "p", "pi", clip=0.1).collect()[0]
    assert r2["n"] == 2  # no resurrection at the clip bound
    assert r2["v_ips"] == pytest.approx(2.0 * 2 / 2)


# --------------------------------------------------- regression_kink

from hdfe_spark.operators.causal import regression_kink


def test_regression_kink_noiseless_exact(spark):
    rows = []
    for i in range(-50, 51):
        x = i / 10.0
        yv = 1.0 + (2.0 * x if x < 0 else 5.0 * x)
        rows.append((x + 7.0, yv))  # kink at running = 7
    df = spark.createDataFrame(rows, "run double, y double")
    r = regression_kink(df, "y", "run", 7.0, 100.0).collect()[0]
    assert r["kink_effect"] == pytest.approx(3.0, abs=1e-9)
    assert r["slope_left"] == pytest.approx(2.0, abs=1e-9)
    assert r["slope_right"] == pytest.approx(5.0, abs=1e-9)
    assert r["intercept"] == pytest.approx(1.0, abs=1e-9)
    assert r["n_left"] == 50 and r["n_right"] == 51


def test_regression_kink_matches_lstsq(spark):
    rng = np.random.RandomState(8)
    x = rng.uniform(-2, 2, 800)
    yv = 3.0 + 1.5 * np.minimum(x, 0) + 4.0 * np.maximum(x, 0) \
        + rng.normal(0, 0.3, 800)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, yv)], "run double, y double")
    r = regression_kink(df, "y", "run", 0.0, 1.0).collect()[0]
    m = np.abs(x) < 1.0
    X = np.stack([np.ones(m.sum()), np.minimum(x[m], 0),
                  np.maximum(x[m], 0)], 1)
    beta = np.linalg.lstsq(X, yv[m], rcond=None)[0]
    assert r["intercept"] == pytest.approx(beta[0], rel=1e-9)
    assert r["slope_left"] == pytest.approx(beta[1], rel=1e-9)
    assert r["slope_right"] == pytest.approx(beta[2], rel=1e-9)
    assert r["kink_effect"] == pytest.approx(beta[2] - beta[1], rel=1e-9)


def test_regression_kink_degenerate_and_missing(spark):
    rows = [(0.5, 1.0), (0.5, 2.0), (-0.5, 3.0),  # one distinct left x
            (None, 9.0), (0.7, None), (0.2, float("nan"))]
    df = spark.createDataFrame(rows, "run double, y double")
    r = regression_kink(df, "y", "run", 0.0, 1.0).collect()[0]
    assert r["kink_effect"] is None
    assert r["n_left"] == 1 and r["n_right"] == 2


# --------------------------------------------------- wilson_ci_by

from hdfe_spark.operators.stats import wilson_ci_by


def test_wilson_ci_by_replica_and_edges(spark):
    rows = [("a", 1)] * 8 + [("a", 0)] * 2
    rows += [("z", 0)] * 5          # zero successes: lo == 0-ish, hi > 0
    rows += [("o", 1)] * 5          # all successes: hi < 1 + eps, lo < 1
    df = spark.createDataFrame(rows, "g string, s int")
    out = {r["g"]: r for r in wilson_ci_by(df, "g", "s").collect()}
    z = 1.9599639845400545
    for g, n, k in (("a", 10, 8), ("z", 5, 0), ("o", 5, 5)):
        p = k / n
        denom = 1 + z*z/n
        center = (p + z*z/(2*n)) / denom
        half = z * math.sqrt(p*(1-p)/n + z*z/(4*n*n)) / denom
        r = out[g]
        assert r["n"] == n and r["successes"] == k
        assert r["lo"] == pytest.approx(center - half, rel=1e-12)
        assert r["hi"] == pytest.approx(center + half, rel=1e-12)
    # Wilson never collapses to zero width at the extremes
    assert out["z"]["hi"] > 0.3 and out["z"]["lo"] == pytest.approx(0.0)
    assert out["o"]["lo"] < 0.7 and out["o"]["hi"] == pytest.approx(1.0)
    # coverage ordering sanity
    assert out["a"]["lo"] < 0.8 < out["a"]["hi"]


def test_wilson_ci_by_guards(spark):
    df = spark.createDataFrame([("a", 1)], "g string, s int")
    with pytest.raises(ValueError, match="critical value"):
        wilson_ci_by(df, "g", "s", alpha=0.2)
    bad = spark.createDataFrame([("a", 3)], "g string, s int")
    with pytest.raises(Exception, match="outside"):
        wilson_ci_by(bad, "g", "s").collect()


# --------------------------------------------------- newey_west_by

from hdfe_spark.operators.stats import newey_west_by


def test_newey_west_by_matches_replica(spark):
    rng = np.random.RandomState(23)
    rows, blocks = [], {}
    for g in ("g1", "g2"):
        n, L = 600, 3
        # BOTH x and e AR(1): u = x~*e is then positively
        # autocorrelated (with iid x it would not be, whatever the
        # error autocorrelation -- cov(u_t, u_{t-l}) carries the
        # product of the two autocovariances)
        x = np.zeros(n)
        e = np.zeros(n)
        for t in range(n):
            x[t] = 0.7 * (x[t-1] if t else 0.0) + rng.normal(0, 1)
            e[t] = 0.6 * (e[t-1] if t else 0.0) + rng.normal(0, 1)
        y = 1.0 + 2.5 * x + e
        blocks[g] = (x, y)
        rows += [(g, t, float(xx), float(yy))
                 for t, (xx, yy) in enumerate(zip(x, y))]
    df = spark.createDataFrame(rows, "g string, t int, x double, y double")
    L = 3
    out = {r["g"]: r for r in
           newey_west_by(df, "g", "y", "x", "t", L).collect()}
    for g, (x, y) in blocks.items():
        xc = x - x.mean()
        b = (xc @ (y - y.mean())) / (xc @ xc)
        e = (y - y.mean()) - b * xc
        u = xc * e
        g0 = float(u @ u)
        v = g0
        for l in range(1, L + 1):
            v += 2 * (1 - l / (L + 1)) * float(u[l:] @ u[:-l])
        sxx = float(xc @ xc)
        r = out[g]
        assert r["b"] == pytest.approx(b, rel=1e-9)
        assert r["se_hac"] == pytest.approx(math.sqrt(v) / sxx, rel=1e-9)
        assert r["se_hc0"] == pytest.approx(math.sqrt(g0) / sxx, rel=1e-9)
        # positive autocorrelation inflates the HAC SE
        assert r["se_hac"] > r["se_hc0"]


def test_newey_west_by_guards(spark):
    # duplicate time values raise in-plan
    rows = [("g", 1, 1.0, 1.0), ("g", 1, 2.0, 2.0), ("g", 2, 3.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, t int, x double, y double")
    with pytest.raises(Exception, match="duplicate order"):
        newey_west_by(df, "g", "y", "x", "t", 1).collect()
    with pytest.raises(ValueError, match="max_lag"):
        newey_west_by(df, "g", "y", "x", "t", -1)
    # constant x -> NULL inference, n <= L -> NULL inference
    rows2 = [("c", 1, 5.0, 1.0), ("c", 2, 5.0, 2.0),
             ("s", 1, 1.0, 1.0), ("s", 2, 2.0, 5.0)]
    df2 = spark.createDataFrame(rows2, "g string, t int, x double, y double")
    out = {r["g"]: r for r in
           newey_west_by(df2, "g", "y", "x", "t", 2).collect()}
    assert out["c"]["b"] is None and out["s"]["se_hac"] is None
