"""Pins for the round-14 mid-round code-review findings (all fixed):

1. wild_cluster_bootstrap: DECIMAL(38,0) casts + explicit overflow
   guards (a value or centered product too large must RAISE, never
   silently null out of the sums while n still counts it).
2. msprt_by / qte_by_approx_certificate: NaN values are excluded
   from the estimating sample (NaN passes isNotNull, would count in
   n but vanish from decimal sums / rank comparisons).
3. wild_cluster_bootstrap: Rademacher signs hash TWO residues of the
   cluster id (mod 1000003 and mod 999983) — clusters congruent mod
   one prime no longer share their entire sign sequence.
4. _plan_alternating: listwise-complete (x, y) rows (NULL and NaN)
   before the cell pass, so the driver tier's sum/weight means and
   the distributed tier's means describe the same sample.
5. _fround: finite x whose scaled value overflows to inf returns inf
   (the SQL floor spelling's answer) instead of raising.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_wcb_overflow_raises_not_silently_drops(spark):
    from hdfe_spark.operators.causal import wild_cluster_bootstrap

    df = spark.createDataFrame(
        [(1, 1.0, 1e36), (1, 2.0, 2.0), (2, 3.0, 4.0), (2, 1.0, 2.0)],
        "g long, x double, y double",
    )
    with pytest.raises(ValueError, match="overflow"):
        wild_cluster_bootstrap(df, "y", "x", "g", n_boot=5)


def test_wcb_signs_differ_for_clusters_congruent_mod_m(spark):
    """Two clusters with ids congruent mod 1000003 but different mod
    999983 must NOT be perfectly sign-correlated: construct two such
    clusters carrying equal-magnitude scores; under the old
    single-residue scheme every draw had T_b = ±2S (never 0) — with
    two residues some draw separates them (T_b = 0 for some b),
    which shows up as p < 1 being possible... simplest observable:
    the engine result matches the two-residue replica, which the
    single-residue replica contradicts."""
    from hdfe_spark.operators.causal import (
        _ri_multiplier,
        wild_cluster_bootstrap,
    )

    M, M2 = 1_000_003, 999_983
    g1, g2 = 7, 7 + M  # congruent mod M, different mod M2
    rows = []
    for i in range(30):
        x = float(i % 5)
        # both scores positive but UNEQUAL: under the old
        # single-residue scheme the two clusters always share their
        # sign, so every T_b = ±(S1+S2) = ±T_obs and p == 1 exactly;
        # a draw that splits them gives |S1−S2| < |T_obs| — a non-hit
        rows.append((g1, x, 2.0 * x + 1.0))
        rows.append((g2, x, 1.0 * x + 1.0))
    df = spark.createDataFrame(rows, "g long, x double, y double")
    out = wild_cluster_bootstrap(df, "y", "x", "g", n_boot=19).collect()[0]

    # two-residue replica
    ux = [int(round(x * 1e6)) for _, x, _ in rows]
    uy = [int(round(y * 1e6)) for _, _, y in rows]
    n = len(rows)
    cx0, cy0 = sum(ux) // n, sum(uy) // n
    S: dict = {}
    for (g, _, _), a, b in zip(rows, ux, uy):
        S[g] = S.get(g, 0) + (a - cx0) * (b - cy0)
    tobs = sum(S.values())
    hits2 = hits1 = 1
    for b in range(19):
        pb, qb = _ri_multiplier(b, M), 7919 * (b + 1)
        t2 = sum(
            (S[g] if ((g % M) * pb + (g % M2) * qb) % M < M // 2
             else -S[g]) for g in S
        )
        t1 = sum(
            (S[g] if ((g % M) * pb + qb) % M < M // 2 else -S[g])
            for g in S
        )
        hits2 += abs(t2) >= abs(tobs)
        hits1 += abs(t1) >= abs(tobs)
    assert out["p_value"] == hits2 / 20.0
    # the single-residue scheme perfectly sign-correlates the two
    # clusters (every draw a hit, p == 1); two residues split them
    assert hits1 == 20
    assert hits2 < hits1
    assert out["p_value"] < 1.0


def test_msprt_by_nan_excluded(spark):
    from hdfe_spark.operators.stats import msprt_by

    rows = [(0, "a", float(v)) for v in (1, 2, 3, 4)] + [
        (0, "b", float(v)) for v in (2, 3, 4, 5)
    ]
    clean = spark.createDataFrame(rows, "seg long, arm string, v double")
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(0, "a", float("nan")), (0, "b", float("nan"))],
            "seg long, arm string, v double",
        )
    )
    a = msprt_by(clean, "seg", "arm", "v", "a", "b").collect()[0]
    b = msprt_by(dirty, "seg", "arm", "v", "a", "b").collect()[0]
    assert b["n_a"] == a["n_a"] == 4  # NaN row not counted
    assert b["delta"] == a["delta"] and b["lam"] == a["lam"]


def test_qte_cert_nan_excluded(spark):
    from hdfe_spark.operators.stats import qte_by_approx_certificate

    rows = [(1, "a", float(v)) for v in range(20)] + [
        (1, "b", float(v) + 0.5) for v in range(20)
    ] + [(1, "a", float("nan"))]
    df = spark.createDataFrame(rows, "g int, arm string, v double")
    out = qte_by_approx_certificate(
        df, "g", "arm", "v", "a", "b", accuracy=100
    ).collect()[0]
    assert out["n_a"] == 20  # NaN excluded from the arm count
    assert out["within_bound"] is True


def test_plan_alternating_null_xy_rows_drop(spark):
    """Plan C on a null-containing input equals Plan C on the
    pre-filtered complete rows — one estimating sample for cells,
    sweeps, Gram, and n (review r14)."""
    from hdfe_spark.operators.estimate import estimate

    rng = np.random.default_rng(2)
    rows = []
    for i in range(300):
        x = float(rng.normal())
        yv = 2.0 * x + (i % 7) * 0.5 + (i % 11) * 0.25 + float(
            rng.normal() * 0.1
        )
        rows.append((i % 7, i % 11, x, yv))
    dirty = rows + [(0, 0, None, 5.0), (1, 1, 1.0, None)]
    d1 = spark.createDataFrame(
        dirty, "f1 int, f2 int, x double, y double"
    )
    d2 = spark.createDataFrame(
        rows, "f1 int, f2 int, x double, y double"
    )
    kw = dict(categorical_controls=["f1", "f2"], within_if_fe=False)
    b1 = estimate(d1, "y", ["x"], **kw).slopes
    b2 = estimate(d2, "y", ["x"], **kw).slopes
    np.testing.assert_allclose(b1, b2, rtol=1e-10)


def test_fround_overflow_returns_inf_like_sql():
    import __spark_entry__ as em

    assert em._fround(1e301, 9) == math.inf
    assert em._fround(-1e301, 9) == -math.inf
    # just under the overflow boundary still rounds normally
    assert em._fround(1e299, 9) == 1e299
    assert em._fround(1.23456, 2) == 1.23


# ---------------- second (pre-freeze) review pass findings


def test_att_gt_uncastable_cohorts_raise(spark):
    from hdfe_spark.operators.causal import att_gt

    # a VALID cohort ("2") must exist so identified output rows
    # carry the guard; the "2020Q1" rows would otherwise silently
    # merge into the never-treated pool (an all-uncastable input
    # yields an empty frame instead — the documented residual)
    rows = [
        (1, "2", 5.0), (2, "2", 6.0), (3, "2", 7.0),
        (1, None, 1.0), (2, None, 2.0), (3, None, 3.0),
        (2, "2020Q1", 9.0), (3, "2020Q1", 9.5),
    ]
    df = spark.createDataFrame(rows, "t long, g string, y double")
    with pytest.raises(Exception, match="do not cast to an integer"):
        att_gt(df, "y", "t", "g").collect()
    # and the clean twin works
    clean = spark.createDataFrame(
        [r for r in rows if r[1] != "2020Q1"], "t long, g string, y double"
    )
    assert len(att_gt(clean, "y", "t", "g").collect()) == 2


def test_plan_alternating_fast_gram_cancellation_fallback(spark):
    """A dominant un-centered level (y ~ 1e9 + signal) makes the
    one-pass within formula cancel catastrophically; the guard must
    fall back to the demeaned-row Gram and still return accurate
    slopes (review r14b)."""
    from hdfe_spark.operators.estimate import estimate

    rng = np.random.default_rng(1)
    rows = [
        (i % 7, i % 11, float(x), 1e9 + 2.0 * float(x) + float(e))
        for i, (x, e) in enumerate(
            zip(rng.normal(size=3000), rng.normal(size=3000) * 0.01)
        )
    ]
    df = spark.createDataFrame(rows, "f1 int, f2 int, x double, y double")
    res = estimate(
        df, "y", ["x"], categorical_controls=["f1", "f2"],
        within_if_fe=False,
    )
    assert res.slopes[0, 0] == pytest.approx(2.0, abs=1e-3)


def test_plan_alternating_duplicate_x_uses_named_path(spark):
    """dm name-dedup means duplicate/overlapping x-y columns cannot
    use the positional fast Gram — they must route through the
    by-name gram_matrix path and still produce a sane answer
    (review r14b: the positional slice silently returned zeros)."""
    from hdfe_spark.operators.estimate import estimate

    rows = [
        (i % 5, i % 3, float(i % 7), 3.0 * (i % 7) + (i % 5) * 0.5)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "f1 int, f2 int, x double, y double")
    res = estimate(
        df, "y", ["x", "x"], categorical_controls=["f1", "f2"],
        within_if_fe=False,
    )
    # the min-norm solve splits the coefficient across the two
    # identical columns (the by-name gram_matrix convention) — the
    # recovered TOTAL effect must be the true 3.0, never the silent
    # zeros the positional fast-Gram slice produced
    b = np.asarray(res.slopes).ravel()
    assert float(b.sum()) == pytest.approx(3.0, abs=1e-6)
    assert all(abs(v) > 0.1 for v in b)


def test_exact_moment_family_nan_excluded(spark):
    """Family-wide NaN-as-missing (welch_by — and through it
    mde/power/tost/streaming_welch — cuped_by, smd_by, qte_by): a
    NaN value must not count in an arm's n while vanishing from its
    decimal sums."""
    from hdfe_spark.operators.stats import (
        cuped_by,
        qte_by,
        smd_by,
        welch_by,
    )

    rows = [(0, "a", float(v), float(v) * 0.5) for v in (1, 2, 3, 4)]
    rows += [(0, "b", float(v), float(v) * 0.5) for v in (2, 3, 4, 6)]
    clean = spark.createDataFrame(
        rows, "seg long, arm string, v double, x double"
    )
    dirty = clean.unionByName(spark.createDataFrame(
        [(0, "a", float("nan"), 1.0), (0, "b", 2.0, float("nan"))],
        "seg long, arm string, v double, x double",
    ))
    w_c = welch_by(clean, "seg", "arm", "v", "a", "b").collect()[0]
    w_d = welch_by(dirty, "seg", "arm", "v", "a", "b").collect()[0]
    # the NaN-v arm-a row drops entirely (was: counted in n_a but
    # absent from the sums — a silently deflated mean)
    assert (w_d["n_a"], w_d["mean_a"]) == (w_c["n_a"], w_c["mean_a"])
    # welch's n_b INCLUDES the NaN-x row (x is not welch's input —
    # its v=2.0 is a legitimate b observation)
    assert w_d["n_b"] == 5
    c_c = cuped_by(clean, "seg", "arm", "v", "x", "a", "b").collect()[0]
    c_d = cuped_by(dirty, "seg", "arm", "v", "x", "a", "b").collect()[0]
    assert (c_d["n_a"], c_d["theta"]) == (c_c["n_a"], c_c["theta"])
    q_d = qte_by(dirty, "seg", "arm", "v", "a", "b").collect()
    # NaN v excluded from arm a; the NaN-x b row (v = 2.0 valid)
    # legitimately counts for qte, whose only input is v
    assert q_d[0]["n_a"] == 4 and q_d[0]["n_b"] == 5
    s_d = smd_by(dirty, "arm", ["v", "x"], "a", "b").collect()
    by_cov = {r["covariate"]: r for r in s_d}
    assert by_cov["v"]["n_a"] == 4  # NaN v excluded from v's arm a
    assert by_cov["x"]["n_b"] == 4  # NaN x excluded from x's arm b


# ---- second-session review findings (conformal_by /
# ---- synthetic_control / oracles) ----


def test_conformal_by_collision_guard(spark):
    from hdfe_spark.operators.stats import conformal_by

    df = spark.createDataFrame([("a", 1.0, True)],
                               "n_cal string, score double, cal boolean")
    with pytest.raises(ValueError, match="n_cal"):
        conformal_by(df, "n_cal", "score", "cal", 0.1)
    # a leftover __rn column must NOT be spuriously rejected
    df2 = spark.createDataFrame([("a", 1.0, True, 5)],
                                "seg string, score double, cal boolean, __rn int")
    assert conformal_by(df2, "seg", "score", "cal", 0.1).count() == 1


def test_synthetic_control_collision_and_weights_dtype(spark):
    from hdfe_spark.operators.causal import synthetic_control

    rows = []
    for t in range(8):
        d1, d2 = float(3 + t % 5), float(10 + t % 7)
        rows += [(1, t, d1), (2, t, d2), (9, t, 2.0 * d1 + 0.5 * d2)]
    # integer unit ids: return_weights must preserve the dtype
    df = spark.createDataFrame(rows, "unit int, period int, y double")
    wdf = synthetic_control(df, "unit", "period", "y", 9, 6,
                            return_weights=True)
    assert dict(wdf.dtypes)["unit"] == "int"
    w = {r["unit"]: r["weight"] for r in wdf.collect()}
    assert w[1] == pytest.approx(2.0, abs=1e-9)
    # period named like a fixed output raises the named error
    df2 = df.withColumnRenamed("period", "gap")
    with pytest.raises(ValueError, match="gap"):
        synthetic_control(df2, "unit", "gap", "y", 9, 6)


def test_synthetic_control_scale_overflow_raises(spark):
    from hdfe_spark.operators.causal import synthetic_control

    rows = []
    for t in range(4):
        rows += [("d1", t, 1e14), ("d2", t, 2e14), ("tr", t, 3e14)]
    df = spark.createDataFrame(rows, "unit string, period int, y double")
    with pytest.raises(Exception, match="lower `scale`"):
        synthetic_control(df, "unit", "period", "y", "tr", 3).count()
