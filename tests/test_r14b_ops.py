"""Round-14 second-batch operator tests: conformal_by (split
conformal prediction per segment) and synthetic_control."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.stats import conformal_by


def _k(n_cal, alpha):
    return n_cal + 1 - math.floor((n_cal + 1) * alpha)


def test_conformal_by_exact_small(spark):
    rows = [("a", float(i), True) for i in range(1, 10)]  # cal 1..9
    rows += [("a", 5.0, False), ("a", 9.5, False)]
    df = spark.createDataFrame(rows, "seg string, score double, cal boolean")
    out = {r["seg"]: r for r in conformal_by(df, "seg", "score", "cal", 0.1).collect()}
    r = out["a"]
    # k = 10 - floor(10*0.1) = 10 - 1 = 9 (10*0.1 is exactly 1.0 in
    # IEEE double; both engines fold the same product either way)
    assert r["n_cal"] == 9
    assert r["q_hat"] == float(_k(9, 0.1))
    assert r["n_test"] == 2 and r["covered"] == 1
    assert r["coverage"] == pytest.approx(0.5)


def test_conformal_by_small_calibration_infinite(spark):
    rows = [("b", 1.0, True), ("b", 2.0, True), ("b", 3.0, True)]
    rows += [("b", 100.0, False)]
    df = spark.createDataFrame(rows, "seg string, score double, cal boolean")
    r = conformal_by(df, "seg", "score", "cal", 0.1).collect()[0]
    # k = 4 - floor(0.4) = 4 > n_cal=3 -> infinite interval
    assert r["q_hat"] is None
    assert r["covered"] == 1 and r["coverage"] == 1.0


def test_conformal_by_nan_null_missing(spark):
    rows = [
        ("c", 1.0, True), ("c", 2.0, True), ("c", 3.0, True),
        ("c", 4.0, True), ("c", 5.0, True), ("c", 6.0, True),
        ("c", 7.0, True), ("c", 8.0, True), ("c", 9.0, True),
        ("c", float("nan"), True),   # NaN cal: excluded
        ("c", None, True),           # NULL cal score: excluded
        ("c", float("nan"), False),  # NaN test: excluded from denom
        ("c", 2.0, False),
        ("c", 2.0, None),            # NULL flag: excluded entirely
    ]
    df = spark.createDataFrame(rows, "seg string, score double, cal boolean")
    r = conformal_by(df, "seg", "score", "cal", 0.1).collect()[0]
    assert r["n_cal"] == 9 and r["n_test"] == 1
    assert r["q_hat"] == 9.0 and r["covered"] == 1


def test_conformal_by_test_only_segment(spark):
    rows = [("d", 1.0, False), ("d", 2.0, False)]
    rows += [("e", float(i), True) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "seg string, score double, cal boolean")
    out = {r["seg"]: r for r in conformal_by(df, "seg", "score", "cal", 0.1).collect()}
    assert out["d"]["n_cal"] == 0 and out["d"]["q_hat"] is None
    assert out["d"]["coverage"] == 1.0
    assert out["e"]["n_test"] == 0 and out["e"]["coverage"] is None


def test_conformal_by_numpy_replica(spark):
    rng = np.random.RandomState(7)
    rows = []
    for seg, n in (("s1", 137), ("s2", 64), ("s3", 501)):
        sc = rng.exponential(2.0, size=n + 40)
        for i, v in enumerate(sc):
            rows.append((seg, float(v), i < n))
    df = spark.createDataFrame(rows, "seg string, score double, cal boolean")
    alpha = 0.2
    out = {r["seg"]: r for r in conformal_by(df, "seg", "score", "cal", alpha).collect()}
    i = 0
    for seg, n in (("s1", 137), ("s2", 64), ("s3", 501)):
        block = [rows[j] for j in range(i, i + n + 40)]
        i += n + 40
        cal = sorted(v for _, v, c in block if c)
        k = _k(len(cal), alpha)
        q = cal[k - 1]
        test = [v for _, v, c in block if not c]
        cov = sum(1 for v in test if v <= q) / len(test)
        r = out[seg]
        assert r["q_hat"] == pytest.approx(q, abs=0.0)
        assert r["n_cal"] == len(cal) and r["n_test"] == len(test)
        assert r["coverage"] == pytest.approx(cov)
        # marginal validity on exchangeable draws: coverage near 1-alpha
        assert r["coverage"] >= 1 - alpha - 0.16


def test_conformal_by_alpha_guard(spark):
    df = spark.createDataFrame([("a", 1.0, True)], "seg string, score double, cal boolean")
    with pytest.raises(ValueError, match="alpha"):
        conformal_by(df, "seg", "score", "cal", 1.5)


# ------------------------------------------------ synthetic_control

from hdfe_spark.operators.causal import synthetic_control


def _sc_fixture():
    # treated path = 2*d1 + 0.5*d2 pre; post adds a +10 effect
    rows = []
    for t in range(10):
        d1 = float(3 + (t * 7) % 5)
        d2 = float(10 + (t * 3) % 7)
        tr = 2.0 * d1 + 0.5 * d2 + (10.0 if t >= 6 else 0.0)
        rows += [("d1", t, d1), ("d2", t, d2), ("tr", t, tr)]
    return rows


def test_synthetic_control_recovers_weights_and_gap(spark):
    df = spark.createDataFrame(_sc_fixture(), "unit string, period int, y double")
    wdf = synthetic_control(df, "unit", "period", "y", "tr", 6,
                            return_weights=True)
    w = {r["unit"]: r["weight"] for r in wdf.collect()}
    assert w["d1"] == pytest.approx(2.0, abs=1e-9)
    assert w["d2"] == pytest.approx(0.5, abs=1e-9)
    out = {r["period"]: r for r in
           synthetic_control(df, "unit", "period", "y", "tr", 6).collect()}
    assert len(out) == 10
    for t in range(10):
        r = out[t]
        assert r["n_donors"] == 2 and r["is_post"] == (t >= 6)
        want = 10.0 if t >= 6 else 0.0
        assert r["gap"] == pytest.approx(want, abs=1e-8)


def test_synthetic_control_numpy_replica_many_donors(spark):
    rng = np.random.RandomState(3)
    J, T, T0 = 7, 30, 20
    Y = rng.normal(50, 10, size=(J, T))
    wt = rng.uniform(-1, 2, size=J)
    ytr = wt @ Y + np.where(np.arange(T) >= T0, 5.0, 0.0)
    rows = [(f"d{j}", t, float(Y[j, t])) for j in range(J) for t in range(T)]
    rows += [("tr", t, float(ytr[t])) for t in range(T)]
    df = spark.createDataFrame(rows, "unit string, period int, y double")
    out = {r["period"]: r for r in
           synthetic_control(df, "unit", "period", "y", "tr", T0,
                             scale=1e9).collect()}
    # numpy replica on the scaled-integer moments
    Ui = np.round(Y * 1e9)
    ui_tr = np.round(ytr * 1e9)
    G = Ui[:, :T0] @ Ui[:, :T0].T
    bb = Ui[:, :T0] @ ui_tr[:T0]
    wn = np.linalg.solve(G, bb)
    for t in range(T):
        assert out[t]["synthetic"] == pytest.approx(
            float(wn @ Y[:, t]), rel=1e-6)
        assert out[t]["gap"] == pytest.approx(
            (5.0 if t >= T0 else 0.0), abs=1e-4)


def test_synthetic_control_contract_raises(spark):
    rows = _sc_fixture()
    dup = rows + [("d1", 2, 99.0)]
    df = spark.createDataFrame(dup, "unit string, period int, y double")
    with pytest.raises(ValueError, match="unbalanced or duplicated"):
        synthetic_control(df, "unit", "period", "y", "tr", 6)
    # donor missing a pre period -> unbalanced
    unb = [r for r in rows if not (r[0] == "d2" and r[1] == 3)]
    df2 = spark.createDataFrame(unb, "unit string, period int, y double")
    with pytest.raises(ValueError, match="unbalanced"):
        synthetic_control(df2, "unit", "period", "y", "tr", 6)
    # no pre rows for treated
    df3 = spark.createDataFrame(
        [r for r in rows if not (r[0] == "tr" and r[1] < 6)],
        "unit string, period int, y double")
    with pytest.raises(ValueError, match="no pre-period rows"):
        synthetic_control(df3, "unit", "period", "y", "tr", 6)
    # max_donors cap
    with pytest.raises(ValueError, match="max_donors"):
        synthetic_control(
            spark.createDataFrame(rows, "unit string, period int, y double"),
            "unit", "period", "y", "tr", 6, max_donors=1)


def test_synthetic_control_post_gaps_null(spark):
    rows = _sc_fixture()
    # drop donor d2's period-8 row: post period loses a donor
    rows = [r for r in rows if not (r[0] == "d2" and r[1] == 8)]
    # duplicate the treated row in period 9
    rows.append(("tr", 9, 123.0))
    df = spark.createDataFrame(rows, "unit string, period int, y double")
    out = {r["period"]: r for r in
           synthetic_control(df, "unit", "period", "y", "tr", 6).collect()}
    assert out[8]["synthetic"] is None and out[8]["n_donors"] == 1
    assert out[8]["gap"] is None
    assert out[9]["actual"] is None and out[9]["gap"] is None


def test_synthetic_control_nan_y_dropped(spark):
    rows = _sc_fixture() + [("d1", 11, float("nan"))]
    df = spark.createDataFrame(rows, "unit string, period int, y double")
    out = {r["period"]: r for r in
           synthetic_control(df, "unit", "period", "y", "tr", 6).collect()}
    assert 11 not in out  # the NaN row vanished entirely


# ----------------------------------------------- streaming_srm


def test_streaming_srm_equals_batch(spark, sf_dir):
    """availableNow fold == batch table exactly (additive counters),
    the 27th streaming form's defining equality."""
    from hdfe_spark.operators.stats import chi2_gof_by
    from hdfe_spark.streaming.ops import (
        read_table_stream,
        streaming_srm,
    )

    def shape(df):
        return df.filter(F.col("event_id").isNotNull()).select(
            (F.col("user_id") % 7).cast("long").alias("seg"),
            F.when(F.col("event_id") % 2 == 0, "even")
            .otherwise("odd").alias("arm"),
        )

    probs = {"even": 0.5, "odd": 0.5}
    batch = chi2_gof_by(
        shape(spark.read.parquet(f"{sf_dir}/events.parquet")),
        "seg", "arm", probs,
    ).collect()
    stream = streaming_srm(
        shape(read_table_stream(spark, sf_dir, "events")),
        "seg", "arm", probs,
    )
    import uuid

    sink = "t" + uuid.uuid4().hex[:12]
    q = (
        stream.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table(sink).collect()
    assert sorted(map(tuple, got), key=lambda t: t[0]) == sorted(
        map(tuple, batch), key=lambda t: t[0]
    )


# ------------------------------------------- group_sequential_by

from hdfe_spark.operators.stats import group_sequential_by


def test_group_sequential_by_numpy_replica(spark):
    rng = np.random.RandomState(11)
    rows = []
    for seg in ("x", "y"):
        for look in (1, 2, 3, 4):
            for arm in ("A", "B"):
                shift = 1.5 if (seg == "y" and arm == "B") else 0.0
                for v in rng.normal(shift, 1.0, size=60):
                    rows.append((seg, look, arm, float(v)))
    df = spark.createDataFrame(rows, "seg string, look int, arm string, v double")
    out = group_sequential_by(df, "seg", "arm", "v", "look", "A", "B")
    got = {(r["seg"], r["look"]): r for r in out.collect()}
    assert len(got) == 8
    import collections
    data = collections.defaultdict(lambda: {"A": [], "B": []})
    for seg, look, arm, v in rows:
        data[seg][arm].append((look, v))
    zcrit = 1.9599639845400545
    for seg in ("x", "y"):
        for k, look in enumerate((1, 2, 3, 4), start=1):
            a = np.array([round(v * 1e6) for l, v in data[seg]["A"] if l <= look])
            b = np.array([round(v * 1e6) for l, v in data[seg]["B"] if l <= look])
            z = (a.mean() - b.mean()) / math.sqrt(
                a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
            r = got[(seg, look)]
            assert r["k_look"] == k and r["n_looks"] == 4
            assert r["n_a"] == len(a) and r["n_b"] == len(b)
            assert r["z"] == pytest.approx(z, rel=1e-9)
            assert r["boundary"] == pytest.approx(
                zcrit * math.sqrt(4 / k), rel=1e-12)
            assert r["crossed"] == (abs(z) > zcrit * math.sqrt(4 / k))
    # the shifted segment should cross by the last look; null never
    assert got[("y", 4)]["crossed"] is True
    assert got[("x", 4)]["crossed"] is False


def test_group_sequential_by_thin_and_missing(spark):
    rows = [
        ("s", 1, "A", 1.0),            # look 1: arm B empty
        ("s", 2, "A", 2.0), ("s", 2, "A", 3.0),
        ("s", 2, "B", 1.0), ("s", 2, "B", 4.0),
        ("s", 2, "B", float("nan")),   # NaN missing
        ("s", None, "A", 9.0),         # NULL look excluded
        ("s", 2, "C", 100.0),          # other arm excluded
    ]
    df = spark.createDataFrame(rows, "seg string, look int, arm string, v double")
    out = {r["look"]: r for r in
           group_sequential_by(df, "seg", "arm", "v", "look", "A", "B").collect()}
    assert set(out) == {1, 2}
    assert out[1]["z"] is None and out[1]["crossed"] is None
    assert out[1]["n_a"] == 1 and out[1]["n_b"] == 0
    assert out[2]["n_a"] == 3 and out[2]["n_b"] == 2
    assert out[2]["z"] is not None
    assert out[2]["n_looks"] == 2


def test_group_sequential_by_guards(spark):
    df = spark.createDataFrame([("s", 1, "A", 1.0)],
                               "seg string, look int, arm string, v double")
    with pytest.raises(ValueError, match="same value"):
        group_sequential_by(df, "seg", "arm", "v", "look", "A", "A")
    with pytest.raises(ValueError, match="critical value"):
        group_sequential_by(df, "seg", "arm", "v", "look", "A", "B",
                            alpha=0.07)
    # explicit crit overrides the table
    out = group_sequential_by(df, "seg", "arm", "v", "look", "A", "B",
                              alpha=0.07, crit=2.0)
    assert out.collect()[0]["boundary"] == pytest.approx(2.0)


# ------------------------- synthetic_control, simplex method


def test_synthetic_control_simplex_recovers_convex_truth(spark):
    # treated = 0.3*d1 + 0.7*d2 exactly: the simplex optimum is the
    # interior point (0.3, 0.7) and must match to solver tolerance
    rows = []
    for t in range(12):
        d1 = float(3 + (t * 7) % 5)
        d2 = float(10 + (t * 3) % 7)
        tr = 0.3 * d1 + 0.7 * d2 + (4.0 if t >= 8 else 0.0)
        rows += [("d1", t, d1), ("d2", t, d2), ("tr", t, tr)]
    df = spark.createDataFrame(rows, "unit string, period int, y double")
    w = {r["unit"]: r["weight"] for r in
         synthetic_control(df, "unit", "period", "y", "tr", 8,
                           return_weights=True, method="simplex").collect()}
    assert w["d1"] == pytest.approx(0.3, abs=1e-5)
    assert w["d2"] == pytest.approx(0.7, abs=1e-5)
    out = {r["period"]: r for r in
           synthetic_control(df, "unit", "period", "y", "tr", 8,
                             method="simplex").collect()}
    for t in range(12):
        assert out[t]["gap"] == pytest.approx(
            4.0 if t >= 8 else 0.0, abs=1e-4)


def test_synthetic_control_simplex_matches_grid_on_boundary(spark):
    # treated = 2*d1 (outside the simplex): optimum sits on the
    # boundary; compare against a fine 1-D grid over w1 in [0,1]
    rng = np.random.RandomState(5)
    D = rng.uniform(5, 15, size=(2, 25))
    ytr = 2.0 * D[0]
    rows = [(f"d{j}", t, float(D[j, t])) for j in range(2) for t in range(25)]
    rows += [("tr", t, float(ytr[t])) for t in range(25)]
    df = spark.createDataFrame(rows, "unit string, period int, y double")
    w = {r["unit"]: r["weight"] for r in
         synthetic_control(df, "unit", "period", "y", "tr", 20,
                           return_weights=True, method="simplex",
                           scale=1e9).collect()}
    U = np.round(D[:, :20] * 1e9)
    ut = np.round(ytr[:20] * 1e9)
    G = U @ U.T
    bb = U @ ut
    grid = np.linspace(0, 1, 200001)
    W = np.stack([grid, 1 - grid])
    # objective along the 1-simplex, vectorized
    vals = 0.5 * (W.T @ G * W.T).sum(1) - W.T @ bb
    w1 = float(grid[int(np.argmin(vals))])
    assert w["d0"] == pytest.approx(w1, abs=1e-4)
    assert w["d0"] + w["d1"] == pytest.approx(1.0, abs=1e-12)
    assert w["d0"] >= -1e-15 and w["d1"] >= -1e-15


def test_synthetic_control_method_guard(spark):
    df = spark.createDataFrame([("a", 1, 1.0)],
                               "unit string, period int, y double")
    with pytest.raises(ValueError, match="unknown method"):
        synthetic_control(df, "unit", "period", "y", "a", 1,
                          method="qp")


# ------------------------------------------- meta_analysis_by

from hdfe_spark.operators.stats import meta_analysis_by


def _dl_replica(th, se):
    th, se = np.asarray(th, float), np.asarray(se, float)
    w = 1 / se**2
    tf = (w * th).sum() / w.sum()
    sef = math.sqrt(1 / w.sum())
    q = (w * th**2).sum() - (w * th).sum() ** 2 / w.sum()
    k = len(th)
    denom = w.sum() - (w**2).sum() / w.sum()
    tau2 = max(0.0, (q - (k - 1)) / denom)
    ws = 1 / (se**2 + tau2)
    tr = (ws * th).sum() / ws.sum()
    ser = math.sqrt(1 / ws.sum())
    i2 = max(0.0, (q - (k - 1)) / q) if q > 0 else None
    return tf, sef, q, tau2, i2, tr, ser


def test_meta_analysis_by_replica(spark):
    rng = np.random.RandomState(21)
    rows, truth = [], {}
    for g, k in (("a", 7), ("b", 3), ("c", 12)):
        th = rng.normal(2.0, 1.0, k)
        se = rng.uniform(0.2, 2.0, k)
        truth[g] = (th, se)
        rows += [(g, float(t), float(s)) for t, s in zip(th, se)]
    df = spark.createDataFrame(rows, "g string, est double, se double")
    out = {r["g"]: r for r in meta_analysis_by(df, "g", "est", "se").collect()}
    for g, (th, se) in truth.items():
        tf, sef, q, tau2, i2, tr, ser = _dl_replica(th, se)
        r = out[g]
        assert r["k"] == len(th)
        assert r["theta_fixed"] == pytest.approx(tf, rel=1e-12)
        assert r["se_fixed"] == pytest.approx(sef, rel=1e-12)
        assert r["q"] == pytest.approx(q, rel=1e-9)
        assert r["tau2"] == pytest.approx(tau2, rel=1e-9, abs=1e-12)
        assert r["theta_random"] == pytest.approx(tr, rel=1e-9)
        assert r["se_random"] == pytest.approx(ser, rel=1e-9)


def test_meta_analysis_by_homogeneous_equals_fixed(spark):
    # identical estimates -> Q = 0, tau2 = 0, random == fixed
    rows = [("g", 3.0, float(s)) for s in (0.5, 1.0, 2.0, 0.25)]
    df = spark.createDataFrame(rows, "g string, est double, se double")
    r = meta_analysis_by(df, "g", "est", "se").collect()[0]
    assert r["theta_fixed"] == pytest.approx(3.0)
    assert r["q"] == pytest.approx(0.0, abs=1e-9)
    assert r["tau2"] == 0.0
    assert r["theta_random"] == pytest.approx(r["theta_fixed"])
    assert r["se_random"] == pytest.approx(r["se_fixed"])


def test_meta_analysis_by_thin_and_invalid(spark):
    rows = [
        ("one", 2.0, 1.0),                 # k=1: fixed only
        ("bad", 2.0, 0.0),                 # se=0 dropped
        ("bad", 5.0, -1.0),                # negative se dropped
        ("bad", float("nan"), 1.0),        # NaN est dropped
        ("bad", 4.0, 2.0),                 # the one valid row
        ("none", None, 1.0),               # all dropped -> no group
    ]
    df = spark.createDataFrame(rows, "g string, est double, se double")
    out = {r["g"]: r for r in meta_analysis_by(df, "g", "est", "se").collect()}
    assert set(out) == {"one", "bad"}
    assert out["one"]["k"] == 1 and out["one"]["q"] is None
    assert out["one"]["theta_random"] is None
    assert out["one"]["theta_fixed"] == pytest.approx(2.0)
    assert out["bad"]["k"] == 1


# ------------------------------------------- off_policy_eval

from hdfe_spark.operators.causal import off_policy_eval


def test_off_policy_eval_replica(spark):
    rng = np.random.RandomState(13)
    rows = []
    for i in range(3000):
        a = "x" if rng.rand() < 0.7 else "y"
        p = 0.7 if a == "x" else 0.3
        pi = "x" if i % 3 == 0 else "y"
        r = float(rng.poisson(5 if a == "x" else 8))
        rows.append((a, p, pi, r))
    df = spark.createDataFrame(rows, "a string, p double, pi string, r double")
    out = off_policy_eval(df, "r", "a", "p", "pi").collect()[0]
    w = np.array([(1/p if a == pi else 0.0) for a, p, pi, _ in rows])
    r = np.array([x[3] for x in rows])
    m = np.array([a == pi for a, p, pi, _ in rows])
    assert out["n"] == 3000 and out["n_matched"] == int(m.sum())
    assert out["v_ips"] == pytest.approx((w*r).sum()/3000, rel=1e-9)
    assert out["v_snips"] == pytest.approx((w*r).sum()/w.sum(), rel=1e-9)
    assert out["ess"] == pytest.approx(w.sum()**2/(w*w).sum(), rel=1e-9)
    # sanity: snips of the "always-x" policy ~= mean reward among x
    rows2 = [(a, p, "x", rr) for a, p, _, rr in rows]
    df2 = spark.createDataFrame(rows2, "a string, p double, pi string, r double")
    o2 = off_policy_eval(df2, "r", "a", "p", "pi").collect()[0]
    mean_x = r[np.array([a == "x" for a, *_ in rows])].mean()
    assert o2["v_snips"] == pytest.approx(mean_x, rel=1e-12)


def test_off_policy_eval_uniform_logging_identities(spark):
    # uniform logging (p = 0.5 both actions), target "always x":
    # SNIPS == mean reward among matched rows EXACTLY (constant
    # weights), IPS == 2 * (sum of matched rewards) / n, ESS == the
    # matched count
    rng = np.random.RandomState(3)
    rows = [("x" if rng.rand() < 0.5 else "y", 0.5, "x",
             float(rng.rand())) for _ in range(2000)]
    df = spark.createDataFrame(rows, "a string, p double, pi string, r double")
    out = off_policy_eval(df, "r", "a", "p", "pi").collect()[0]
    matched = [r for a, _, __, r in rows if a == "x"]
    assert out["v_snips"] == pytest.approx(np.mean(matched), rel=1e-12)
    assert out["v_ips"] == pytest.approx(2 * sum(matched) / 2000, rel=1e-12)
    assert out["ess"] == pytest.approx(len(matched), rel=1e-12)


def test_off_policy_eval_by_and_missing(spark):
    rows = [
        ("g1", "x", 0.5, "x", 2.0),
        ("g1", "y", 0.5, "x", 9.0),   # unmatched: weight 0
        ("g1", "x", None, "x", 5.0),  # NULL propensity: dropped
        ("g1", "x", 0.5, "x", float("nan")),  # NaN reward: dropped
        ("g2", "x", 0.25, None, 3.0),  # NULL target: dropped
        ("g2", "y", 0.25, "y", 4.0),
    ]
    df = spark.createDataFrame(rows, "g string, a string, p double, pi string, r double")
    out = {r["g"]: r for r in
           off_policy_eval(df, "r", "a", "p", "pi", by=["g"]).collect()}
    assert out["g1"]["n"] == 2 and out["g1"]["n_matched"] == 1
    assert out["g1"]["v_ips"] == pytest.approx(2.0 * 2 / 2)
    assert out["g1"]["v_snips"] == pytest.approx(2.0)
    assert out["g2"]["n"] == 1 and out["g2"]["ess"] == pytest.approx(1.0)


def test_off_policy_eval_clip(spark):
    rows = [("x", 0.001, "x", 10.0), ("y", 0.999, "x", 1.0)]
    df = spark.createDataFrame(rows, "a string, p double, pi string, r double")
    out = off_policy_eval(df, "r", "a", "p", "pi", clip=0.1).collect()[0]
    # propensity clipped to 0.1 -> weight 10, not 1000
    assert out["v_ips"] == pytest.approx(10.0 * 10.0 / 2)
