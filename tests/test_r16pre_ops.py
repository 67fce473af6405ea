"""Round-16 pre-builds: dsir_weights (DSIR hashed importance
weights, Xie et al. 2023) and sun_abraham (interaction-weighted
event study, Sun & Abraham 2021)."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.causal import att_gt, sun_abraham
from hdfe_spark.operators.text import dsir_weights


# --------------------------------------------------- dsir_weights


def _bucket(tok, n_hex=2):
    return hashlib.md5(tok.encode()).hexdigest()[:n_hex]


def _dsir_replica(rows, n_hex=2, alpha=0.5):
    B = 16 ** n_hex
    ct, cr = {}, {}
    toks = {}
    for doc_id, is_t, text in rows:
        tl = [t for t in re.split(r"\s+", text.lower()) if t]
        toks[doc_id] = tl
        for t in tl:
            b = _bucket(t, n_hex)
            (ct if is_t else cr)[b] = (ct if is_t else cr).get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for doc_id, is_t, text in rows:
        tl = toks[doc_id]
        if not tl:
            continue
        lw = 0.0
        for t in tl:
            b = _bucket(t, n_hex)
            lw += math.log((ct.get(b, 0) + alpha) / (nt + alpha * B))
            lw -= math.log((cr.get(b, 0) + alpha) / (nr + alpha * B))
        out[doc_id] = (len(tl), lw)
    return out


def test_dsir_weights_matches_python_replica(spark):
    rows = [
        (1, True, "the quick brown fox jumps high"),
        (2, True, "clean careful prose reads well"),
        (3, False, "buy cheap pills now now now"),
        (4, False, "the quick brown fox is here"),
        (5, False, "clean careful prose reads well indeed"),
        (6, False, ""),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, is_target boolean, text string"
    )
    got = {r["doc_id"]: r for r in
           dsir_weights(df, "is_target").collect()}
    want = _dsir_replica(rows)
    assert set(got) == set(want)  # empty doc 6 drops
    for k, (n, lw) in want.items():
        assert got[k]["n_tokens"] == n
        assert math.isclose(got[k]["log_weight"], lw, rel_tol=1e-9), k


def test_dsir_weights_target_like_scores_higher(spark):
    # the raw doc that matches the target profile must outscore the
    # raw doc that doesn't (the whole point of the operator)
    rows = [
        (1, True, "clean careful prose reads well"),
        (2, True, "clean careful prose reads very well"),
        (3, False, "clean careful prose reads well today"),
        (4, False, "buy cheap pills now now now now"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, is_target boolean, text string"
    )
    got = {r["doc_id"]: r["log_weight"] for r in
           dsir_weights(df, "is_target").collect()}
    assert got[3] > got[4]


def test_dsir_weights_guards(spark):
    df = spark.createDataFrame(
        [(1, True, "x")], "doc_id int, is_target boolean, text string"
    )
    with pytest.raises(ValueError, match="must differ"):
        dsir_weights(df, "doc_id")


def test_dsir_weights_plan_two_exchanges_no_python(spark):
    from hdfe_spark.plans import assert_plan

    df = spark.createDataFrame(
        [(1, True, "a b c"), (2, False, "a d")],
        "doc_id int, is_target boolean, text string",
    )
    out = dsir_weights(df, "is_target")
    # static plan duplicates the shared (doc, bucket) subtree per
    # consumer; what matters is the EXECUTED plan, where exchange
    # reuse kicks in: the token-sized shuffle materializes ONCE and
    # the model/final consumers read it as ReusedExchange. Model
    # joins broadcast, zero Python stages either way.
    rep = assert_plan(out, n_python_stages=0, n_sortmerge_joins=0)
    assert rep["n_broadcast_joins"] == 2
    out.collect()
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 2


# --------------------------------------------------- sun_abraham


def _panel(spark):
    # cohorts g=3 (effect +2 from adoption), g=4 (effect +6),
    # never-treated controls; periods 1..6; trends parallel by
    # construction (unit level + common period shock)
    rows = []
    units = [
        ("u1", 3, 10.0, 2.0),   # (unit, g, level, effect at l>=0)
        ("u2", 3, 20.0, 2.0),
        ("u3", 4, 15.0, 6.0),
        ("u4", None, 12.0, 0.0),
        ("u5", None, 18.0, 0.0),
    ]
    for unit, g, lev, eff in units:
        for t in range(1, 7):
            y = lev + 0.5 * t
            if g is not None and t >= g:
                y += eff
            rows.append((unit, t, g, y))
    return spark.createDataFrame(
        rows, "unit string, t int, g int, y double"
    )


def test_sun_abraham_recovers_cohort_weighted_effects(spark):
    df = _panel(spark)
    out = {r["rel_period"]: r for r in
           sun_abraham(df, "y", "t", "g").collect()}
    # l=0: cohorts 3 (n=2, eff 2) and 4 (n=1, eff 6):
    # IW = (2*2 + 1*6)/3
    assert math.isclose(out[0]["att_iw"], (2 * 2.0 + 1 * 6.0) / 3,
                        rel_tol=1e-12)
    assert out[0]["n_cohorts"] == 2 and out[0]["n_treat"] == 3
    # l=2: cohort 3 at t=5 (n=2, eff 2) and cohort 4 at t=6 (n=1, 6)
    assert math.isclose(out[2]["att_iw"], (2 * 2.0 + 1 * 6.0) / 3,
                        rel_tol=1e-12)
    # l=3: only cohort 3 (t=6) is observed
    assert math.isclose(out[3]["att_iw"], 2.0, rel_tol=1e-12)
    assert out[3]["n_cohorts"] == 1


def test_sun_abraham_equals_att_gt_when_one_cohort(spark):
    df = _panel(spark).filter(
        F.col("g").isNull() | (F.col("g") == 3)
    )
    iw = {r["rel_period"]: r["att_iw"] for r in
          sun_abraham(df, "y", "t", "g").collect()}
    cells = {r["t"] - r["g"]: r["att"] for r in
             att_gt(df, "y", "t", "g").collect()}
    assert set(iw) == set(cells)
    for l, v in cells.items():
        assert math.isclose(iw[l], v, rel_tol=1e-12)


def test_sun_abraham_plan_is_att_gt_plus_one_tiny_agg(spark):
    from hdfe_spark.plans import assert_plan, plan_report

    df = _panel(spark)
    base = plan_report(att_gt(df, "y", "t", "g"))
    out = sun_abraham(df, "y", "t", "g")
    rep = assert_plan(out, n_python_stages=0)
    # one extra exchange over the tiny cell table, nothing else
    assert rep["n_exchanges"] <= base["n_exchanges"] + 1


# --------------------------------------------------- local_projections


def test_local_projections_matches_numpy(spark):
    import numpy as np

    from hdfe_spark.operators.stats import local_projections

    rng = np.random.default_rng(13)
    rows, series = [], {}
    for e in range(5):
        x = np.round(rng.normal(0, 1, 40), 4)
        y = np.zeros(40)
        for t in range(40):
            y[t] = 0.8 * (y[t - 1] if t else 0) + x[t] + \
                rng.normal(0, 0.1)
        y = np.round(y, 4)
        series[e] = (x, y)
        for t in range(40):
            rows.append((e, t, float(x[t]), float(y[t])))
    df = spark.createDataFrame(rows, "e int, t int, x double, y double")
    out = {r["horizon"]: r for r in
           local_projections(df, "e", "t", "y", "x", 3).collect()}
    import math

    for h in range(4):
        xs, ys = [], []
        for e, (x, y) in series.items():
            for t in range(40 - h):
                xs.append(x[t])
                ys.append(y[t + h])
        xs, ys = np.array(xs), np.array(ys)
        n = len(xs)
        vx = n * (xs * xs).sum() - xs.sum() ** 2
        cxy = n * (xs * ys).sum() - xs.sum() * ys.sum()
        b = cxy / vx
        assert out[h]["n"] == n
        assert math.isclose(out[h]["b"], b, rel_tol=1e-7), h
        # IRF of the AR(1) construction decays like 0.8^h
        assert abs(out[h]["b"] - 0.8 ** h) < 0.1
        assert out[h]["se"] is not None and out[h]["se"] > 0


def test_local_projections_duplicate_time_raises(spark):
    import pytest

    from hdfe_spark.operators.stats import local_projections

    df = spark.createDataFrame(
        [(1, 1, 1.0, 2.0), (1, 1, 2.0, 3.0), (1, 2, 3.0, 4.0)],
        "e int, t int, x double, y double",
    )
    with pytest.raises(Exception, match="duplicate order"):
        local_projections(df, "e", "t", "y", "x", 1).collect()


def test_local_projections_horizon_shrinks_sample(spark):
    from hdfe_spark.operators.stats import local_projections

    rows = [(1, t, float(t % 3), float(t)) for t in range(10)]
    df = spark.createDataFrame(rows, "e int, t int, x double, y double")
    out = {r["horizon"]: r["n"] for r in
           local_projections(df, "e", "t", "y", "x", 2).collect()}
    assert out[0] == 10 and out[1] == 9 and out[2] == 8


def test_local_projections_guards(spark):
    import pytest

    from hdfe_spark.operators.stats import local_projections

    df = spark.createDataFrame(
        [(1, 1, 1.0, 2.0)], "e int, t int, x double, y double"
    )
    with pytest.raises(ValueError, match="max_horizon"):
        local_projections(df, "e", "t", "y", "x", -1)
    # constant x -> vx == 0 -> NULL slope, n still reported
    dfc = spark.createDataFrame(
        [(1, t, 5.0, float(t)) for t in range(6)],
        "e int, t int, x double, y double",
    )
    r = {x["horizon"]: x for x in
         local_projections(dfc, "e", "t", "y", "x", 1).collect()}
    assert r[0]["b"] is None and r[0]["n"] == 6


# --------------------------------------------------- granger_by


def test_granger_by_matches_numpy(spark):
    import numpy as np

    from hdfe_spark.operators.stats import granger_by

    rng = np.random.default_rng(17)
    rows, series = [], {}
    for e in ("p", "q"):
        x = np.round(rng.normal(0, 1, 60), 4)
        y = np.zeros(60)
        for t in range(1, 60):
            y[t] = 0.4 * y[t - 1] + (0.8 if e == "p" else 0.0) * \
                x[t - 1] + rng.normal(0, 0.2)
        y = np.round(y, 4)
        series[e] = (x, y)
        for t in range(60):
            rows.append((e, t, float(y[t]), float(x[t])))
    df = spark.createDataFrame(rows, "e string, t int, y double, x double")
    out = {r["e"]: r for r in
           granger_by(df, "e", "t", "y", "x").collect()}
    import math

    for e, (x, y) in series.items():
        yt, y1, x1 = y[1:], y[:-1], x[:-1]
        n = len(yt)
        Z = np.column_stack([np.ones(n), y1, x1])
        bu, rssu = np.linalg.lstsq(Z, yt, rcond=None)[0], None
        rssu = float(((yt - Z @ bu) ** 2).sum())
        Zr = np.column_stack([np.ones(n), y1])
        br = np.linalg.lstsq(Zr, yt, rcond=None)[0]
        rssr = float(((yt - Zr @ br) ** 2).sum())
        f = (rssr - rssu) / (rssu / (n - 3))
        r = out[e]
        assert r["n"] == n
        assert math.isclose(r["rho"], bu[1], rel_tol=1e-6), e
        assert math.isclose(r["beta"], bu[2], rel_tol=1e-6), e
        assert math.isclose(r["f_stat"], f, rel_tol=1e-6), e
    # the causal entity must show a large F, the null entity small
    assert out["p"]["f_stat"] > 50
    assert out["q"]["f_stat"] < 10


def test_granger_by_null_triple_drops_position_kept(spark):
    from hdfe_spark.operators.stats import granger_by

    rows = [("e", 1, 1.0, 1.0), ("e", 2, 2.0, float("nan")),
            ("e", 3, 3.0, 1.5), ("e", 4, 2.5, 2.0),
            ("e", 5, 3.5, 2.5), ("e", 6, 3.0, 2.0),
            ("e", 7, 4.0, 2.2)]
    df = spark.createDataFrame(rows, "e string, t int, y double, x double")
    r = granger_by(df, "e", "t", "y", "x").collect()[0]
    # triples at t=2 (x1 ok but x_t NaN is irrelevant — x enters
    # lagged only) ... t=3's triple has x_{t-1}=NaN -> drops; all
    # others (t=2,4,5,6,7) have complete (y_t, y_{t-1}, x_{t-1})
    assert r["n"] == 5


def test_granger_by_duplicate_time_raises(spark):
    import pytest

    from hdfe_spark.operators.stats import granger_by

    df = spark.createDataFrame(
        [("e", 1, 1.0, 1.0), ("e", 1, 2.0, 2.0), ("e", 2, 3.0, 3.0)],
        "e string, t int, y double, x double",
    )
    with pytest.raises(Exception, match="duplicate order"):
        granger_by(df, "e", "t", "y", "x").collect()


def test_granger_by_degenerate_entities_null(spark):
    from hdfe_spark.operators.stats import granger_by

    # constant y1 (zero saa) and a too-short entity
    rows = [("c", t, 5.0, float(t)) for t in range(8)]
    rows += [("s", 1, 1.0, 1.0), ("s", 2, 2.0, 2.0)]
    df = spark.createDataFrame(rows, "e string, t int, y double, x double")
    out = {r["e"]: r for r in
           granger_by(df, "e", "t", "y", "x").collect()}
    assert out["c"]["f_stat"] is None  # det == 0 (constant y lag)
    assert out["s"]["rho"] is None     # n < 5


# --------------------------------------------------- pretrends


def test_att_gt_pre_cells_zero_under_parallel_trends(spark):
    df = _panel(spark)  # parallel by construction
    cells = att_gt(df, "y", "t", "g", side="pre").collect()
    # cohort 3: pre cells t=1 (t=2 is the g-1 anchor); cohort 4:
    # t=1,2 (t=3 anchor)
    assert {(r["g"], r["t"]) for r in cells} == {(3, 1), (4, 1), (4, 2)}
    for r in cells:
        assert abs(r["att"]) < 1e-12


def test_att_gt_side_guard(spark):
    import pytest

    df = _panel(spark)
    with pytest.raises(ValueError, match="unknown side"):
        att_gt(df, "y", "t", "g", side="both")


def test_pretrends_null_under_parallel_trends(spark):
    from hdfe_spark.operators.causal import pretrends

    df = _panel(spark)
    r = pretrends(df, "y", "t", "g").collect()[0]
    assert r["n_cells"] == 3
    assert abs(r["mean_placebo"]) < 1e-12
    assert abs(r["slope"]) < 1e-12


def test_pretrends_detects_broken_trends(spark):
    import math

    from hdfe_spark.operators.causal import pretrends

    # cohort units drift +1.0/period BEFORE adoption relative to
    # controls: the placebo slope must recover ~1.0
    rows = []
    units = [("u1", 5, 10.0), ("u2", 5, 20.0),
             ("u3", None, 12.0), ("u4", None, 18.0)]
    for unit, g, lev in units:
        for t in range(1, 7):
            y = lev + 0.5 * t
            if g is not None:
                y += 1.0 * t  # cohort-specific pre trend
            rows.append((unit, t, g, y))
    df = spark.createDataFrame(rows, "unit string, t int, g int, y double")
    r = pretrends(df, "y", "t", "g").collect()[0]
    # placebo(g=5, t) = [y(g,t)-y(g,4)] - [c(t)-c(4)] = 1.0*(t-4);
    # slope on r = t-5 is exactly 1.0
    assert r["n_cells"] == 3  # t = 1, 2, 3
    assert math.isclose(r["slope"], 1.0, rel_tol=1e-9)
    # the placebo drift is EXACTLY linear here, so the weighted RSS
    # is 0, se == 0, and z stays NULL by the se > 0 gate
    assert r["se"] == 0.0 and r["z"] is None


def test_pretrends_too_few_cells_null(spark):
    from hdfe_spark.operators.causal import pretrends

    # one cohort adopting at t=3: placebo cells only t=1 -> n_cells
    # = 1 < 3 -> NULL inference, counts still report
    rows = []
    for unit, g, lev in [("a", 3, 10.0), ("b", None, 12.0)]:
        for t in range(1, 5):
            rows.append((unit, t, g, lev + 0.5 * t))
    df = spark.createDataFrame(rows, "unit string, t int, g int, y double")
    r = pretrends(df, "y", "t", "g").collect()[0]
    assert r["n_cells"] == 1
    assert r["slope"] is None and r["se"] is None


def test_pretrends_noisy_drift_z_nonnull(spark):
    from hdfe_spark.operators.causal import pretrends

    rows = []
    wiggle = {1: 0.3, 2: -0.2, 3: 0.1, 4: 0.0}
    for unit, g, lev in [("u1", 6, 10.0), ("u2", 6, 20.0),
                         ("u3", None, 12.0), ("u4", None, 18.0)]:
        for t in range(1, 8):
            y = lev + 0.5 * t
            if g is not None:
                y += 1.0 * t + wiggle.get(t, 0.0)
            rows.append((unit, t, g, y))
    df = spark.createDataFrame(rows, "unit string, t int, g int, y double")
    r = pretrends(df, "y", "t", "g").collect()[0]
    assert r["n_cells"] == 4  # t = 1..4 (t=5 is the anchor)
    assert r["se"] > 0 and r["z"] is not None
    assert abs(r["slope"] - 1.0) < 0.3  # drift still dominates


# --------------------------------------------------- streaming_cohens


def test_streaming_cohens_equals_batch(spark, sf_dir):
    """availableNow fold == batch table exactly (additive decimal
    counters), the 29th streaming form's defining equality."""
    import uuid

    from hdfe_spark.operators.stats import cohens_d_by
    from hdfe_spark.streaming.ops import (
        read_table_stream,
        streaming_cohens,
    )

    def shape(df):
        return df.select(
            (F.col("user_id") % 10).cast("long").alias("seg"),
            "event_type", "value",
        )

    batch = cohens_d_by(
        shape(spark.read.parquet(f"{sf_dir}/events.parquet")),
        "seg", "event_type", "value", "click", "view",
    ).collect()
    stream = streaming_cohens(
        shape(read_table_stream(spark, sf_dir, "events")),
        "seg", "event_type", "value", "click", "view",
    )
    sink = "t" + uuid.uuid4().hex[:12]
    q = (
        stream.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table(sink).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


# --------------------------------------------------- rdd_sensitivity


def test_rdd_sensitivity_each_row_equals_rdd(spark):
    import numpy as np

    from hdfe_spark.operators.causal import rdd, rdd_sensitivity

    rng = np.random.default_rng(23)
    run = np.round(rng.uniform(0, 50, 800), 2)
    yv = np.round(
        10 + 0.4 * run + 5.0 * (run >= 25) + rng.normal(0, 1, 800), 3
    )
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(run, yv)],
        "run double, y double",
    )
    hs = [5.0, 10.0, 20.0]
    panel = {r["bandwidth"]: r for r in
             rdd_sensitivity(df, "y", "run", 25.0, hs).collect()}
    import math

    assert set(panel) == set(hs)
    for h in hs:
        single = rdd(df, "y", "run", 25.0, h).collect()[0]
        p = panel[h]
        assert p["n_left"] == single["n_left"]
        assert p["n_right"] == single["n_right"]
        assert math.isclose(p["effect"], single["effect"],
                            rel_tol=1e-12)
        assert math.isclose(p["slope_left"], single["slope_left"],
                            rel_tol=1e-12)
        # the jump survives every bandwidth
        assert 3.0 < p["effect"] < 7.0


def test_rdd_sensitivity_guards(spark):
    import pytest

    from hdfe_spark.operators.causal import rdd_sensitivity

    df = spark.createDataFrame([(1.0, 1.0)], "run double, y double")
    with pytest.raises(ValueError, match="positive"):
        rdd_sensitivity(df, "y", "run", 0.0, [])
    with pytest.raises(ValueError, match="positive"):
        rdd_sensitivity(df, "y", "run", 0.0, [1.0, -2.0])
    with pytest.raises(ValueError, match="duplicate"):
        rdd_sensitivity(df, "y", "run", 0.0, [1.0, 1.0])


def test_rdd_sensitivity_single_aggregation_plan(spark):
    from hdfe_spark.plans import assert_plan

    import numpy as np

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(float(a), float(a * 2)) for a in rng.uniform(0, 50, 50)],
        "run double, y double",
    )
    from hdfe_spark.operators.causal import rdd_sensitivity

    out = rdd_sensitivity(df, "y", "run", 25.0, [5.0, 10.0, 20.0])
    # every bandwidth rides ONE partial/final aggregation pair
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0, n_broadcast_joins=0)
