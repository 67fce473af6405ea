"""Round-9 pre-build tests: funnel, retention_cohorts, assoc_rules,
grouped_weighted_quantiles, changepoint (operators landed round 8,
registry queries deferred per the net-new cap discipline)."""

import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.basket import assoc_rules
from hdfe_spark.operators.rank import grouped_weighted_quantiles
from hdfe_spark.operators.sessions import funnel, retention_cohorts
from hdfe_spark.operators.stats import changepoint


# ------------------------------------------------------------ funnel


def _events(spark, rows):
    return spark.createDataFrame(rows, "uid long, t long, typ string")


def test_funnel_basic_completion(spark):
    df = _events(spark, [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),
        (2, 10, "view"), (2, 5, "click"),          # click BEFORE view
        (3, 10, "view"),                            # stops at step 1
        (4, 50, "click"), (4, 60, "buy"),           # never viewed
    ])
    out = {r["uid"]: r for r in funnel(
        df, "uid", "t", "typ", ["view", "click", "buy"]
    ).collect()}
    assert set(out) == {1, 2, 3}          # uid 4 has no step-1 event
    assert (out[1]["steps_completed"], out[1]["t_1"], out[1]["t_2"],
            out[1]["t_3"]) == (3, 10, 20, 30)
    assert (out[2]["steps_completed"], out[2]["t_2"]) == (1, None)
    assert (out[3]["steps_completed"], out[3]["t_2"]) == (1, None)


def test_funnel_greedy_earliest_is_optimal(spark):
    # earliest view at t=10; click exists only at t=15; a "smarter"
    # later view (t=20) would miss it — greedy from the FIRST step-1
    # event must still find view(10) -> click(15)
    df = _events(spark, [
        (1, 10, "view"), (1, 20, "view"), (1, 15, "click"),
    ])
    r = funnel(df, "uid", "t", "typ", ["view", "click"]).collect()[0]
    assert (r["t_1"], r["t_2"], r["steps_completed"]) == (10, 15, 2)


def test_funnel_strictly_after_and_within(spark):
    df = _events(spark, [
        (1, 10, "a"), (1, 10, "b"),   # same instant: NOT after
        (2, 10, "a"), (2, 40, "b"),   # outside within=20
        (3, 10, "a"), (3, 25, "b"),   # inside
    ])
    out = {r["uid"]: r for r in funnel(
        df, "uid", "t", "typ", ["a", "b"], within=20
    ).collect()}
    assert out[1]["t_2"] is None
    assert out[2]["t_2"] is None
    assert out[3]["t_2"] == 25


def test_funnel_windowed_tries_every_anchor(spark):
    """Review finding: with a window, greedy from the FIRST step-1
    event is not optimal — A@0, A@100, B@105, within=10 converts
    via the LATER anchor. Every step-1 event must be tried."""
    df = _events(spark, [
        (1, 0, "a"), (1, 100, "a"), (1, 105, "b"),
    ])
    r = funnel(df, "uid", "t", "typ", ["a", "b"], within=10).collect()[0]
    assert (r["steps_completed"], r["t_1"], r["t_2"]) == (2, 100, 105)
    # earliest-anchor tie-break: two anchors both complete -> first
    df2 = _events(spark, [
        (1, 0, "a"), (1, 5, "b"), (1, 100, "a"), (1, 105, "b"),
    ])
    r2 = funnel(df2, "uid", "t", "typ", ["a", "b"], within=10).collect()[0]
    assert (r2["t_1"], r2["t_2"]) == (0, 5)


def test_funnel_guards(spark):
    df = _events(spark, [(1, 10, "a")])
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel(df, "uid", "t", "typ", ["a"])
    bad = spark.createDataFrame(
        [(1, 1.5, "a")], "uid long, t double, typ string"
    )
    with pytest.raises(ValueError, match="integral"):
        funnel(bad, "uid", "t", "typ", ["a", "b"])


# ------------------------------------------------- retention_cohorts


def test_retention_cohorts_matrix(spark):
    # bucket=10: u1 first in bucket 1, active 1,2,3; u2 first in
    # bucket 1, active 1,3; u3 first in bucket 2, active 2
    rows = [(1, 10), (1, 25), (1, 31), (2, 15), (2, 39), (3, 20)]
    df = spark.createDataFrame(rows, "uid long, t long")
    out = {(r["cohort"], r["offset"]): r for r in retention_cohorts(
        df, "uid", "t", bucket=10
    ).collect()}
    assert out[(1, 0)]["n_active"] == 2
    assert out[(1, 0)]["cohort_size"] == 2
    assert out[(1, 1)]["n_active"] == 1      # only u1 in bucket 2
    assert out[(1, 2)]["n_active"] == 2      # u1 and u2 in bucket 3
    assert out[(2, 0)]["n_active"] == 1
    assert out[(2, 0)]["cohort_size"] == 1
    assert out[(1, 2)]["retention"] == pytest.approx(1.0)
    assert set(out) == {(1, 0), (1, 1), (1, 2), (2, 0)}


def test_retention_cohorts_guard(spark):
    df = spark.createDataFrame([(1, 10)], "uid long, t long")
    with pytest.raises(ValueError, match="positive"):
        retention_cohorts(df, "uid", "t", bucket=0)


def test_retention_cohorts_null_entities_excluded(spark):
    """Review finding: NULL-entity rows used to found a cohort (the
    groupBy keeps the NULL group) but never match the activity
    equi-join, deflating that cohort's retention."""
    rows = [(None, 10), (None, 25), (1, 12)]
    df = spark.createDataFrame(rows, "uid long, t long")
    out = retention_cohorts(df, "uid", "t", bucket=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cohort"], r["n_active"], r["cohort_size"]) == (1, 1, 1)
    assert r["retention"] == 1.0


# --------------------------------------------------------- baskets


def test_assoc_rules_counts_and_ratios(spark):
    rows = [
        (1, "milk"), (1, "bread"), (1, "milk"),   # dup item: once
        (2, "milk"), (2, "bread"),
        (3, "milk"), (3, "eggs"),
        (4, "bread"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["antecedent"], r["consequent"]): r for r in assoc_rules(
        df, "b", "i", min_count=1
    ).collect()}
    r = out[("bread", "milk")]
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"]) == (2, 3, 3, 4)
    assert r["support"] == pytest.approx(0.5)
    assert r["confidence"] == pytest.approx(2 / 3)
    assert r["lift"] == pytest.approx(2 * 4 / (3 * 3))
    # symmetric direction present with swapped margins
    r2 = out[("milk", "bread")]
    assert (r2["n_a"], r2["n_b"]) == (3, 3)
    assert ("milk", "eggs") in out and ("eggs", "milk") in out
    # min_count filter drops the eggs pair
    out2 = {(r["antecedent"], r["consequent"]) for r in assoc_rules(
        df, "b", "i", min_count=2
    ).collect()}
    assert out2 == {("bread", "milk"), ("milk", "bread")}


def test_assoc_rules_guards(spark):
    df = spark.createDataFrame([(1, "a")], "b long, i string")
    with pytest.raises(ValueError, match="min_count"):
        assoc_rules(df, "b", "i", min_count=0)
    empty = spark.createDataFrame([], "b long, i string")
    with pytest.raises(ValueError, match="no baskets"):
        assoc_rules(empty, "b", "i")


# ------------------------------------- grouped_weighted_quantiles


def test_grouped_weighted_quantiles_exact(spark):
    rows = [
        ("g1", 1.0, 1), ("g1", 2.0, 1), ("g1", 3.0, 2),  # W=4
        ("g2", 10.0, 9), ("g2", 20.0, 1),                # W=10
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = {(r["g"], r["pct"]): r for r in grouped_weighted_quantiles(
        df, "g", "v", "w", [25, 50, 100]
    ).collect()}
    # g1 cum: 1@1.0, 2@2.0, 4@3.0
    assert out[("g1", 25)]["value"] == 1.0
    assert out[("g1", 50)]["value"] == 2.0
    assert out[("g1", 100)]["value"] == 3.0
    # g2 cum: 9@10.0, 10@20.0 -> 25/50 both at 10.0
    assert out[("g2", 25)]["value"] == 10.0
    assert out[("g2", 50)]["value"] == 10.0
    assert out[("g2", 100)]["value"] == 20.0
    assert out[("g2", 100)]["cum_weight"] == 10


def test_grouped_weighted_quantiles_zero_weight_group_absent(spark):
    """Review finding: a zero-total-weight group used to satisfy
    0*100 >= p*0 on its first row and emit its smallest value as
    every quantile. Such groups are now absent."""
    rows = [("z", 1.0, 0), ("z", 5.0, 0), ("g", 2.0, 3)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = grouped_weighted_quantiles(df, "g", "v", "w", [50]).collect()
    assert [(r["g"], r["value"]) for r in out] == [("g", 2.0)]


def test_grouped_weighted_quantiles_guards(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.5)], "g string, v double, w double"
    )
    with pytest.raises(ValueError, match="integral"):
        grouped_weighted_quantiles(df, "g", "v", "w")
    neg = spark.createDataFrame(
        [("g", 1.0, 5), ("g", 2.0, -1)], "g string, v double, w long"
    )
    with pytest.raises(ValueError, match="negative weight"):
        grouped_weighted_quantiles(neg, "g", "v", "w")


# ------------------------------------------------------ changepoint


def test_changepoint_recovers_planted_shift(spark):
    rows = [("k", t, 1.0 if t <= 40 else 9.0) for t in range(1, 81)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    r = changepoint(df, "k", "t", "v").collect()[0]
    assert r["split_order"] == 40
    assert (r["n"], r["n_left"], r["n_right"]) == (80, 40, 40)
    assert r["sse_split"] == pytest.approx(0.0, abs=1e-6)
    # sse_total = sum (x - 5)^2 = 80 * 16
    assert r["sse_total"] == pytest.approx(1280.0, rel=1e-6)
    assert r["gain"] == pytest.approx(1280.0, rel=1e-6)


def test_changepoint_tie_breaks_earliest_and_filters(spark):
    # constant series: every split has cost 0 -> earliest split wins
    rows = [("k", t, 5.0) for t in range(1, 6)]
    rows += [("solo", 1, 3.0)]                    # 1 point: absent
    rows += [("nn", 1, None), ("nn", 2, 1.0)]     # null value drops
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["k"]: r for r in changepoint(df, "k", "t", "v").collect()}
    assert set(out) == {"k"}
    assert out["k"]["split_order"] == 1
    assert out["k"]["gain"] == pytest.approx(0.0, abs=1e-9)


def test_changepoint_duplicate_order_raises(spark):
    """Driver-side guard (review finding: an in-plan guard wrapping
    one output column is pruned when callers select the others) —
    raises at CALL time, before any output column is touched."""
    rows = [("k", 1, 1.0), ("k", 1, 2.0), ("k", 2, 3.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    with pytest.raises(ValueError, match="duplicate order"):
        changepoint(df, "k", "t", "v")
    # a duplicate on the LAST row (no candidate row carries it)
    # must also raise — the tie still corrupts boundary sums
    rows2 = [("k", 1, 1.0), ("k", 2, 2.0), ("k", 2, 3.0)]
    df2 = spark.createDataFrame(rows2, "k string, t long, v double")
    with pytest.raises(ValueError, match="duplicate order"):
        changepoint(df2, "k", "t", "v")


# ----------------------------------------------- streaming_funnel


def test_streaming_funnel_equals_batch(spark, sf_dir):
    """Fifteenth streaming form: the incremental greedy walk after
    an availableNow replay equals the batch funnel exactly."""
    from hdfe_spark.sources.tables import load_table
    from hdfe_spark.streaming.ops import read_events_stream, streaming_funnel

    steps = ["view", "click", "purchase"]
    load_table(spark, "events", sf_dir)
    stream = read_events_stream(spark, sf_dir)
    sm = streaming_funnel(stream, "user_id", "event_id", "event_type", steps)
    name = "funnel_stream_test_sink"
    q = (
        sm.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["s"]["steps_completed"], r["s"]["t_1"],
                       r["s"]["t_2"], r["s"]["t_3"])
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("steps_completed", "t_1", "t_2", "t_3"),
                "steps_completed",
            ).alias("s")
        )
        .collect()
    }
    batch = {
        r["user_id"]: (r["steps_completed"], r["t_1"], r["t_2"], r["t_3"])
        for r in funnel(
            load_table(spark, "events", sf_dir),
            "user_id", "event_id", "event_type", steps,
        ).collect()
    }
    assert got == batch
    assert len(batch) > 0


def test_streaming_funnel_guards(spark, sf_dir):
    from hdfe_spark.streaming.ops import read_events_stream, streaming_funnel
    from hdfe_spark.sources.tables import load_table

    load_table(spark, "events", sf_dir)
    stream = read_events_stream(spark, sf_dir)
    with pytest.raises(ValueError, match=">= 2 steps"):
        streaming_funnel(stream, "user_id", "event_id", "event_type", ["a"])
    with pytest.raises(ValueError, match="distinct"):
        streaming_funnel(
            stream, "user_id", "event_id", "event_type", ["a", "a"]
        )
