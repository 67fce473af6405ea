"""Sessionization tests: hand-computed gap-and-islands ground truth."""

import numpy as np

from hdfe_spark.operators.sessions import session_stats, sessionize


def _fixture(spark):
    # user 1: events at t=0,10,20 | gap | 1000,1005 | gap | 5000
    # user 2: single event
    rows = [
        (1, 0), (1, 10), (1, 20), (1, 1000), (1, 1005), (1, 5000),
        (2, 7),
    ]
    return spark.createDataFrame(rows, "user_id long, ts long")


def test_sessionize_gap_islands(spark):
    df = _fixture(spark)
    out = (
        sessionize(df, "user_id", "ts", gap=100)
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    assert list(out[out.user_id == 1]["session_idx"]) == [0, 0, 0, 1, 1, 2]
    assert list(out[out.user_id == 2]["session_idx"]) == [0]


def test_session_stats(spark):
    df = _fixture(spark)
    out = (
        session_stats(df, "user_id", "ts", gap=100)
        .toPandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    u1 = out[out.user_id == 1]
    assert list(u1["n_events"]) == [3, 2, 1]
    assert list(u1["duration"]) == [20, 5, 0]
    assert list(u1["session_start"]) == [0, 1000, 5000]


def test_sessionize_boundary_exact_gap(spark):
    """An inter-event gap EXACTLY equal to `gap` does NOT split (the
    contract is strictly-greater)."""
    df = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 201)], "user_id long, ts long"
    )
    out = (
        sessionize(df, "user_id", "ts", gap=100)
        .toPandas()
        .sort_values("ts")
    )
    assert list(out["session_idx"]) == [0, 0, 1]


def test_tfidf_matches_numpy(spark):
    from hdfe_spark.operators.text import tf_idf

    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "cherry cherry cherry date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = tf_idf(df).toPandas().set_index(["doc_id", "term"])["tfidf"]

    docs = {0: ["apple", "banana", "apple"],
            1: ["banana", "cherry"],
            2: ["cherry", "cherry", "cherry", "date"]}
    n_docs = 3
    dfreq = {"apple": 1, "banana": 2, "cherry": 2, "date": 1}
    for d, toks in docs.items():
        for t in set(toks):
            tf = toks.count(t) / len(toks)
            idf = np.log((n_docs + 1) / (dfreq[t] + 1)) + 1
            np.testing.assert_allclose(got[(d, t)], tf * idf, rtol=1e-12)


def test_tfidf_topk_orders_and_limits(spark):
    from hdfe_spark.operators.text import tf_idf

    rows = [(0, "a a a b c"), (1, "b c d d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tf_idf(df, top_k=2).toPandas()
    assert (out.groupby("doc_id").size() == 2).all()
    # doc 0's top term is its thrice-repeated unique term 'a'
    top0 = out[out.doc_id == 0].sort_values("tfidf", ascending=False)
    assert top0.iloc[0]["term"] == "a"


def test_attribute_last_touch_basic(spark):
    from hdfe_spark.operators.sessions import attribute_last_touch

    rows = [
        # user 1: click(v=1) -> view(v=2) -> purchase(v=10) -> purchase(v=20)
        (1, 1, 1, "click", 1.0),
        (2, 2, 1, "view", 2.0),
        (3, 3, 1, "purchase", 10.0),
        (4, 4, 1, "purchase", 20.0),
        # user 2: organic purchase (no prior touch)
        (5, 1, 2, "purchase", 7.0),
        # user 3: touch AFTER the purchase does not attribute
        (6, 2, 3, "purchase", 5.0),
        (7, 3, 3, "click", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, "
        "value double"
    )
    out = attribute_last_touch(
        df,
        "user_id",
        ["ts", "event_id"],
        "event_type",
        touch_types=["click", "view"],
        conversion_types=["purchase"],
        carry_cols=["event_id"],
    )
    got = {r["event_id"]: r for r in out.collect()}
    assert set(got) == {3, 4, 5, 6}
    assert got[3]["touch_type"] == "view" and got[3]["touch_event_id"] == 2
    assert got[4]["touch_type"] == "view"  # most recent preceding touch
    assert got[5]["touch_type"] is None  # organic
    assert got[6]["touch_type"] is None  # later touch can't attribute
