"""SCD2 interval builder (`operators/scd.py`): validity chains,
collapse semantics, open tails."""

import pyspark.sql.functions as F

from hdfe_spark.operators.scd import scd2_intervals


def _rows(df):
    return sorted(
        (
            (r["k"], r["state"], r["valid_from"], r["valid_to"])
            for r in df.collect()
        ),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_intervals_chain_and_stay_open(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "z")],
        "k long, t long, state string",
    )
    got = _rows(
        scd2_intervals(df, ["k"], "t", ["state"])
    )
    assert got == [
        (1, "a", 10, 20),
        (1, "b", 20, 30),
        (1, "c", 30, None),
        (2, "z", 5, None),
    ]


def test_collapse_merges_consecutive_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "b"), (1, 50, "a")],
        "k long, t long, state string",
    )
    got = _rows(
        scd2_intervals(df, ["k"], "t", ["state"], collapse_unchanged=True)
    )
    # a@10..30, b@30..50, a@50.. — the re-observation of 'a' is a NEW
    # interval (SCD2 tracks history, not distinct states).
    assert got == [(1, "a", 10, 30), (1, "a", 50, None), (1, "b", 30, 50)]


def test_collapse_is_null_safe(spark):
    df = spark.createDataFrame(
        [(1, 10, None), (1, 20, None), (1, 30, "x")],
        "k long, t long, state string",
    )
    got = _rows(
        scd2_intervals(df, ["k"], "t", ["state"], collapse_unchanged=True)
    )
    assert got == [(1, "x", 30, None), (1, None, 10, 30)]


def test_tiebreak_orders_equal_timestamps(spark):
    df = spark.createDataFrame(
        [(1, 10, 2, "b"), (1, 10, 1, "a")],
        "k long, t long, seq long, state string",
    )
    got = _rows(
        scd2_intervals(df, ["k"], "t", ["state"], tiebreak_cols=["seq"])
    )
    assert got == [(1, "a", 10, 10), (1, "b", 10, None)]
