"""asof_join tests: pandas merge_asof is the ground truth."""

import numpy as np
import pandas as pd

from hdfe_spark.operators.asof import asof_join


def test_asof_matches_pandas_merge_asof(spark):
    rng = np.random.RandomState(3)
    n_l, n_r = 400, 150
    left = pd.DataFrame(
        {
            "user_id": rng.randint(0, 20, n_l),
            "ts": rng.randint(0, 10_000, n_l).astype(np.int64),
            "v": rng.randn(n_l),
        }
    ).drop_duplicates(["user_id", "ts"])
    right = pd.DataFrame(
        {
            "user_id": rng.randint(0, 20, n_r),
            "ts": rng.randint(0, 10_000, n_r).astype(np.int64),
            "price": rng.randn(n_r),
        }
    ).drop_duplicates(["user_id", "ts"])

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="user_id",
        )
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
        suffixes=("", "_asof"),
    ).sort_values(["user_id", "ts"]).reset_index(drop=True)

    np.testing.assert_allclose(
        got["price_asof"].to_numpy(dtype=float),
        want["price"].to_numpy(dtype=float),
        rtol=1e-12,
        equal_nan=True,
    )


def test_asof_tie_takes_equal_timestamp(spark):
    left = spark.createDataFrame(
        [(1, 100, 1.0)], "user_id long, ts long, v double"
    )
    right = spark.createDataFrame(
        [(1, 100, 7.0), (1, 50, 5.0)], "user_id long, ts long, price double"
    )
    out = asof_join(left, right, on="user_id").collect()
    assert out[0]["price_asof"] == 7.0  # >= includes the tie


def test_asof_no_prior_row_is_null(spark):
    left = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 2.0)], "user_id long, ts long, v double"
    )
    right = spark.createDataFrame(
        [(1, 50, 9.0)], "user_id long, ts long, price double"
    )
    got = {
        r["user_id"]: r["price_asof"]
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got[1] is None and got[2] is None


def test_asof_struct_carry_is_row_atomic(spark):
    """A right row with a NULL column must not inherit another row's
    value for that column (struct carry, not per-column carry)."""
    left = spark.createDataFrame(
        [(1, 100, 0.0)], "user_id long, ts long, v double"
    )
    right = spark.createDataFrame(
        [(1, 10, 5.0, "a"), (1, 90, None, "b")],
        "user_id long, ts long, price double, tag string",
    )
    row = asof_join(left, right, on="user_id").collect()[0]
    assert row["tag_asof"] == "b"
    assert row["price_asof"] is None  # NOT 5.0 leaked from the older row


def test_asof_duplicate_right_ts_deterministic(spark):
    """Duplicate right rows at one (key, ts): the greatest struct
    value wins, identically on every run/partitioning."""
    left = spark.createDataFrame(
        [(1, 100, 0.0)], "user_id long, ts long, v double"
    )
    rows = [(1, 50, float(p), t) for p, t in [(3, "x"), (9, "z"), (5, "y")]]
    right = spark.createDataFrame(
        rows, "user_id long, ts long, price double, tag string"
    )
    picks = set()
    for _ in range(3):
        r = asof_join(left, right.repartition(8), on="user_id").collect()[0]
        picks.add((r["price_asof"], r["tag_asof"]))
    assert picks == {(9.0, "z")}  # max struct, stable across runs


def test_asof_all_map_right_side_deterministic(spark):
    """Right side whose only payload column is a MAP (unorderable as a
    sort key): duplicate rows at one (key, ts) must still resolve by
    CONTENT — the key-sorted entry-list proxy — not arrival order."""
    left = spark.createDataFrame(
        [(1, 100, 0.0)], "user_id long, ts long, v double"
    )
    rows = [
        (1, 50, {"k": 1}),
        (1, 50, {"k": 9}),
        (1, 50, {"k": 5}),
    ]
    right = spark.createDataFrame(
        rows, "user_id long, ts long, attrs map<string,int>"
    )
    picks = set()
    for _ in range(3):
        r = asof_join(left, right.repartition(8), on="user_id").collect()[0]
        picks.add(tuple(sorted(r["attrs_asof"].items())))
    assert picks == {(("k", 9),)}  # greatest sorted-entries map, every run
