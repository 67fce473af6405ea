"""Resample-with-gap-fill: dense spine, zero-filled holes, exact bin
stats."""

from hdfe_spark.operators.resample import resample_events


def test_resample_fills_gaps(spark):
    # entity 1: events in bins 0, 0, 3 -> spine 0..3 with 1,2 empty
    rows = [(1, 5, 1.0), (1, 7, 2.0), (1, 35, 4.0), (2, 100, 8.0)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    got = (
        resample_events(df, ts_us_col="ts", bin_us=10)
        .toPandas()
        .set_index(["user_id", "bin"])
        .sort_index()
    )
    assert list(got.loc[1].index) == [0, 1, 2, 3]
    assert got.loc[(1, 0), "n"] == 2 and got.loc[(1, 0), "sum_value"] == 3.0
    assert got.loc[(1, 1), "n"] == 0 and got.loc[(1, 1), "sum_value"] == 0.0
    assert got.loc[(1, 3), "n"] == 1
    # entity 2 spans a single bin
    assert list(got.loc[2].index) == [10]


def test_resample_guards_giant_span(spark):
    import pytest

    rows = [(1, 0, 1.0), (1, 10_000_000, 1.0)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    with pytest.raises(Exception, match="max_bins_per_entity"):
        resample_events(
            df, ts_us_col="ts", bin_us=1, max_bins_per_entity=1000
        ).collect()
    # under the cap the same data resamples fine
    assert (
        resample_events(
            df, ts_us_col="ts", bin_us=1_000_000, max_bins_per_entity=1000
        ).count()
        == 11
    )


def test_interpolate_gaps_linear_inside_only(spark):
    from hdfe_spark.operators.resample import interpolate_gaps

    rows = [
        (1, 0, None),   # leading null stays null
        (1, 1, 10.0),
        (1, 2, None),   # interp between (1,10) and (4,40): 20
        (1, 3, None),   # 30
        (1, 4, 40.0),
        (1, 5, None),   # trailing null stays null
        (2, 0, 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = {
        (r["k"], r["t"]): r["value_interp"]
        for r in interpolate_gaps(df, "k", "t", "v").collect()
    }
    assert got[(1, 0)] is None and got[(1, 5)] is None
    assert got[(1, 1)] == 10.0 and got[(1, 4)] == 40.0
    assert got[(1, 2)] == 20.0 and got[(1, 3)] == 30.0
    assert got[(2, 0)] == 5.0


def test_interpolate_gaps_uneven_spacing(spark):
    from hdfe_spark.operators.resample import interpolate_gaps

    rows = [(1, 0, 0.0), (1, 10, None), (1, 40, 8.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = {
        r["t"]: r["value_interp"]
        for r in interpolate_gaps(df, "k", "t", "v").collect()
    }
    assert got[10] == 0.0 + 8.0 * (10 / 40)
