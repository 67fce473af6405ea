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
