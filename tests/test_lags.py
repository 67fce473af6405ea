"""Lag/lead tests — closes the reference's own coverage gap (no tests
for ``make_lags``/``make_one_lag``; TODO at ``hdfe/hdfe.py:48``).
Oracle: pandas ``groupby().shift()`` on the same data, which matches
the reference's positional-shift semantics when rows are ordered by
the explicit time column.
"""

import numpy as np
import pandas as pd
import pytest

from hdfe_spark.operators.lags import make_lags, make_one_lag

SEED = 1


@pytest.fixture(scope="module")
def panel_pdf():
    rng = np.random.RandomState(SEED)
    rows = []
    for ent in range(20):
        # entity 0 gets a single row → exercises |lag| > group size
        n = 1 if ent == 0 else rng.randint(2, 15)
        for t in range(n):
            rows.append((ent, t, rng.randn(), rng.randn()))
    return pd.DataFrame(rows, columns=["entity_id", "t", "y1", "y2"])


@pytest.fixture(scope="module")
def panel_df(spark, panel_pdf):
    return spark.createDataFrame(panel_pdf)


def _sorted(pdf):
    return pdf.sort_values(["entity_id", "t"]).reset_index(drop=True)


def test_make_one_lag_null_fill(panel_df, panel_pdf):
    got = _sorted(
        make_one_lag(panel_df, "y1", 1, "entity_id", "t").toPandas()
    )
    want = _sorted(panel_pdf)
    want["y1_lag_1"] = want.groupby("entity_id")["y1"].shift(1)
    np.testing.assert_allclose(
        got["y1_lag_1"].values, want["y1_lag_1"].values, rtol=1e-12
    )


def test_make_one_lag_lead(panel_df, panel_pdf):
    got = _sorted(make_one_lag(panel_df, "y1", -2, "entity_id", "t").toPandas())
    want = _sorted(panel_pdf)
    want["y1_lag_-2"] = want.groupby("entity_id")["y1"].shift(-2)
    np.testing.assert_allclose(
        got["y1_lag_-2"].values, want["y1_lag_-2"].values, rtol=1e-12
    )


def test_make_one_lag_zero_fill(panel_df, panel_pdf):
    got = _sorted(
        make_one_lag(panel_df, "y1", 1, "entity_id", "t", fill_zeros=True).toPandas()
    )
    want = _sorted(panel_pdf)
    shifted = want.groupby("entity_id")["y1"].shift(1)
    np.testing.assert_allclose(
        got["y1_lag_1"].values, shifted.fillna(0.0).values, rtol=1e-12
    )
    np.testing.assert_array_equal(
        got["y1_lag_1_mi"].values, shifted.isna().astype(int).values
    )


def test_make_lags_contract(panel_df, panel_pdf):
    """Column naming + lag set contract of ``hdfe/hdfe.py:261,273-275``."""
    out, lag_vars = make_lags(
        panel_df, n_lags_back=2, n_lags_forward=1,
        outcomes=["y1", "y2"], groupby="entity_id", order_by="t",
    )
    assert lag_vars["y1"] == ["y1_lag_-1", "y1_lag_1", "y1_lag_2"]
    assert lag_vars["y2"] == ["y2_lag_-1", "y2_lag_1", "y2_lag_2"]
    got = _sorted(out.toPandas())
    want = _sorted(panel_pdf)
    g = want.groupby("entity_id")
    for out_col, lag in [("y1_lag_-1", -1), ("y1_lag_1", 1), ("y1_lag_2", 2),
                         ("y2_lag_2", 2)]:
        src = out_col.split("_lag_")[0]
        np.testing.assert_allclose(
            got[out_col].values,
            g[src].shift(lag).values,
            rtol=1e-12,
            err_msg=out_col,
        )


def test_make_lags_zero_fill_interleaved_names(panel_df):
    _, lag_vars = make_lags(
        panel_df, n_lags_back=1, n_lags_forward=1,
        outcomes=["y1"], groupby="entity_id", order_by="t", fill_zeros=True,
    )
    # Reference interleaves [name, name_mi] per lag (hdfe/hdfe.py:280-289)
    assert lag_vars["y1"] == ["y1_lag_-1", "y1_lag_-1_mi", "y1_lag_1", "y1_lag_1_mi"]


def test_degenerate_small_group(panel_df, panel_pdf):
    """Entity 0 has one row: lag 2 must be all-missing for it
    (reference degenerate path hdfe/hdfe.py:193-202)."""
    got = make_one_lag(panel_df, "y1", 2, "entity_id", "t").toPandas()
    ent0 = got[got["entity_id"] == 0]
    assert ent0["y1_lag_2"].isna().all()
