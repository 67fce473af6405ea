"""Property-based tests (hypothesis): invariants that must hold for
ANY input, not just the fixtures — the upgrade to the reference's
seeded-fixture-only strategy (SURVEY.md §5). Spark actions are slow,
so examples are capped and each property batches one round trip.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def panel(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    keys = draw(
        st.lists(st.integers(min_value=0, max_value=5), min_size=n, max_size=n)
    )
    vals = draw(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {"k": keys, "t": np.arange(n, dtype=np.int64), "v": vals}
    )


@SLOW
@given(pdf=panel())
def test_demean_group_means_vanish(spark, pdf):
    from hdfe_spark.operators.groupby import demean

    df = spark.createDataFrame(pdf)
    out = demean(df, keys="k", cols=["v"]).toPandas()
    # property: demeaned values average to ~0 within every group
    grp = out.groupby("k")["v_dm"].mean()
    scale = max(pdf["v"].abs().max(), 1.0)
    np.testing.assert_allclose(grp.values, 0.0, atol=1e-9 * scale)
    assert len(out) == len(pdf)


@SLOW
@given(pdf=panel(), lag=st.integers(min_value=1, max_value=3))
def test_lag_matches_pandas_shift(spark, pdf, lag):
    from hdfe_spark.operators.lags import make_lags

    df = spark.createDataFrame(pdf)
    got_df, names = make_lags(
        df, n_lags_back=lag, n_lags_forward=0,
        outcomes="v", groupby="k", order_by="t",
    )
    col = f"v_lag_{lag}"
    got = (
        got_df.select("k", "t", col).toPandas()
        .sort_values(["k", "t"]).reset_index(drop=True)
    )
    want = (
        pdf.sort_values(["k", "t"])
        .assign(w=lambda d: d.groupby("k")["v"].shift(lag))
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got[col].to_numpy(dtype=float),
        want["w"].to_numpy(dtype=float),
        rtol=1e-12,
        equal_nan=True,
    )
    # reference naming contract: one column per lag in 1..n_lags_back
    assert names["v"] == [f"v_lag_{i}" for i in range(1, lag + 1)]


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Nd"), max_codepoint=0x2FF
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_exact_dedup_properties(spark, texts):
    from hdfe_spark.operators.dedup import exact_dedup_by_hash

    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    df = spark.createDataFrame(pdf)
    out = exact_dedup_by_hash(df).toPandas()
    # survivors = one per distinct text, the min-id representative
    want = pdf.groupby("text", sort=False)["doc_id"].min()
    assert sorted(out["doc_id"]) == sorted(want.values)
    assert out["text"].is_unique


@SLOW
@given(
    keys=st.lists(
        st.integers(min_value=-3, max_value=3), min_size=1, max_size=40
    )
)
def test_factorize_is_dense_rank(spark, keys):
    from hdfe_spark.operators.encoding import factorize

    pdf = pd.DataFrame({"k": keys})
    df = spark.createDataFrame(pdf)
    out = factorize(df, "k").toPandas()
    # codes are 0..n_distinct-1, order-isomorphic to the key order
    codes = out.drop_duplicates("k").sort_values("k")["k_code"].to_numpy()
    assert list(codes) == list(range(len(codes)))
    # same key always maps to the same code
    assert out.groupby("k")["k_code"].nunique().max() == 1
