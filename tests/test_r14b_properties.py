"""Property-based invariants (hypothesis) for the round-14
second-batch operators — algebraic identities that must hold for
ANY data, the `test_properties.py` convention."""

import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def conformal_frame(draw):
    rng = np.random.RandomState(draw(st.integers(0, 10_000)))
    n_cal = draw(st.integers(min_value=1, max_value=60))
    n_test = draw(st.integers(min_value=0, max_value=30))
    scores = rng.exponential(2.0, n_cal + n_test)
    cal = np.array([True] * n_cal + [False] * n_test)
    return pd.DataFrame({"seg": "s", "score": scores, "cal": cal})


@SLOW
@given(pdf=conformal_frame(),
       alpha=st.sampled_from([0.05, 0.1, 0.2, 0.5]))
def test_conformal_by_matches_order_statistic(spark, pdf, alpha):
    """The cut equals the exact k-th smallest calibration score with
    k = (n+1) - floor((n+1)*alpha); the empirical coverage equals the
    count identity; too-small calibration sets yield the infinite
    interval."""
    from hdfe_spark.operators.stats import conformal_by

    out = conformal_by(
        spark.createDataFrame(pdf), "seg", "score", "cal", alpha
    ).collect()
    assert len(out) == 1
    r = out[0]
    cal = np.sort(pdf.loc[pdf["cal"], "score"].to_numpy())
    k = len(cal) + 1 - math.floor((len(cal) + 1) * alpha)
    test = pdf.loc[~pdf["cal"], "score"].to_numpy()
    assert r["n_cal"] == len(cal) and r["n_test"] == len(test)
    if k > len(cal):
        assert r["q_hat"] is None
        assert r["covered"] == len(test)
    else:
        assert r["q_hat"] == cal[k - 1]
        assert r["covered"] == int((test <= cal[k - 1]).sum())
    if len(test) == 0:
        assert r["coverage"] is None
    else:
        assert r["coverage"] == r["covered"] / len(test)


@st.composite
def gseq_frame(draw):
    rng = np.random.RandomState(draw(st.integers(0, 10_000)))
    n_looks = draw(st.integers(min_value=1, max_value=5))
    rows = []
    for lk in range(1, n_looks + 1):
        for arm in ("A", "B"):
            m = draw(st.integers(min_value=0, max_value=12))
            for v in rng.normal(0, 1, m):
                rows.append(("g", lk, arm, float(v)))
    if not rows:
        rows = [("g", 1, "A", 0.0)]
    return pd.DataFrame(rows, columns=["seg", "look", "arm", "v"])


@SLOW
@given(pdf=gseq_frame())
def test_group_sequential_final_look_equals_welch(spark, pdf):
    """At the FINAL look the cumulative z must equal welch_by's
    t-statistic on the pooled data exactly (same moments, same IEEE
    expression), and the boundary there is exactly the critical
    value (sqrt(K/K) = 1)."""
    from hdfe_spark.operators.stats import group_sequential_by, welch_by

    sdf = spark.createDataFrame(pdf)
    gs = group_sequential_by(sdf, "seg", "arm", "v", "look", "A", "B")
    rows = sorted(gs.collect(), key=lambda r: r["look"])
    if not rows:
        return
    last = rows[-1]
    w = welch_by(sdf, "seg", "arm", "v", "A", "B").collect()[0]
    assert last["n_a"] == w["n_a"] and last["n_b"] == w["n_b"]
    if w["t_stat"] is None:
        assert last["z"] is None
    else:
        assert last["z"] == w["t_stat"]
    assert last["boundary"] == 1.9599639845400545
    # ordinal bookkeeping: k_look runs 1..K, n_looks constant
    assert [r["k_look"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["n_looks"] == len(rows) for r in rows)
    # monotone: cumulative counts never decrease
    for a, b in zip(rows, rows[1:]):
        assert b["n_a"] >= a["n_a"] and b["n_b"] >= a["n_b"]
