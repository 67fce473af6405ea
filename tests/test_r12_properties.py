"""Property-based invariants (hypothesis) for the round-12
econometrics/causal panel — algebraic identities that must hold for
ANY data, the `test_properties.py` convention (examples capped,
Spark round trips batched)."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)


@st.composite
def reg_frame(draw):
    n = draw(st.integers(min_value=8, max_value=50))
    rng = np.random.RandomState(draw(st.integers(0, 10_000)))
    x1 = rng.randn(n)
    x2 = rng.randn(n) + 0.3 * x1
    y = np.array(draw(st.lists(_vals, min_size=n, max_size=n)))
    w = rng.uniform(0.1, 5.0, n)
    return pd.DataFrame({"x1": x1, "x2": x2, "y": y, "w": w})


@SLOW
@given(pdf=reg_frame())
def test_wls_equals_ols_on_duplicated_rows(spark, pdf):
    """Frequency-weight identity: WLS with integer weights k equals
    OLS on the row physically repeated k times."""
    from hdfe_spark.operators.estimate import estimate, wls

    pdf = pdf.copy()
    pdf["k"] = (pdf["w"] * 2).astype(int) + 1  # 1..10
    rep = pdf.loc[pdf.index.repeat(pdf["k"])].reset_index(drop=True)
    b_w = wls(
        spark.createDataFrame(pdf.assign(kd=pdf["k"].astype(float))),
        "y", ["x1", "x2"], weights="kd",
    ).b[:, 0]
    b_r = estimate(
        spark.createDataFrame(rep), "y", ["x1", "x2"]
    ).b[:, 0]
    assert np.allclose(b_w, b_r, rtol=1e-7, atol=1e-9)


@SLOW
@given(pdf=reg_frame())
def test_iv_self_instrument_equals_ols(spark, pdf):
    """Exogeneity identity: instrumenting x1 with a COPY of itself
    reduces IV to OLS exactly (Z = X up to the copy)."""
    from hdfe_spark.operators.estimate import estimate, iv_2sls

    pdf = pdf.assign(z=pdf["x1"])
    sdf = spark.createDataFrame(pdf)
    b_iv = iv_2sls(sdf, "y", "x1", "z", x_exog="x2").b[:, 0]
    b_ols = estimate(sdf, "y", ["x1", "x2"]).b[:, 0]
    assert np.allclose(b_iv, b_ols, rtol=1e-6, atol=1e-8)


@SLOW
@given(pdf=reg_frame())
def test_twoway_cluster_collapses_to_oneway_on_equal_keys(spark, pdf):
    """CGM degeneracy: when both cluster dimensions are the SAME
    partition, M_a = M_b = M_ab so the two-way variance equals the
    one-way variance exactly."""
    from hdfe_spark.operators.estimate import estimate

    pdf = pdf.copy()
    pdf["ca"] = (np.arange(len(pdf)) % 4)
    pdf["cb"] = pdf["ca"] + 10  # distinct column, identical partition
    sdf = spark.createDataFrame(pdf)
    v2 = estimate(sdf, "y", ["x1", "x2"], estimate_variance=True,
                  cluster=["ca", "cb"]).V[0]
    v1 = estimate(sdf, "y", ["x1", "x2"], estimate_variance=True,
                  cluster="ca").V[0]
    assert np.allclose(v2, v1, rtol=1e-9, atol=1e-12)


@SLOW
@given(pdf=reg_frame())
def test_did_att_equals_saturated_ols_interaction(spark, pdf):
    """The 2×2 DiD ATT is the saturated-OLS interaction coefficient
    for any outcome and any (non-degenerate) cell assignment."""
    from hdfe_spark.operators.causal import did
    from hdfe_spark.operators.estimate import estimate

    n = len(pdf)
    t = (np.arange(n) % 2) == 0
    p = (np.arange(n) // 2 % 2) == 0
    if n < 8:
        return
    pdf2 = pd.DataFrame(
        {"y": pdf["y"], "t": t, "p": p, "ones": 1.0,
         "ti": t.astype(float), "pi": p.astype(float),
         "tp": (t & p).astype(float)}
    )
    sdf = spark.createDataFrame(pdf2)
    att = did(sdf, "y", "t", "p").collect()[0]["att"]
    b = estimate(sdf, "y", ["ones", "ti", "pi", "tp"]).b[3, 0]
    scale = max(abs(pdf["y"]).max(), 1.0)
    assert abs(att - b) < 1e-7 * scale + 1e-9


@SLOW
@given(pdf=reg_frame())
def test_ipw_uniform_propensity_equals_naive_diff(spark, pdf):
    """With a constant 0.5 propensity the Hájek estimator reduces to
    the plain difference in arm means."""
    from hdfe_spark.operators.causal import ipw_ate

    n = len(pdf)
    t = (np.arange(n) % 2) == 0
    pdf2 = pd.DataFrame({"y": pdf["y"], "t": t, "e": 0.5})
    row = ipw_ate(spark.createDataFrame(pdf2), "y", "t", "e").collect()[0]
    naive = pdf["y"][t].mean() - pdf["y"][~t].mean()
    scale = max(abs(pdf["y"]).max(), 1.0)
    assert abs(row["ate"] - naive) < 1e-9 * scale + 1e-12
