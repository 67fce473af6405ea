"""Round-15 additions: the bayes_ab count-envelope contract
(VERDICT r14 item 6) — method= policy, the envelope raise, and the
property-pinned error bound of the normal escape."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdfe_spark.operators.stats import (
    _bayes_ab_exact,
    _bayes_ab_normal,
    bayes_ab,
)


def _df(spark, n_a=6, s_a=4, n_b=6, s_b=5):
    rows = (
        [("A", 1.0)] * s_a + [("A", 0.0)] * (n_a - s_a)
        + [("B", 1.0)] * s_b + [("B", 0.0)] * (n_b - s_b)
    )
    return spark.createDataFrame(rows, "arm string, s double")


def test_bayes_ab_method_exact_within_envelope(spark):
    r = bayes_ab(_df(spark), "arm", "s", "A", "B",
                 method="exact").collect()[0]
    assert r["method"] == "exact"
    assert math.isclose(
        r["p_b_beats_a"], _bayes_ab_exact(5, 3, 6, 2), rel_tol=1e-12
    )


def test_bayes_ab_method_exact_envelope_raise(spark):
    # the ENVELOPE RAISE: exact demanded above exact_max must fail
    # loudly, never loop unboundedly or silently approximate
    with pytest.raises(ValueError, match="exact_max"):
        bayes_ab(_df(spark), "arm", "s", "A", "B",
                 exact_max=3, method="exact")


def test_bayes_ab_method_normal_forced(spark):
    r = bayes_ab(_df(spark), "arm", "s", "A", "B",
                 method="normal").collect()[0]
    assert r["method"] == "normal"
    assert math.isclose(
        r["p_b_beats_a"], _bayes_ab_normal(5, 3, 6, 2), rel_tol=1e-12
    )


def test_bayes_ab_method_auto_escapes_silently(spark):
    a = bayes_ab(_df(spark), "arm", "s", "A", "B",
                 exact_max=3).collect()[0]
    assert a["method"] == "normal"
    b = bayes_ab(_df(spark), "arm", "s", "A", "B",
                 exact_max=3, method="normal").collect()[0]
    assert a["p_b_beats_a"] == b["p_b_beats_a"]


def test_bayes_ab_unknown_method_raises(spark):
    with pytest.raises(ValueError, match="unknown method"):
        bayes_ab(_df(spark), "arm", "s", "A", "B", method="mcmc")


# ------------------------------------------------ the pinned bound
#
# The docstring advertises |exact − normal| <= 0.6/sqrt(min
# posterior n). Hypothesis sweeps the count × rate grid (driver-side
# scalar math only — no Spark session needed, so the sweep is cheap).


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=50, max_value=4000),
    pa=st.floats(min_value=0.0, max_value=1.0),
    pb=st.floats(min_value=0.0, max_value=1.0),
)
def test_bayes_ab_normal_escape_error_bound(n, pa, pb):
    s_a, s_b = int(round(n * pa)), int(round(n * pb))
    aA, bA = 1 + s_a, 1 + n - s_a
    aB, bB = 1 + s_b, 1 + n - s_b
    err = abs(_bayes_ab_exact(aA, bA, aB, bB)
              - _bayes_ab_normal(aA, bA, aB, bB))
    assert err <= 0.6 / math.sqrt(min(aA + bA, aB + bB))


def test_bayes_ab_swap_identity_scalar():
    # P(B>A) + P(A>B) == 1 for continuous posteriors (no ties)
    p1 = _bayes_ab_exact(5, 9, 11, 3)
    p2 = _bayes_ab_exact(11, 3, 5, 9)
    assert math.isclose(p1 + p2, 1.0, abs_tol=1e-12)
