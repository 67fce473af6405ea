"""Pins for the four round-14 ADVICE items.

1. `synthetic_control` counts DISTINCT donor units per post period:
   a post period with one donor duplicated and another absent (row
   count still == J) gets NULL synthetic instead of the duplicate's
   weight applied twice; a duplicated-donor-only period (all J
   present, one twice) also NULLs.
2. The simplex docstring describes the ACTUAL stopping rule
   (first-iterate-relative duality gap, fw_max_iter default 20 000).
3. `regression_kink` gates each side on >= 2 DISTINCT running
   values: a side with many rows at one x emits NULLs rather than a
   slope identified only through the continuity constraint.
4. `wilson_ci_by` accepts an explicit ``crit=`` z for alpha levels
   outside the built-in table (the `group_sequential_by`
   convention), without touching module-private state.
"""

import math

import pytest

from hdfe_spark.operators.causal import regression_kink, synthetic_control
from hdfe_spark.operators.stats import wilson_ci_by


# ------------------------------------------------- items 1 + 2


def _panel(spark, extra_rows=()):
    # units: T (treated), a, b; pre periods 1..3, post 4..5
    rows = [
        ("T", 1, 10.0), ("T", 2, 12.0), ("T", 3, 11.0),
        ("a", 1, 5.0), ("a", 2, 6.0), ("a", 3, 5.5),
        ("b", 1, 4.0), ("b", 2, 5.0), ("b", 3, 4.5),
        ("T", 4, 13.0), ("T", 5, 14.0),
        ("a", 4, 6.5), ("b", 4, 5.5),
        # period 5 rows come from extra_rows
    ]
    rows += list(extra_rows)
    return spark.createDataFrame(rows, "unit string, per int, y double")


def test_synthetic_control_post_duplicate_donor_nulls(spark):
    # period 5: donor 'a' appears TWICE, donor 'b' absent -> donor
    # ROW count == 2 == J, but distinct donors == 1: synthetic must
    # be NULL (pre-fix it was 2*w_a*y_a with b omitted).
    df = _panel(spark, [("a", 5, 7.0), ("a", 5, 7.0)])
    out = {r["per"]: r for r in
           synthetic_control(df, "unit", "per", "y", "T", 4).collect()}
    assert out[5]["synthetic"] is None
    assert out[5]["gap"] is None
    assert out[5]["n_donors"] == 1  # distinct donors present
    # period 4 is clean and stays identified
    assert out[4]["synthetic"] is not None
    assert out[4]["n_donors"] == 2


def test_synthetic_control_post_all_present_one_duplicated_nulls(spark):
    # period 5: both donors present AND 'a' duplicated -> distinct
    # == J but row count 3 != J: synthetic must be NULL.
    df = _panel(spark, [("a", 5, 7.0), ("a", 5, 7.0), ("b", 5, 6.0)])
    out = {r["per"]: r for r in
           synthetic_control(df, "unit", "per", "y", "T", 4).collect()}
    assert out[5]["synthetic"] is None
    assert out[5]["n_donors"] == 2


def test_synthetic_control_clean_panel_unchanged(spark):
    # a clean post period keeps the exact J=2 Cramer synthetic
    df = _panel(spark, [("a", 5, 7.0), ("b", 5, 6.0)])
    out = {r["per"]: r for r in
           synthetic_control(df, "unit", "per", "y", "T", 4).collect()}
    assert out[5]["synthetic"] is not None
    assert out[5]["n_donors"] == 2
    assert math.isclose(out[5]["gap"],
                        out[5]["actual"] - out[5]["synthetic"])


def test_simplex_docstring_describes_actual_rule():
    doc = synthetic_control.__doc__
    assert "first iterate" in doc or "RELATIVE to the first" in doc
    assert "20 000" in doc or "20_000" in doc or "20000" in doc
    # the stale absolute-bound claim is gone as the governing rule
    assert "100k iterations" not in doc
    assert "gap < 1e-12" not in doc


# ------------------------------------------------- item 3


def test_regression_kink_single_distinct_x_side_nulls(spark):
    # left side: 3 rows all at x = -0.5 (one distinct value);
    # right side: well spread. det > 0 via the cross term, but the
    # left slope is identified only through continuity -> NULLs.
    rows = [(-0.5, 1.0), (-0.5, 1.2), (-0.5, 0.8),
            (0.1, 2.0), (0.3, 2.6), (0.5, 3.2), (0.7, 3.8)]
    df = spark.createDataFrame(rows, "run double, y double")
    r = regression_kink(df, "y", "run", 0.0, 1.0).collect()[0]
    assert r["n_left"] == 3 and r["n_right"] == 4
    assert r["kink_effect"] is None
    assert r["slope_left"] is None and r["slope_right"] is None
    assert r["intercept"] is None


def test_regression_kink_two_distinct_x_identified(spark):
    # the same shape with a second left x value is identified
    rows = [(-0.5, 1.0), (-0.25, 1.5), (-0.5, 1.0),
            (0.1, 2.0), (0.3, 2.6), (0.5, 3.2)]
    df = spark.createDataFrame(rows, "run double, y double")
    r = regression_kink(df, "y", "run", 0.0, 1.0).collect()[0]
    assert r["kink_effect"] is not None


# ------------------------------------------------- item 4


def test_wilson_ci_by_explicit_crit(spark):
    df = spark.createDataFrame(
        [("g", 1.0)] * 7 + [("g", 0.0)] * 3, "g string, s double"
    )
    # alpha=0.2 has no table entry: crit= must unlock it
    z = 1.2815515655446004  # two-sided z for alpha = 0.2
    out = wilson_ci_by(df, "g", "s", alpha=0.2, crit=z).collect()[0]
    n, p = 10.0, 0.7
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert math.isclose(out["lo"], center - half, rel_tol=1e-12)
    assert math.isclose(out["hi"], center + half, rel_tol=1e-12)


def test_wilson_ci_by_crit_none_table_raise_mentions_crit(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, s double")
    with pytest.raises(ValueError, match="crit"):
        wilson_ci_by(df, "g", "s", alpha=0.2)


def test_wilson_ci_by_crit_matches_table_alpha(spark):
    from hdfe_spark.operators.stats import _Z_TWOSIDED

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 0.0), ("g", 1.0)], "g string, s double"
    )
    a = wilson_ci_by(df, "g", "s", alpha=0.05).collect()[0]
    b = wilson_ci_by(df, "g", "s",
                     crit=_Z_TWOSIDED[0.05]).collect()[0]
    assert a["lo"] == b["lo"] and a["hi"] == b["hi"]
