"""Pins for the round-15 mid-round `/code-review` findings.

1. synthetic_control's distinct-donor guard must NOT cost a second
   exchange: the count_distinct rewrite broke the pinned
   one-aggregation plan (caught by test_r14b_plans, re-pinned here
   against the collect_set form), and the guard must still fire.
2. The synthetic_control ORACLE carries the same distinct+row-count
   semantics as the engine (no silent drift if the fixture ever
   stops deduplicating).
3. manski_bounds registers with real range headroom (600000 > the
   TPC-H spec max ~555k) so a reseeded fixture cannot trip the
   in-plan raise.
4. The bayes_ab oracle's Cook-sum range cap exceeds the engine's
   exact_max, so the oracle can never silently truncate while the
   engine computes the full sum.
"""

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from hdfe_spark.operators.causal import synthetic_control
from hdfe_spark.plans import assert_plan


def _panel(spark, extra_rows=()):
    rows = [
        ("T", 1, 10.0), ("T", 2, 12.0), ("T", 3, 11.0),
        ("a", 1, 5.0), ("a", 2, 6.0), ("a", 3, 5.5),
        ("b", 1, 4.0), ("b", 2, 5.0), ("b", 3, 4.5),
        ("T", 4, 13.0),
    ]
    rows += list(extra_rows)
    return spark.createDataFrame(rows, "unit string, per int, y double")


def test_synthetic_control_guard_keeps_single_aggregation(spark):
    # the ADVICE-r14 distinct-donor guard via collect_set must keep
    # the pinned {1 exchange, 0 Python, 0 joins} series plan
    df = _panel(spark, [("a", 4, 6.5), ("b", 4, 5.5)])
    out = synthetic_control(df, "unit", "per", "y", "T", 4)
    assert_plan(out, n_exchanges=1, n_python_stages=0,
                n_sortmerge_joins=0)


def test_synthetic_control_guard_still_fires_post_collect_set(spark):
    # duplicate donor + absent donor: rows == J but distinct < J
    df = _panel(spark, [("a", 4, 6.5), ("a", 4, 6.5)])
    out = {r["per"]: r for r in
           synthetic_control(df, "unit", "per", "y", "T", 4).collect()}
    assert out[4]["synthetic"] is None
    assert out[4]["n_donors"] == 1


def test_synthetic_control_oracle_spells_distinct_and_rows():
    sql = em.oracle_sql()["synthetic_control"]
    assert re.search(r"count\(DISTINCT CASE WHEN unit", sql)
    assert "nd_rows" in sql
    assert re.search(r"n_donors = 2 AND nd_rows = 2", sql)


def test_manski_registration_has_range_headroom():
    import inspect

    src = inspect.getsource(em._q_manski_bounds)
    assert "600000.0" in src and "500000.0" not in src
    sql = em.oracle_sql()["manski_bounds"]
    assert "600000.0" in sql and "500000.0" not in sql


def test_bayes_ab_oracle_range_cap_exceeds_exact_max():
    import inspect

    from hdfe_spark.operators import stats

    sql = em.oracle_sql()["bayes_ab"]
    m = re.search(r"range\((\d+)\)", sql)
    assert m, "Cook-sum range() cap missing from the bayes_ab oracle"
    cap = int(m.group(1))
    sig = inspect.signature(stats.bayes_ab)
    exact_max = sig.parameters["exact_max"].default
    assert cap > exact_max, (cap, exact_max)


# ---------------------------------------- pre-freeze review findings


def test_local_projections_nan_gap_does_not_mispair(spark):
    """A NaN row keeps its POSITION: the h=1 lead at t=1 must be the
    t=2 observation (invalid -> pair drops), never the t=3 value
    pulled across the gap (the pre-fix behavior)."""
    from hdfe_spark.operators.stats import local_projections

    rows = [(1, 1, 1.0, 10.0), (1, 2, float("nan"), 20.0),
            (1, 3, 3.0, 30.0), (1, 4, 4.0, 40.0), (1, 5, 5.0, 50.0)]
    df = spark.createDataFrame(rows, "e int, t int, x double, y double")
    out = {r["horizon"]: r for r in
           local_projections(df, "e", "t", "y", "x", 1).collect()}
    # h=1 pairs: (t=1 -> t=2 y valid! x of base valid, lead y=20
    # valid -> pair KEPT), (t=2 base x NaN -> dropped),
    # (t=3 -> 40), (t=4 -> 50). So n = 3, including (1, 20).
    assert out[1]["n"] == 3
    import numpy as np

    xs = np.array([1.0, 3.0, 4.0])
    ys = np.array([20.0, 40.0, 50.0])
    n = 3
    b = (n * float(xs @ ys) - xs.sum() * ys.sum()) / (
        n * float(xs @ xs) - xs.sum() ** 2
    )
    assert abs(out[1]["b"] - b) < 1e-12
    # h=0: the NaN-x row contributes no pair
    assert out[0]["n"] == 4


def test_local_projections_nan_y_keeps_position(spark):
    from hdfe_spark.operators.stats import local_projections

    rows = [(1, 1, 1.0, 10.0), (1, 2, 2.0, float("nan")),
            (1, 3, 3.0, 30.0)]
    df = spark.createDataFrame(rows, "e int, t int, x double, y double")
    out = {r["horizon"]: r for r in
           local_projections(df, "e", "t", "y", "x", 1).collect()}
    # h=1 pairs: (t=1, lead=NaN y) drops; (t=2 x valid, lead=30)
    # KEPT. Position preserved: t=1's lead is t=2, not t=3.
    assert out[1]["n"] == 1
    assert out[0]["n"] == 2


def test_local_projections_entity_named_n_allowed(spark):
    from hdfe_spark.operators.stats import local_projections

    df = spark.createDataFrame(
        [(1, t, float(t % 3), float(t)) for t in range(6)],
        "n int, t int, x double, y double",
    )
    out = local_projections(df, "n", "t", "y", "x", 1).collect()
    assert len(out) == 2  # no spurious collision raise


def test_dsir_weights_null_target_drops(spark):
    from hdfe_spark.operators.text import dsir_weights

    rows = [(1, True, "a b"), (2, False, "a c"), (3, None, "a b c")]
    df = spark.createDataFrame(
        rows, "doc_id int, is_target boolean, text string"
    )
    out = {r["doc_id"]: r for r in
           dsir_weights(df, "is_target").collect()}
    assert 3 not in out  # neither modeled nor scored
    assert set(out) == {1, 2}


def test_dsir_weights_id_text_same_col_raises(spark):
    import pytest

    from hdfe_spark.operators.text import dsir_weights

    df = spark.createDataFrame(
        [(True, "a")], "tgt boolean, doc string"
    )
    with pytest.raises(ValueError, match="must differ"):
        dsir_weights(df, "tgt", text_col="doc", id_col="doc")


def test_iv_within_validates_before_any_action(spark):
    import pytest

    from hdfe_spark.operators.estimate import iv_within

    # a raise_error-poisoned frame: any Spark ACTION would explode,
    # so a ValueError proves the check ran name-only, driver-side
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.raise_error(F.lit("must not execute")).cast("double")
        .alias("y"),
        F.lit(1.0).alias("x"),
        F.lit(1.0).alias("x2"),
        F.lit(1.0).alias("z"),
        F.lit(1).alias("fe"),
    )
    with pytest.raises(ValueError, match="instrument itself"):
        iv_within(df, "y", "x", "x", "fe")
    with pytest.raises(ValueError, match="under-identified"):
        iv_within(df, "y", ["x", "x2"], ["z"], "fe")
