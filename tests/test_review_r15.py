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
