"""Blocked (segmented) series folds — the 100x-scale path for the
`_ordered_series` family (VERDICT r10 item 3). Pins:

- multi-block results match the sequential fold to ~1 ulp per
  composition step (the documented re-association error);
- a key that fits in ONE block is BIT-IDENTICAL to the sequential
  operator (block 0 replays the exact init-and-fold);
- cusum with integer deltas is bit-identical at ANY blocking (every
  operation exact in binary64 — the max-plus semiring stress
  contract);
- the duplicate-order and block-capacity guards raise loudly;
- the plan contains no Window operator and no SinglePartition
  exchange (the whole point: no per-key single-task funnel).
"""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hdfe_spark.operators.stats import (
    cusum,
    cusum_blocked,
    ewma,
    ewma_blocked,
    holt,
    holt_blocked,
)


@pytest.fixture(scope="module")
def series_df(spark):
    rng = random.Random(7)
    rows = []
    for k, n in (("a", 137), ("b", 9), ("c", 64)):
        for t in range(n):
            rows.append((k, t, round(rng.uniform(-5, 5), 3)))
    return spark.createDataFrame(rows, "k string, t long, v double")


def test_ewma_blocked_matches_sequential(spark, series_df):
    seq = {r["k"]: r["ewma"] for r in ewma(series_df, "k", "t", "v", 0.3).collect()}
    blk = {
        r["k"]: r["ewma"]
        for r in ewma_blocked(
            series_df, "k", "t", "v", 0.3, block_len=16, max_blocks=100
        ).collect()
    }
    assert set(seq) == set(blk)
    for k in seq:
        assert blk[k] == pytest.approx(seq[k], rel=1e-12, abs=1e-300), k


def test_ewma_blocked_single_block_bit_identical(spark, series_df):
    seq = {r["k"]: r["ewma"] for r in ewma(series_df, "k", "t", "v", 0.3).collect()}
    one = {
        r["k"]: r["ewma"]
        for r in ewma_blocked(series_df, "k", "t", "v", 0.3, block_len=1000).collect()
    }
    assert one == seq  # exact ==, not approx


def test_holt_blocked_matches_sequential(spark, series_df):
    cols = ("level", "trend", "forecast")
    seq = {
        r["k"]: tuple(r[c] for c in cols)
        for r in holt(series_df, "k", "t", "v", 0.4, 0.2).collect()
    }
    blk = {
        r["k"]: tuple(r[c] for c in cols)
        for r in holt_blocked(
            series_df, "k", "t", "v", 0.4, 0.2, block_len=16, max_blocks=100
        ).collect()
    }
    assert set(seq) == set(blk)
    for k in seq:
        for s, b in zip(seq[k], blk[k]):
            assert b == pytest.approx(s, rel=1e-10, abs=1e-12), k
    one = {
        r["k"]: tuple(r[c] for c in cols)
        for r in holt_blocked(series_df, "k", "t", "v", 0.4, 0.2, block_len=1000).collect()
    }
    assert one == seq  # single block: bit-identical


def test_holt_blocked_drops_single_row_keys(spark):
    df = spark.createDataFrame(
        [("solo", 1, 5.0), ("pair", 1, 1.0), ("pair", 2, 2.0)],
        "k string, t long, v double",
    )
    got = {r["k"] for r in holt_blocked(df, "k", "t", "v", 0.5, 0.5).collect()}
    assert got == {"pair"}


def test_cusum_blocked_integer_deltas_bit_identical(spark):
    rng = random.Random(11)
    rows = [("a", t, float(rng.randint(-3, 3))) for t in range(201)]
    rows += [("b", t, float(rng.randint(-3, 3))) for t in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    seq = {r["k"]: r["cusum"] for r in cusum(df, "k", "t", "v", 0.0).collect()}
    for bl in (7, 16, 64):
        blk = {
            r["k"]: r["cusum"]
            for r in cusum_blocked(
                df, "k", "t", "v", 0.0, block_len=bl, max_blocks=1000
            ).collect()
        }
        assert blk == seq, bl  # exact ==: integer arithmetic


def test_cusum_blocked_float_deltas_match_within_ulps(spark, series_df):
    seq = {r["k"]: r["cusum"] for r in cusum(series_df, "k", "t", "v", 0.1).collect()}
    blk = {
        r["k"]: r["cusum"]
        for r in cusum_blocked(
            series_df, "k", "t", "v", 0.1, block_len=16, max_blocks=100
        ).collect()
    }
    for k in seq:
        assert blk[k] == pytest.approx(seq[k], rel=1e-12, abs=1e-12), k


def test_blocked_guards_raise(spark, series_df):
    dup = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0)], "k string, t long, v double"
    )
    with pytest.raises(Exception, match="duplicate order"):
        ewma_blocked(dup, "k", "t", "v", 0.5, block_len=4).collect()
    with pytest.raises(Exception, match=r"block_len\*max_blocks"):
        cusum_blocked(
            series_df, "k", "t", "v", 0.0, block_len=2, max_blocks=3
        ).collect()
    with pytest.raises(ValueError, match="block_len"):
        ewma_blocked(series_df, "k", "t", "v", 0.5, block_len=1)
    with pytest.raises(ValueError, match="alpha"):
        ewma_blocked(series_df, "k", "t", "v", 1.5)


def test_blocked_plan_has_no_window_or_single_partition(spark, series_df):
    for op in (
        ewma_blocked(series_df, "k", "t", "v", 0.5, block_len=8),
        cusum_blocked(series_df, "k", "t", "v", 0.0, block_len=8),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "SinglePartition" not in plan


def test_sequential_guard_names_blocked_variants(spark):
    df = spark.createDataFrame(
        [("a", t, 1.0) for t in range(5)], "k string, t long, v double"
    )
    with pytest.raises(Exception, match="ewma_blocked"):
        ewma(df, "k", "t", "v", 0.5, max_series_len=3).collect()


def test_blocked_fold_null_key_is_a_key(spark):
    """The hll_by convention holds through the blocked path: a NULL
    key is its own key (eqNullSafe join of the per-key stats), and
    its multi-block fold matches the sequential operator."""
    rows = [(None, t, float(t % 5)) for t in range(40)]
    rows += [("a", t, 1.0 + t) for t in range(10)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    seq = {r["k"]: r["ewma"] for r in ewma(df, "k", "t", "v", 0.4).collect()}
    blk = {
        r["k"]: r["ewma"]
        for r in ewma_blocked(df, "k", "t", "v", 0.4, block_len=8).collect()
    }
    assert set(map(str, seq)) == set(map(str, blk)) == {"None", "a"}
    assert blk[None] == pytest.approx(seq[None], rel=1e-12)
    assert blk["a"] == seq["a"]  # single block: bit-identical
