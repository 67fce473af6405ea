"""Pinned regression tests for the round-9 ADVICE findings (fixed
in round 10): the adaboost int64 weight guard, the RAKE stopword
regex-metacharacter validation, and the hll_finalize bucket-table
consistency guard. The fourth finding (label_propagation 2-cycle
oscillation) is a documented contract, pinned here as behavior so
the docs can't silently drift from what the operator does.

Also pins VERDICT r9 item 5: the fold family's enforced
max-series-length guard (`stats._ordered_series`) — a key longer
than ``max_series_len`` raises loudly in-plan instead of quietly
materializing an unbounded array in one task."""

import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.sketch import hll_finalize


def test_rake_rejects_regex_metachar_stopwords(spark):
    from hdfe_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "deep learning of the art")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match=r"\[a-z0-9\]\+"):
        rake_keywords(df, "text", stopwords=["the", "a+b"])
    with pytest.raises(ValueError, match=r"\[a-z0-9\]\+"):
        rake_keywords(df, "text", stopwords=["don't"])
    # uppercase never matches the lowercased text — reject loudly
    with pytest.raises(ValueError, match=r"\[a-z0-9\]\+"):
        rake_keywords(df, "text", stopwords=["The"])
    # plain words still work
    out = rake_keywords(df, "text", stopwords=["of", "the"], min_freq=1)
    words = {r["word"] for r in out.collect()}
    assert "learning" in words and "the" not in words


def test_hll_finalize_rejects_mismatched_b(spark):
    # a b=12 bucket table (buckets up to 4095) finalized at b=8
    # used to produce a silently negative n_empty — now it raises
    t = spark.createDataFrame(
        [(4000, 5), (10, 3)], "__bkt long, __mx long"
    )
    with pytest.raises(Exception, match="inconsistent with b=8"):
        hll_finalize(t, b=8).collect()


def test_hll_finalize_rejects_bad_rho_and_duplicates(spark):
    bad_rho = spark.createDataFrame(
        [(1, 0), (2, 3)], "__bkt long, __mx long"
    )
    with pytest.raises(Exception, match="inconsistent with b=8"):
        hll_finalize(bad_rho, b=8).collect()
    dup = spark.createDataFrame(
        [(7, 3), (7, 5)], "__bkt long, __mx long"
    )
    with pytest.raises(Exception, match="inconsistent with b=8"):
        hll_finalize(dup, b=8).collect()


def test_hll_finalize_still_exact_on_valid_table(spark):
    # valid table passes the guard and the arithmetic is unchanged:
    # one seen bucket with rho=1, m-1 empty at 2^33 each
    t = spark.createDataFrame([(3, 1)], "__bkt long, __mx long")
    row = hll_finalize(t, b=8).collect()[0]
    assert row["m"] == 256
    assert row["n_empty"] == 255
    assert row["s33"] == (1 << 32) + 255 * (1 << 33)


def test_adaboost_weight_guard_raises_before_int64_overflow(spark):
    from hdfe_spark.operators.ml import adaboost_stumps

    # 62-bit starting weights: round 1 fits int64, the round-1
    # update multiplies the misclassified side by exp(alpha) > 1,
    # so round 2's total exceeds int64 — the guard must fire with
    # the actionable message, not a createDataFrame crash at the end
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 1)], "x long, y long"
    )
    with pytest.raises(ValueError, match="exceeds int64"):
        adaboost_stumps(df, "x", "y", n_rounds=2, wbits=62)


def test_series_fold_max_length_guard(spark):
    # VERDICT r9 item 5: every _ordered_series consumer refuses a
    # key whose series exceeds max_series_len — loudly, in-plan,
    # naming the operator and the key
    from hdfe_spark.operators.stats import cusum, ewma, holt

    df = spark.createDataFrame(
        [(1, t, float(t)) for t in range(10)],
        "k long, t long, x double",
    )
    with pytest.raises(Exception, match="ewma: series length 10"):
        ewma(df, "k", "t", "x", alpha=0.3, max_series_len=9).collect()
    with pytest.raises(Exception, match="cusum: series length 10"):
        cusum(df, "k", "t", "x", target=0.0, max_series_len=9).collect()
    with pytest.raises(Exception, match="holt: series length 10"):
        holt(
            df, "k", "t", "x", alpha=0.3, gamma=0.3, max_series_len=9
        ).collect()
    # at the limit, the fold result is unchanged
    ok = ewma(df, "k", "t", "x", alpha=0.3, max_series_len=10).collect()
    assert len(ok) == 1 and ok[0]["n"] == 10


def test_labelprop_two_cycle_oscillation_is_the_documented_contract(
    spark,
):
    from hdfe_spark.operators.graph import label_propagation

    e = spark.createDataFrame([(10, 11)], "u long, v long")
    odd = {
        (r["node"], r["label"])
        for r in label_propagation(e, "u", "v", n_rounds=3).collect()
    }
    even = {
        (r["node"], r["label"])
        for r in label_propagation(e, "u", "v", n_rounds=2).collect()
    }
    # odd rounds: swapped labels (NOT a connectivity partition);
    # even rounds: fixed point of the 2-cycle — exactly as documented
    assert odd == {(10, 11), (11, 10)}
    assert even == {(10, 10), (11, 11)}
