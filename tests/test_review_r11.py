"""Round-11 `/code-review` findings, fixed and pinned:

1. `mrr` counted distinct queries with count_distinct, which DROPS a
   NULL query while the numerator's groupBy keeps its hit — mrr
   could exceed 1.0. Now counted via groupBy (a NULL query is itself
   a query — the shared scaffold contract).
2. `avg_precision_by` with k >= 43 overflowed int64 in lcm(1..k)
   with an opaque engine NumberFormatException — now a loud
   ValueError at k > 42.
3. `spearman_by`'s num was still a double difference (catastrophic
   cancellation past 2^53) while den/gate ran on exact decimals —
   num now comes from the same exact decimal moments.
4. `_blocked_series` / `rank._pinned_sorted` crashed on platforms
   where spark.sql.shuffle.partitions is the non-numeric "auto".
5. The four retrieval ops each re-spelled the ranking scaffold —
   now ONE `_retrieval_base` (the `_ordered_series` discipline).
"""

import inspect

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hdfe_spark.operators.ml import (
    avg_precision_by,
    mrr,
    ndcg_by,
    recall_at_k_by,
)


def test_mrr_counts_null_query_as_a_query(spark):
    rows = [
        (None, 1, 9.0, 1),   # NULL query, hit at rank 1
        ("q2", 1, 3.0, 0),   # q2: no hit
    ]
    df = spark.createDataFrame(rows, "q string, id long, s double, rel long")
    r = mrr(df, "q", "id", "s", "rel", k=10).collect()[0]
    # both queries count: mrr = (1 + 0) / 2, never 1.0
    assert r["n_queries"] == 2 and r["n_hit"] == 1
    assert r["mrr"] == pytest.approx(0.5, rel=1e-15)
    # two hitting queries incl. NULL: mrr stays <= 1
    rows2 = [(None, 1, 9.0, 1), ("q2", 1, 3.0, 1)]
    df2 = spark.createDataFrame(rows2, "q string, id long, s double, rel long")
    r2 = mrr(df2, "q", "id", "s", "rel", k=10).collect()[0]
    assert r2["n_queries"] == 2 and r2["mrr"] == pytest.approx(1.0)


def test_avg_precision_k_overflow_guard(spark):
    df = spark.createDataFrame(
        [("q", 1, 1.0, 1)], "q string, id long, s double, rel long"
    )
    with pytest.raises(ValueError, match="k must be <= 42"):
        avg_precision_by(df, "q", "id", "s", "rel", k=43)
    # k = 42 is the last valid cutoff and must construct cleanly
    assert avg_precision_by(df, "q", "id", "s", "rel", k=42).collect()[0][
        "ap"
    ] == pytest.approx(1.0)


def test_spearman_by_num_from_exact_moments():
    from hdfe_spark.operators import stats

    src = inspect.getsource(stats.spearman_by)
    # num, varx, vary are ALL exact decimal differences
    assert 'nD * F.col("__sxy") - F.col("__sx") * F.col("__sy")' in src
    # no double-cast moment feeds a difference anymore
    assert 'F.col("__sxy").cast("double")' not in src


def test_shuffle_partitions_auto_tolerated(spark):
    # vanilla Spark refuses conf.set("...", "auto") (TYPE_MISMATCH),
    # so the "auto"-setting fork is simulated with a stub session;
    # the real session path is checked for the numeric case
    from hdfe_spark.operators.rank import shuffle_partitions

    class _AutoConf:
        def get(self, key, default=None):
            return "auto"

    class _AutoSpark:
        conf = _AutoConf()

    assert shuffle_partitions(_AutoSpark()) == 200
    assert shuffle_partitions(_AutoSpark(), default=64) == 64
    assert shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # both conf-reading sites route through the shared helper
    import hdfe_spark.operators.rank as rank
    import hdfe_spark.operators.stats as stats

    assert "shuffle_partitions(" in inspect.getsource(rank._pinned_sorted)
    assert "shuffle_partitions(" in inspect.getsource(stats._blocked_series)


def test_retrieval_ops_share_one_scaffold():
    import hdfe_spark.operators.ml as ml

    for fn in (ndcg_by, mrr, avg_precision_by, recall_at_k_by):
        assert "_retrieval_base(" in inspect.getsource(fn), fn.__name__
    src = inspect.getsource(ml)
    # the ranking window spelling exists exactly once (the scaffold)
    assert (
        src.count('Window.partitionBy("q").orderBy(\n        F.col("__s").desc(), F.col("__id").asc()\n    )')
        == 1
    )


def test_winsorize_by_null_values_stay_null(spark):
    """Second review pass: greatest/least SKIP null arguments
    (greatest(NULL, lo) = lo), so an unguarded clamp silently
    rewrote missing values to the group's p_lo bound."""
    from hdfe_spark.operators.stats import winsorize_by

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize_by(df, "g", "v", 0.0, 0.5, out_col="w").collect()
    assert [r["w"] for r in out if r["v"] is None] == [None]
    assert sorted(r["w"] for r in out if r["v"] is not None) == [1.0, 2.0, 2.0]


def test_welch_oracle_shared_between_batch_and_stream():
    """Second review pass: the streaming_welch oracle must BE the
    welch_by oracle (one _WELCH_BY_SQL constant), not a copy that
    can drift."""
    import __spark_entry__ as em

    o = em.oracle_sql()
    assert o["welch_by"] is o["streaming_welch"]
