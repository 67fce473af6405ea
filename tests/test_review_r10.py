"""Round-10 pre-build review findings, pinned:

1. `url_normalize` parsed the authority naively — a userinfo@ prefix
   truncated the host at the first ':' (distinct hosts merged) and
   bracketed IPv6 literals were cut at the first ']' (all IPv6 hosts
   merged). Now RFC-3986 parsed: userinfo kept verbatim, bracketed
   host taken whole.
2. `url_dedup` scanned+canonicalized the input twice (NULL split +
   union). Now ONE scan, ONE window pass over a composite
   (canonical, id-when-null) key.
3. `er_cluster` documents the unique-id precondition (duplicate ids
   fan out the spine join and break cluster_size semantics).
4. `hll_by` duplicated `hll_distinct`'s ~50-line expression core —
   both now delegate to the shared `_hll_rollup`, so the bit-exact
   contract cannot drift.
5. The per-key ordered-series scaffold existed four times in
   stats.py — `ewma`/`cusum`/`holt`/`holt_winters` now share
   `_ordered_series`.
"""

import inspect

import pytest
from pyspark.sql import functions as F


def test_url_normalize_userinfo_and_ipv6(spark):
    from hdfe_spark.operators.dedup import url_normalize

    cases = [
        # userinfo preserved verbatim, host still lowercased
        ("http://alice:pw@Site1.com/x", "http://alice:pw@site1.com/x"),
        ("http://alice:pw@site2.com/x", "http://alice:pw@site2.com/x"),
        # user-only form, default port still dropped after userinfo
        ("https://Bob@H.io:443/p", "https://Bob@h.io/p"),
        # bracketed IPv6 literal taken whole; non-default port kept
        ("http://[::1]:8080/x", "http://[::1]:8080/x"),
        ("http://[2001:DB8::1]/x", "http://[2001:db8::1]/x"),
        # IPv6 + default port dropped
        ("http://[::1]:80/x", "http://[::1]/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [
        r["c"]
        for r in df.select(url_normalize(F.col("u")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]
    # the original failure: two distinct userinfo'd hosts must NOT
    # collapse to the same canonical
    assert got[0] != got[1]
    # and two distinct IPv6 hosts must not collapse either
    assert got[3] != got[4]


def test_url_dedup_single_scan_single_window(spark):
    from hdfe_spark.operators.dedup import url_dedup

    df = spark.createDataFrame(
        [(1, "http://a.io/x"), (2, None), (3, None)],
        "doc_id long, url string",
    )
    out = url_dedup(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one pass: no NULL-split union re-scanning (and re-normalizing)
    # the source, exactly one window over the composite key
    assert "Union" not in plan, plan
    assert plan.count("Window") == 1, plan
    rows = {r["doc_id"]: r for r in out.collect()}
    # NULL urls are per-id singletons, never one merged NULL group
    assert rows[2]["n_dups"] == 1 and rows[3]["n_dups"] == 1
    assert rows[2]["is_rep"] is True and rows[3]["is_rep"] is True


def test_er_cluster_documents_unique_id_precondition():
    from hdfe_spark.operators.fuzzy import er_cluster

    doc = inspect.getdoc(er_cluster)
    assert "UNIQUE" in doc and "duplicate ids" in doc


def test_hll_variants_share_one_core():
    import hdfe_spark.operators.sketch as sketch

    assert "_hll_rollup" in inspect.getsource(sketch.hll_distinct)
    assert "_hll_rollup" in inspect.getsource(sketch.hll_by)
    # no second copy of the estimate expression survives outside the
    # shared core
    src = inspect.getsource(sketch)
    assert src.count("F.lit(0.7213)") == 1  # docstring prose aside


def test_fold_family_shares_ordered_series(spark):
    import hdfe_spark.operators.stats as stats

    for fn in (stats.ewma, stats.cusum, stats.holt, stats.holt_winters):
        assert "_ordered_series(" in inspect.getsource(fn), fn.__name__
    src = inspect.getsource(stats)
    # the scaffold's collect_list(struct(o, v)) spelling exists
    # exactly once (inside _ordered_series)
    assert src.count('F.col(order_col).alias("o")') == 1
    # behavior unchanged: ewma still folds and still guards
    df = spark.createDataFrame(
        [(1, 1, 2.0), (1, 2, 4.0)], "k int, o int, v double"
    )
    r = stats.ewma(df, "k", "o", "v", alpha=0.5).collect()[0]
    assert r["ewma"] == 0.5 * 4.0 + 0.5 * 2.0
    dup = spark.createDataFrame(
        [(1, 1, 2.0), (1, 1, 4.0)], "k int, o int, v double"
    )
    with pytest.raises(Exception, match="duplicate order"):
        stats.ewma(dup, "k", "o", "v", alpha=0.5).collect()


def test_streaming_hll_finalize_empty_defined(spark):
    """Second review pass: hll_finalize on an EMPTY bucket table must
    yield the defined all-empty-sketch row (never NULL sums), and the
    streaming_hll ORACLE must carry the same coalesce — the original
    oracle draft re-opened the contract hole the round-8 review
    closed on the Spark side."""
    import __spark_entry__ as em

    from hdfe_spark.operators.sketch import hll_finalize

    empty = spark.createDataFrame([], "__bkt long, __mx int")
    r = hll_finalize(empty, b=8).collect()[0]
    assert r["m"] == 256 and r["n_empty"] == 256
    assert r["s33"] == 256 * (1 << 33)
    assert r["est"] is not None
    assert "coalesce(sum" in em.oracle_sql()["streaming_hll"]
    # and the rrf wrapper + oracle both exclude NULL part keys
    # (NULLS FIRST vs NULLS LAST would shift every later rank)
    import inspect

    assert "isNotNull" in inspect.getsource(em._q_rrf_fuse)
    assert em.oracle_sql()["rrf_fuse"].count("IS NOT NULL") == 2


def test_third_review_shared_spellings():
    """Third review pass, pinned: streaming_rake delegates to the
    batch operator (its contract IS batch equality); the events
    stream delegates the symlink-dir mechanism to read_table_stream
    (one cache, one sweeper); both weighted samplers share one
    _aes_key spelling (their contract is bit-equal selection)."""
    import inspect

    import hdfe_spark.operators.sampling as sampling
    import hdfe_spark.streaming.ops as ops

    assert "return rake_keywords(" in inspect.getsource(ops.streaming_rake)
    assert "read_table_stream(" in inspect.getsource(
        ops.read_events_stream
    )
    # exactly one copy of the Knuth-hash expression survives (the
    # shared helper; docstring prose aside)
    assert inspect.getsource(sampling).count("F.lit(2654435761)") == 1
    for fn in (sampling.weighted_sample, sampling.weighted_sample_by):
        assert "_aes_key(" in inspect.getsource(fn), fn.__name__
