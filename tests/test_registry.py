"""Driver-contract registry invariants: the correctness window (first
~50 dict entries — the only ones the driver records) must stay
deliberately composed. Guards against an accidental reorder or a
rows-only query drifting unannounced into a recorded slot."""

import __spark_entry__ as em

# After the eighth/ninth curation passes every window entry has an
# oracle: all ten rows-only demos sit at 51+ as the round-7 rotation
# queue (the 15 TPC-H queries and the data-quality family took their
# slots — a hash-matchable first recording beats a rows-only one).
ROWS_ONLY_BY_DESIGN: set[str] = set()


def test_window_all_have_oracles_or_are_declared():
    q = list(em.queries())
    oracles = em.oracle_sql()
    missing = [
        k for k in q[:50] if k not in oracles and k not in ROWS_ONLY_BY_DESIGN
    ]
    assert missing == [], f"window entries without oracle: {missing}"


def test_round6_window_composition():
    """Positions 1-50: the fixed decimal_agg first, then the 12
    round-5-built never-driver-recorded queries, tpch_q18, the 15
    TPC-H queries completing the suite (eighth curation pass), the
    round-6-built operator batches. If this fails after an
    intentional round-7 rotation, update the expectation alongside
    the `queries()` docstring."""
    q = list(em.queries())
    assert q[0] == "decimal_agg"
    assert set(q[1:13]) == {
        "semdedup_recall", "dq_report", "snapshot_roundtrip", "winsorize",
        "tpch_q5", "join_nulls", "string_funcs", "date_parts",
        "pmi_bigrams", "rebalance_sources", "ref_integrity",
        "mad_outliers",
    }
    assert q[13] == "tpch_q18"
    assert set(q[14:29]) == {
        "tpch_q2", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9",
        "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q14", "tpch_q15",
        "tpch_q16", "tpch_q17", "tpch_q19", "tpch_q20", "tpch_q22",
    }
    assert set(q[29:34]) == {
        "inverted_index", "label_centroids", "snapshot_diff",
        "scd2_intervals", "streaming_snapshot",
    }
    assert set(q[45:50]) == {
        "snapshot_diff_apply", "tpch_q21", "interval_join",
        "pagerank", "multimodal_audio",
    }
    # every hash-matchable query in 1-50 has never been driver-
    # recorded before round 6 — the window wastes no slots
    assert len(set(q)) == len(q)


def test_every_query_has_callable():
    for name, fn in em.queries().items():
        assert callable(fn), name


def test_oracles_are_nonempty_sql():
    for name, sql in em.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_oracle_keys_are_registry_queries():
    q = set(em.queries())
    extra = [k for k in em.oracle_sql() if k not in q]
    assert extra == [], f"oracles without a query: {extra}"
