"""Driver-contract registry invariants: the correctness window (first
~50 dict entries — the only ones the driver records) must stay
deliberately composed. Guards against an accidental reorder or a
rows-only query drifting unannounced into a recorded slot."""

import __spark_entry__ as em

# Round-8 window: spends slots ONLY on hash-matchable rows (VERDICT
# r7 item 8) — the 11 rows-only demos sit at the registry tail, each
# carried by an oracle-checked, driver-green certificate query.
ROWS_ONLY_BY_DESIGN: set[str] = set()


def test_window_all_have_oracles_or_are_declared():
    q = list(em.queries())
    oracles = em.oracle_sql()
    missing = [
        k for k in q[:50] if k not in oracles and k not in ROWS_ONLY_BY_DESIGN
    ]
    assert missing == [], f"window entries without oracle: {missing}"


def test_round9_window_composition():
    """Positions 1-50 (fourteenth curation pass): the fifteen
    round-7 builds, the seven round-8 registrations, the five
    round-9 registrations of the round-8 pre-builds, the twelve
    round-9 builds (two batches), then 11 stalest-evidence
    re-certification rows — every slot oracle-checked; the five
    re-certs displaced by the second round-9 batch (ols_3fe,
    quality, repetition_stats, scrub_pii, se_robust) lead the
    backlog at positions 51-55. If this fails after an
    intentional round-10 rotation, update the expectation
    alongside the `queries()` docstring."""
    q = list(em.queries())
    assert set(q[:15]) == {
        "anova", "levene", "pca2", "autocorr", "cusum",
        "weighted_quantiles", "dedup_reps", "span_scrub",
        "lm_buckets", "streaming_anomaly", "isotonic_cal",
        "bfs_levels", "gini", "cross_corr", "binary_source",
    }
    assert set(q[15:22]) == {
        "bm25", "dbscan", "shortest_paths", "mutual_information",
        "best_split", "seasonal", "km_by",
    }
    assert set(q[22:27]) == {
        "funnel_steps", "cohort_retention", "assoc_rules", "gwq",
        "changepoint",
    }
    assert set(q[27:34]) == {
        "transitions", "logistic", "itemcf", "kcore",
        "streaming_transitions", "labelprop", "logistic_by",
    }
    assert set(q[34:39]) == {"holt", "hll", "hits", "poisson", "tree2"}
    # 40-50: re-certs, all oracle-checked; the five displaced
    # re-certs lead the backlog at 51-55
    assert set(q[50:55]) == {
        "ols_3fe", "quality", "repetition_stats", "scrub_pii",
        "se_robust",
    }
    # rows-only demos must all sit OUTSIDE the window
    oracles = em.oracle_sql()
    rows_only = [k for k in q if k not in oracles]
    assert len(rows_only) == 11
    assert all(q.index(k) >= 50 for k in rows_only), rows_only
    assert len(set(q)) == len(q)
    assert len(q) == 261
    # round-9-continuation registrations: ALL NINE round-10
    # pre-builds plus two same-session builds (rake keyword
    # extraction, rare-level collapsing), oracle-checked and queued
    # at the backlog head (adaboost/nb_classify landed after a
    # measured libm-parity analysis cleared their exp/ln oracles)
    assert set(q[55:67]) == {
        "er_cluster", "hll_by", "holt_winters", "url_dedup",
        "event_ngrams", "streaming_hll", "rrf_fuse", "adaboost",
        "nb_classify", "rake", "rare_levels", "streaming_rake",
    }


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
