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


def test_round12_window_composition():
    """Positions 1-50 (sixteenth curation pass, executed as queued
    in SURVEY.md, then amended mid-round): 1-17 = the
    never-driver-recorded oracle-checked queries (the 12 round-11
    registrations + the early-round-12 five,
    `grouped_quantiles_approx_certificate`, `holt_winters_blocked`,
    `winsorize_by`, `mann_whitney_by`, `bh_fdr`), 18-27 = the ten
    late-round-12 econometrics/causal registrations (never-recorded,
    so they outrank re-certs; `streaming_did` is the 24th streaming
    form, `aipw_ate` the doubly-robust completion), 28-50 = the 23
    stalest driver-green re-certs (r05-stratum head); the ten
    evicted re-certs
    (`salted_join` .. `agg_refresh`) move to the backlog HEAD so the
    round-13 re-cert list starts with them, with the 50
    round-11-window entries (fresh r11 evidence) last before the 11
    rows-only demos at the tail. If this fails after an intentional
    round-13 rotation, update the expectation alongside the
    `queries()` docstring."""
    q = list(em.queries())
    assert q[:27] == [
        "ewma_blocked", "cusum_blocked", "holt_blocked",
        "mrr", "avg_precision", "recall_at_k",
        "zscore_by", "topk_by", "welch_by", "ks_by",
        "streaming_welch", "srm_check",
        "grouped_quantiles_approx_certificate",
        "holt_winters_blocked",
        "winsorize_by",
        "mann_whitney_by",
        "bh_fdr",
        "se_cluster2", "iv_2sls", "ols_wls",
        "ols_fit_stats", "did", "event_study",
        "ipw_ate", "rdd", "streaming_did", "aipw_ate",
    ]
    assert q[27] == "equidepth_hist" and q[49] == "rolling_window"
    # backlog head = the ten evicted re-certs, then the r06 stratum
    assert q[50:60] == [
        "salted_join", "semi_anti_join", "sql_q1", "streaming_enrich",
        "subqueries", "tpch_q3", "unpivot_long", "window_ranks",
        "zorder_layout", "agg_refresh",
    ]
    assert q[60:63] == ["cms_certificate", "date_parts", "decimal_agg"]
    assert q[63] == "dq_report" and q[64] == "dup_ngram_spans"
    # the 50 round-11-window entries (freshest evidence) sit last
    # before the rows-only tail, alphabetical within the tie
    r11_window = q[len(q) - 11 - 50 : len(q) - 11]
    assert r11_window == sorted(r11_window)
    assert r11_window[0] == "als" and r11_window[-1] == "window_funcs"
    # rows-only demos must all sit OUTSIDE the window, at the tail
    oracles = em.oracle_sql()
    rows_only = [k for k in q if k not in oracles]
    assert len(rows_only) == 11
    assert all(q.index(k) >= len(q) - 11 for k in rows_only), rows_only
    assert len(set(q)) == len(q)
    assert len(q) == 315


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


def test_no_shadowed_duplicate_definitions():
    """A backwards slice in an editing script once duplicated a
    whole block of stats.py, leaving the FIRST copy silently
    shadowed (the live `logrank_test` was the wrong one while its
    registered query documented the other). Pin the invariant: no
    module in the package defines the same top-level name twice."""
    import ast
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "hdfe_spark"
    for py in sorted(root.rglob("*.py")):
        tree = ast.parse(py.read_text())
        names = [
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                              ast.ClassDef))
        ]
        dupes = {x for x in names if names.count(x) > 1}
        assert not dupes, f"{py}: shadowed duplicate defs {dupes}"


def test_no_duplicate_dict_keys_in_entry_source():
    """A duplicate key in the queries()/oracle_sql() dict LITERALS
    would silently overwrite the earlier entry (Python keeps the
    last) — invisible at runtime because the live dict still looks
    valid. Pin zero duplicates at the source level via AST."""
    import ast
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    tree = ast.parse(p.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
            "queries", "oracle_sql",
        ):
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    keys = [
                        k.value
                        for k in sub.keys
                        if isinstance(k, ast.Constant)
                    ]
                    dupes = {k for k in keys if keys.count(k) > 1}
                    assert not dupes, (node.name, dupes)
