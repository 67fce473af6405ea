"""Driver-contract registry invariants: the correctness window (first
~50 dict entries — the only ones the driver records) must stay
hash-matchable and deliberately composed. Guards against an accidental
reorder or a rows-only query drifting into a recorded slot."""

import __spark_entry__ as em


def test_window_all_have_oracles():
    q = list(em.queries())
    oracles = em.oracle_sql()
    missing = [k for k in q[:50] if k not in oracles]
    assert missing == [], f"window entries without oracle: {missing}"


def test_round5_window_composition():
    """Positions 1-50 are exactly the round-4 + round-5 never-recorded
    sets (SURVEY 2.5). If this fails after an intentional round-6
    rotation, update the expectation alongside the docstring."""
    q = list(em.queries())
    r4 = q[:33]
    r5 = q[33:50]
    assert r4[0] == "zorder_layout" and r4[-1] == "unpivot_long"
    assert r5[0] == "running_total" and r5[-1] == "window_ranks"
    assert len(set(q)) == len(q)


def test_every_query_has_callable():
    for name, fn in em.queries().items():
        assert callable(fn), name


def test_oracles_are_nonempty_sql():
    for name, sql in em.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
