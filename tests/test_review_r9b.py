"""Regression pins for the second round-9 review pass (the
`tests/test_review_r9.py` convention): each test pins a fix so the
defect class cannot silently return.

Findings covered:
1. event_transitions sorted NULL tiebreaks FIRST (Spark's window
   default) while a SQL oracle's ORDER BY sorts them LAST — a NULL
   tiebreak silently paired different (src, dst) transitions
   cross-engine and the duplicate guard never fired. Tiebreaks now
   sort asc_nulls_last, matching the SQL default.
2. holt embedded its O(series)-step F.aggregate fold into level,
   trend, AND forecast — 4 evaluations per key (lambda expressions
   are excluded from subexpression elimination, SPARK-35410). The
   fold is now staged behind one projection; the optimized plan
   must contain exactly ONE aggregate() lambda.
3. ml._guard_binary_label was a byte-copy of stats._check_integral_y;
   it now delegates, so the two cannot drift.
4. kcore and label_propagation carried byte-identical edge-prep
   blocks; both now share graph._undirected_edges (NULL endpoints
   and self-loops dropped, symmetric, dedup'd).
5. rrf_fuse emitted rank as INT, breaking the family convention
   (item_cf: LONG) its future hash-matched oracle needs.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdfe_spark.operators.graph import _undirected_edges
from hdfe_spark.operators.ml import adaboost_stumps
from hdfe_spark.operators.sessions import event_transitions
from hdfe_spark.operators.stats import holt
from hdfe_spark.operators.text import rrf_fuse


def test_transitions_null_tiebreak_sorts_last(spark):
    # entity u1: two events at the same order value, tiebreaks 3 and
    # NULL, then a third event. NULLS LAST => sequence is B (tie=3),
    # A (tie=NULL), C — transitions B->A, A->C. The pre-fix NULLS
    # FIRST default would have paired A->B, B->C instead.
    rows = [
        ("u1", 1, 3, "B"),
        ("u1", 1, None, "A"),
        ("u1", 2, 1, "C"),
    ]
    df = spark.createDataFrame(
        rows, "e string, o int, tb int, s string"
    )
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in event_transitions(df, "e", "o", "s", ["tb"]).collect()
    }
    assert got == {("B", "A"): 1, ("A", "C"): 1}


def test_transitions_null_tiebreak_matches_sql_engine(spark):
    # the same pairing a SQL engine's default ORDER BY produces —
    # the cross-engine property the operator's certificate relies on
    rows = [
        ("u1", 1, 3, "B"),
        ("u1", 1, None, "A"),
        ("u1", 2, 1, "C"),
        ("u2", 5, None, "X"),
        ("u2", 5, 0, "Y"),
    ]
    df = spark.createDataFrame(
        rows, "e string, o int, tb int, s string"
    )
    got = {
        (r["src"], r["dst"]): (r["n"], r["n_src"])
        for r in event_transitions(df, "e", "o", "s", ["tb"]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["e", "o", "tb", "s"])
    con = duckdb.connect()
    con.register("ev", pdf)
    exp_rows = con.execute(
        """
        WITH seq AS (
          SELECT e, s,
                 lead(s) OVER (PARTITION BY e ORDER BY o, tb) AS nxt
          FROM ev
        ), pairs AS (
          SELECT s AS src, nxt AS dst, count(*) AS n
          FROM seq WHERE nxt IS NOT NULL GROUP BY s, nxt
        )
        SELECT src, dst, n,
               sum(n) OVER (PARTITION BY src) AS n_src
        FROM pairs
        """
    ).fetchall()
    con.close()
    exp = {(r[0], r[1]): (r[2], r[3]) for r in exp_rows}
    assert got == exp


def test_transitions_duplicate_full_key_still_raises(spark):
    # equal order AND equal (NULL) tiebreak on both rows is a genuine
    # duplicate — the null-safe guard key must still fire
    df = spark.createDataFrame(
        [("u1", 1, None, "A"), ("u1", 1, None, "B")],
        "e string, o int, tb int, s string",
    )
    with pytest.raises(Exception, match="duplicate order values"):
        event_transitions(df, "e", "o", "s", ["tb"]).collect()


def test_holt_single_fold_evaluation(spark):
    df = spark.createDataFrame(
        [("k", i, float(i * i % 7)) for i in range(1, 9)],
        "g string, o int, v double",
    )
    out = holt(df, "g", "o", "v", alpha=0.5, gamma=0.3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the O(series)-step lambda fold must appear exactly once in the
    # optimized plan — CollapseProject must NOT re-inline it into
    # level/trend/forecast (4 evaluations pre-fix)
    assert plan.count("aggregate(") == 1, plan
    # and the values are the hand-replayed recursion
    l, b = None, None
    xs = sorted([(i, float(i * i % 7)) for i in range(1, 9)])
    vs = [v for _, v in xs]
    l = 0.5 * vs[1] + 0.5 * (vs[0] + (vs[1] - vs[0]))
    b = 0.3 * (l - vs[0]) + 0.7 * (vs[1] - vs[0])
    for x in vs[2:]:
        l_new = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
    row = out.collect()[0]
    assert row["level"] == pytest.approx(l, abs=0)
    assert row["trend"] == pytest.approx(b, abs=0)
    assert row["forecast"] == pytest.approx(l + b, abs=0)


def test_adaboost_guard_delegates_to_shared_check(spark):
    import hdfe_spark.operators.ml as ml
    import inspect

    # the delegation itself: no local re-implementation of the
    # FloatType/DecimalType check remains in ml.py
    src = inspect.getsource(ml._guard_binary_label)
    assert "_check_integral_y" in src
    assert "DoubleType" not in src
    # a DECIMAL(10,2) label is rejected exactly like the quantized
    # Newton family rejects a fractional y
    df = spark.createDataFrame(
        [(1.0, 0)], "x double, y int"
    ).withColumn("y", F.col("y").cast(T.DecimalType(10, 2)))
    with pytest.raises(ValueError, match="integral/boolean"):
        adaboost_stumps(df, "x", "y")


def test_undirected_edges_shared_prep(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b"),
            ("b", "a"),  # reverse duplicate
            ("c", "c"),  # self-loop — dropped
            ("d", None),  # NULL endpoint — dropped (s != t is NULL)
            (None, "e"),
        ],
        "u string, v string",
    )
    got = {
        (r["s"], r["t"]) for r in _undirected_edges(edges, "u", "v").collect()
    }
    assert got == {("a", "b"), ("b", "a")}


def test_kcore_label_prop_use_shared_prep():
    import inspect

    from hdfe_spark.operators import graph

    for fn in (graph.kcore, graph.label_propagation):
        assert "_undirected_edges(" in inspect.getsource(fn)


def test_rrf_rank_is_long(spark):
    rankings = spark.createDataFrame(
        [("d1", "bm25", 1), ("d2", "bm25", 2), ("d2", "dense", 1)],
        "id string, src string, rnk int",
    )
    out = rrf_fuse(rankings, "id", "src", "rnk", k0=60, k=10)
    assert isinstance(out.schema["rank"].dataType, T.LongType)
    rows = {r["id"]: r for r in out.collect()}
    # d2 appears in both lists: 2^32 div 62 + 2^32 div 61; d1 once
    assert rows["d2"]["rrf_q"] == 2**32 // 62 + 2**32 // 61
    assert rows["d1"]["rrf_q"] == 2**32 // 61
    assert rows["d2"]["rank"] == 1 and rows["d1"]["rank"] == 2
