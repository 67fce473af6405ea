"""Regression pins for the round-9 code-review findings (the
`tests/test_advice_r7.py` convention): each test pins a fix from the
round-9 session review so the defect class cannot silently return.

Findings covered:
1. label_propagation negated the LABEL column in its argmax, which
   threw (ANSI) or silently NULLed (non-ANSI) on string node ids —
   the argmax now negates the always-numeric count.
2. hll_distinct on empty / all-NULL-key input emitted NULL s33/est
   instead of the defined all-empty-sketch row.
3. hits() silently returned empty for k < 1 while item_cf/kcore
   raise — now raises ValueError like its siblings.
4. kcore's per-round bookkeeping ran two count() actions where one
   aggregation suffices — behavior must be unchanged.
"""

import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.graph import hits, kcore, label_propagation
from hdfe_spark.operators.sketch import hll_distinct


def test_label_propagation_string_ids(spark):
    # two triangles joined by one bridge edge; string node ids
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("x", "y"), ("y", "z"), ("x", "z"),
            ("c", "x"),
        ],
        "s string, t string",
    )
    out = label_propagation(edges, "s", "t", n_rounds=3).collect()
    labels = {r["node"]: r["label"] for r in out}
    assert set(labels) == {"a", "b", "c", "x", "y", "z"}
    # every label is one of the node ids (never NULL / garbage)
    assert all(v in labels for v in labels.values())


def test_label_propagation_numeric_unchanged(spark):
    # the numeric path must keep its (count DESC, label ASC) argmax:
    # star around 1 -> every leaf adopts 1's label in round 1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "s long, t long"
    )
    out = label_propagation(edges, "s", "t", n_rounds=2).collect()
    labels = {r["node"]: r["label"] for r in out}
    # round 1: leaves adopt 1 (their only neighbor); 1 adopts the
    # smallest leaf label 2 (three-way tie). round 2: the leaves see
    # 1's label 2 and adopt it; 1 sees the leaves' label 1 — the
    # classic period-2 oscillation the fixed-round contract renders
    # deterministic. Pinned exactly:
    assert labels == {1: 1, 2: 2, 3: 2, 4: 2}


def test_hll_distinct_empty_input(spark):
    df = spark.createDataFrame([], "k long")
    row = hll_distinct(df, "k", b=8).collect()[0]
    m = 256
    assert row["m"] == m
    assert row["n_exact"] == 0
    assert row["n_empty"] == m
    assert row["s33"] == m * 8589934592  # m * 2^33
    alpha = 0.7213 / (1 + 1.079 / m)
    assert row["est"] == pytest.approx(alpha * m)
    assert row["rel_err"] is None


def test_hll_distinct_all_null_keys(spark):
    df = spark.createDataFrame([(None,), (None,)], "k string")
    row = hll_distinct(df, "k", b=8).collect()[0]
    assert row["n_exact"] == 0
    assert row["s33"] == 256 * 8589934592
    assert row["est"] is not None


def test_hits_rejects_nonpositive_k(spark):
    edges = spark.createDataFrame([(1, 2)], "s long, t long")
    with pytest.raises(ValueError, match="k must be >= 1"):
        hits(edges, "s", "t", n_iter=1, k=0)


def test_kcore_single_agg_unchanged(spark):
    # K4 plus two pendants: 2-core = exactly the K4, converged
    edges = spark.createDataFrame(
        [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (4, 5), (5, 6),
        ],
        "s long, t long",
    )
    out = kcore(edges, "s", "t", k=3, n_rounds=4).collect()
    nodes = {r["node"]: r["degree"] for r in out}
    assert nodes == {1: 3, 2: 3, 3: 3, 4: 3}
    assert all(r["converged"] for r in out)
