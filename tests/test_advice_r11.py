"""Pinned regression tests for the round-10 ADVICE findings (fixed
in round 11):

1. (high) `cramers_v` now sums chi2 over the FULL r x c grid —
   unobserved cells contribute (0 - exp)^2 / exp = exp — so sparse
   contingency tables are no longer silently underestimated.
2. (low) `spearman_by` computes den from the SAME exact decimal
   moments its constant-column gate checks (sqrt(varx_d * vary_d)),
   so the gated and computed quantities can never disagree.
3. (low) `cohen_kappa` on empty / all-NULL input returns the
   zero-counters row (0, 0, NULL, NULL, NULL) — the
   `confusion_stats` empty-input convention.
4. (low) `auc_by` / `auc_score`'s boolean label coercion (nonzero =
   positive) is a DOCUMENTED convention, pinned as behavior.
"""

import math

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _expected_cramers(pairs):
    """Closed-form dense-grid chi2 / V computed independently of the
    operator (pure Python over the full r x c grid)."""
    from collections import Counter

    obs = Counter(pairs)
    rows = Counter(a for a, _ in pairs)
    cols = Counter(b for _, b in pairs)
    n = float(len(pairs))
    chi2 = 0.0
    for a in sorted(rows):
        for b in sorted(cols):
            exp = rows[a] * cols[b] / n
            o = obs.get((a, b), 0)
            chi2 += (o - exp) ** 2 / exp
    k = min(len(rows) - 1, len(cols) - 1)
    return chi2, math.sqrt(chi2 / (n * k))


def test_cramers_v_sparse_table_counts_zero_cells(spark):
    from hdfe_spark.operators.stats import cramers_v

    # 3x3 with THREE never-observed cells: (a1,b2) (a2,b0) (a2,b1)
    pairs = (
        [("a0", "b0")] * 8
        + [("a0", "b1")] * 3
        + [("a0", "b2")] * 1
        + [("a1", "b0")] * 2
        + [("a1", "b1")] * 9
        + [("a2", "b2")] * 7
    )
    df = spark.createDataFrame(pairs, "a string, b string")
    row = cramers_v(df, "a", "b").collect()[0]
    chi2, v = _expected_cramers(pairs)
    assert row["n"] == len(pairs)
    assert row["r"] == 3 and row["c"] == 3
    assert row["chi2"] == pytest.approx(chi2, rel=1e-12)
    assert row["v"] == pytest.approx(v, rel=1e-12)
    # the old observed-cells-only sum would have been strictly
    # smaller — pin that the gap is material on this fixture
    from collections import Counter

    obs = Counter(pairs)
    rows_m = Counter(a for a, _ in pairs)
    cols_m = Counter(b for _, b in pairs)
    n = float(len(pairs))
    observed_only = sum(
        (c - rows_m[a] * cols_m[b] / n) ** 2 / (rows_m[a] * cols_m[b] / n)
        for (a, b), c in obs.items()
    )
    assert row["chi2"] > observed_only + 1.0


def test_cramers_v_dense_table_unchanged(spark):
    from hdfe_spark.operators.stats import cramers_v

    # fully-dense 2x2: densification is a no-op
    pairs = (
        [("x", "u")] * 5 + [("x", "v")] * 2
        + [("y", "u")] * 3 + [("y", "v")] * 6
    )
    df = spark.createDataFrame(pairs, "a string, b string")
    row = cramers_v(df, "a", "b").collect()[0]
    chi2, v = _expected_cramers(pairs)
    assert row["chi2"] == pytest.approx(chi2, rel=1e-12)
    assert row["v"] == pytest.approx(v, rel=1e-12)


def test_cramers_v_dense_grid_respects_max_cells(spark):
    from hdfe_spark.operators.stats import cramers_v

    # 3 observed cells but a 3x3 dense grid: max_cells bounds the
    # GRID, not just the observed cells
    pairs = [("a0", "b0")] * 2 + [("a1", "b1")] * 2 + [("a2", "b2")] * 2
    df = spark.createDataFrame(pairs, "a string, b string")
    with pytest.raises(ValueError, match="dense grid"):
        cramers_v(df, "a", "b", max_cells=8)


def test_spearman_by_den_from_exact_moments(spark):
    from hdfe_spark.operators.stats import spearman_by

    # behavior: exact rho on a mixed fixture (per-group closed form)
    rows = [
        ("g1", 1.0, 2.0), ("g1", 2.0, 4.0), ("g1", 3.0, 6.0),
        ("g1", 4.0, 5.0),
        ("g2", 1.0, 9.0), ("g2", 2.0, 7.0), ("g2", 3.0, 5.0),
        ("g3", 5.0, 1.0), ("g3", 5.0, 2.0),  # constant x -> NULL
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r["rho"] for r in spearman_by(df, "g", "x", "y").collect()}
    assert got["g1"] == pytest.approx(0.8, rel=1e-12)
    assert got["g2"] == pytest.approx(-1.0, rel=1e-12)
    assert got["g3"] is None
    # source pin: den's radicands are the EXACT decimal moments the
    # gate checks, not a separate double expression
    import inspect

    from hdfe_spark.operators import stats

    src = inspect.getsource(stats.spearman_by)
    assert 'F.sqrt(varx.cast("double") * vary.cast("double"))' in src


def test_cohen_kappa_empty_input_zero_counters(spark):
    from hdfe_spark.operators.ml import cohen_kappa

    empty = spark.createDataFrame([], "y long, p long")
    row = cohen_kappa(empty, "y", "p").collect()[0]
    assert (row["n"], row["agree"]) == (0, 0)
    assert row["po"] is None and row["pe"] is None
    assert row["kappa"] is None

    allnull = spark.createDataFrame([(None, None)], "y long, p long")
    row = cohen_kappa(allnull, "y", "p").collect()[0]
    assert (row["n"], row["agree"]) == (0, 0)
    assert row["po"] is None and row["pe"] is None
    assert row["kappa"] is None


def test_auc_by_boolean_label_convention_documented(spark):
    from hdfe_spark.operators.stats import auc_by, auc_score

    # behavior: nonzero labels (2, -1) count as positive — same
    # result as literal 1s
    rows = [("g", 2, 0.9), ("g", -1, 0.8), ("g", 0, 0.3), ("g", 0, 0.1)]
    df = spark.createDataFrame(rows, "g string, y long, s double")
    rows01 = [("g", 1, 0.9), ("g", 1, 0.8), ("g", 0, 0.3), ("g", 0, 0.1)]
    df01 = spark.createDataFrame(rows01, "g string, y long, s double")
    got = auc_by(df, "g", "y", "s").collect()[0]
    want = auc_by(df01, "g", "y", "s").collect()[0]
    assert (got["n_pos"], got["n_neg"]) == (2, 2)
    assert got["auc"] == want["auc"] == pytest.approx(1.0)
    # the convention is documented on BOTH docstrings
    assert "LABEL CONVENTION" in auc_by.__doc__
    assert "LABEL CONVENTION" in auc_score.__doc__
