"""Pins for the four round-12 ADVICE items.

1. `winsorize_by` (and the other `F.expr` sites) backtick-quote the
   interpolated column name, so non-identifier names (spaces,
   hyphens, reserved words) work like the F.col discipline.
2. `grouped_quantiles_approx`'s docstring claim about its registered
   certificate is made true by the round-12 registration (checked in
   test_registry.py, not here).
3. The chi2_gof_by output-collision guard is factored into
   `_guards.no_output_collision` and applied across the grouped
   family (welch_by, ks_by, ndcg_by, avg_precision_by,
   recall_at_k_by, grouped_quantiles_approx[_certificate]) plus the
   `no_inplace_overwrite` transform variant (zscore_by,
   winsorize_by).
4. `_blocked_series` / `exact_ntile` reuse the total the rank
   phase's offset collection already computed — no second count job.
"""

import inspect

import pytest

from hdfe_spark.operators._guards import (
    no_inplace_overwrite,
    no_output_collision,
    quote_ident,
)


def test_quote_ident_escapes_backticks():
    assert quote_ident("plain") == "`plain`"
    assert quote_ident("has space") == "`has space`"
    assert quote_ident("weird`tick") == "`weird``tick`"


def test_winsorize_by_non_identifier_value_col(spark):
    # item 1: a hyphenated column name must parse (raw interpolation
    # into percentile(...) used to break or misparse)
    from hdfe_spark.operators.stats import winsorize_by

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 21)], ["g", "the-value"]
    )
    out = winsorize_by(df, "g", "the-value", 0.05, 0.95).collect()
    assert len(out) == 20
    ws = sorted(r["w"] for r in out)
    # clamped extremes: min/max pulled inside the raw range
    assert ws[0] > 1.0 and ws[-1] < 20.0


def test_mad_outliers_non_identifier_value_col(spark):
    from hdfe_spark.operators.validate import mad_outliers

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 20)] + [("a", 1000.0)],
        ["k", "v col"],
    )
    out = mad_outliers(df, "k", "v col", k=3.5).collect()
    assert [r["v col"] for r in out] == [1000.0]


def test_collision_guard_family(spark):
    # item 3: every grouped operator that re-emits the caller's
    # group/query column rejects a name shadowing a fixed output
    from hdfe_spark.operators.ml import (
        avg_precision_by,
        ndcg_by,
        recall_at_k_by,
    )
    from hdfe_spark.operators.rank import (
        grouped_quantiles_approx,
        grouped_quantiles_approx_certificate,
    )
    from hdfe_spark.operators.stats import ks_by, welch_by

    two = spark.createDataFrame(
        [("g1", "A", 1.0), ("g1", "B", 2.0)], ["n_a", "arm", "v"]
    )
    with pytest.raises(ValueError, match="collides with a fixed"):
        welch_by(two, "n_a", "arm", "v", "A", "B")
    with pytest.raises(ValueError, match="collides with a fixed"):
        ks_by(two, "n_a", "arm", "v", "A", "B")

    ret = spark.createDataFrame(
        [("q1", "d1", 0.9, 1)], ["n_rel", "id", "score", "rel"]
    )
    with pytest.raises(ValueError, match="collides with a fixed"):
        avg_precision_by(ret, "n_rel", "id", "score", "rel", k=5)
    with pytest.raises(ValueError, match="collides with a fixed"):
        recall_at_k_by(ret, "n_rel", "id", "score", "rel", k=5)
    ndcg_in = ret.withColumnRenamed("n_rel", "ndcg")
    with pytest.raises(ValueError, match="collides with a fixed"):
        ndcg_by(ndcg_in, "ndcg", "id", "score", "rel", k=5)

    gq = spark.createDataFrame([("n", 1.0)], ["n", "v"])
    with pytest.raises(ValueError, match="collides with a fixed"):
        grouped_quantiles_approx(gq, "n", "v")
    with pytest.raises(ValueError, match="collides with a fixed"):
        grouped_quantiles_approx_certificate(gq, "n", "v")


def test_transform_overwrite_guard(spark):
    from hdfe_spark.operators.stats import winsorize_by, zscore_by

    df = spark.createDataFrame(
        [("a", 1.0, 9.9), ("a", 2.0, 9.9)], ["g", "v", "z"]
    )
    with pytest.raises(ValueError, match="already exists in the input"):
        zscore_by(df, "g", "v", out_col="z")
    with pytest.raises(ValueError, match="already exists in the input"):
        winsorize_by(df, "g", "v", out_col="z")
    # a fresh out_col still works and keeps the caller's column
    out = zscore_by(df, "g", "v", out_col="z2")
    assert {"z", "z2"} <= set(out.columns)


def test_no_output_collision_passthrough():
    # non-colliding names are silently accepted
    no_output_collision("op", "group_col", "segment", ("n", "t_stat"))
    no_inplace_overwrite("op", "fresh", ["a", "b"])


def test_global_rank_with_total_exact(spark):
    from hdfe_spark.operators.rank import (
        global_rank,
        global_rank_with_total,
    )

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(500)], ["id", "grp"]
    ).repartition(8)
    ranked, total = global_rank_with_total(df, ["id"], rank_col="r")
    assert total == 500
    rs = sorted(r["r"] for r in ranked.collect())
    assert rs == list(range(1, 501))
    # the wrapper stays behaviour-identical
    rs2 = sorted(
        r["r"] for r in global_rank(df, ["id"], rank_col="r").collect()
    )
    assert rs2 == rs


def test_blocked_series_fence_and_ntile_no_count():
    # item 4, RESOLVED WITH A MEASUREMENT (SCALE.md r12): the naive
    # fix — drop ranked.count() and reuse the rank phase's offset
    # total — OOMs the 100M/one-key fold stage on a 16 GiB heap;
    # with the count pass the same plan passes in ~133 s. So
    # _blocked_series keeps the count as a documented
    # MATERIALIZATION FENCE, now reconciled against the free offset
    # total (an integrity check the old code didn't have), while
    # exact_ntile (light downstream, no fold) genuinely drops its
    # second count job.
    from hdfe_spark.operators import stats

    src = inspect.getsource(stats._blocked_series)
    assert "global_rank_with_total" in src
    assert "fence_total = ranked.count()" in src
    assert "fence_total != n_total" in src

    from hdfe_spark.operators import rank

    src2 = inspect.getsource(rank.exact_ntile)
    assert "global_rank_with_total" in src2
    assert ".count()" not in src2
