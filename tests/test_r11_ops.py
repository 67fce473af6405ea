"""Round-11 operator tests: the retrieval-eval completion (MRR,
per-query average precision / MAP components, per-query P/R@k) —
exact-integer algebra (quantized reciprocals / lcm-denominator
precision sums / plain counters), hand-computed fixtures, label
guards, and the no-global-sort plan shape."""

import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.ml import avg_precision_by, mrr, recall_at_k_by


@pytest.fixture(scope="module")
def retrieval_df(spark):
    rows = [
        # q1: scores 9..5 -> relevant at ranks 2 and 4
        ("q1", 1, 9.0, 0), ("q1", 2, 8.0, 1), ("q1", 3, 7.0, 0),
        ("q1", 4, 6.0, 1), ("q1", 5, 5.0, 0),
        # q2: relevant at rank 1
        ("q2", 1, 3.0, 1), ("q2", 2, 2.0, 0),
        # q3: nothing relevant
        ("q3", 1, 1.0, 0),
    ]
    return spark.createDataFrame(rows, "q string, id long, s double, rel long")


def test_mrr_hand_computed(spark, retrieval_df):
    row = mrr(retrieval_df, "q", "id", "s", "rel", k=10).collect()[0]
    assert row["n_queries"] == 3 and row["n_hit"] == 2
    # rr(q1) = round(2^30/2), rr(q2) = 2^30; mean over 3 queries
    exp_sum = round((1 << 30) / 2) + (1 << 30)
    assert row["rr_sum_q"] == exp_sum
    assert row["mrr"] == pytest.approx(exp_sum / ((1 << 30) * 3), rel=1e-15)


def test_mrr_cutoff_and_empty(spark, retrieval_df):
    # k=1: only q2's rank-1 hit counts
    row = mrr(retrieval_df, "q", "id", "s", "rel", k=1).collect()[0]
    assert row["n_hit"] == 1 and row["rr_sum_q"] == (1 << 30)
    empty = spark.createDataFrame([], "q string, id long, s double, rel long")
    row = mrr(empty, "q", "id", "s", "rel").collect()[0]
    assert (row["n_queries"], row["n_hit"], row["rr_sum_q"]) == (0, 0, 0)
    assert row["mrr"] is None


def test_avg_precision_hand_computed(spark, retrieval_df):
    got = {
        r["q"]: (r["n_rel"], r["ap_num"], r["ap"])
        for r in avg_precision_by(retrieval_df, "q", "id", "s", "rel", k=10).collect()
    }
    # q1: P@2 = 1/2 and P@4 = 2/4; L = 2520 ->
    # ap_num = 1*1260 + 2*630 = 2520; ap = 2520/(2520*2) = 0.5
    assert got["q1"] == (2, 2520, 0.5)
    assert got["q2"] == (1, 2520, 1.0)
    assert got["q3"][0] == 0 and got["q3"][2] is None


def test_recall_at_k_hand_computed(spark, retrieval_df):
    got = {
        r["q"]: (r["n_hit"], r["precision"], r["recall"])
        for r in recall_at_k_by(retrieval_df, "q", "id", "s", "rel", k=3).collect()
    }
    assert got["q1"] == (1, pytest.approx(1 / 3), 0.5)
    assert got["q2"] == (1, pytest.approx(1 / 3), 1.0)
    assert got["q3"][0] == 0 and got["q3"][2] is None


def test_retrieval_trio_label_guard(spark, retrieval_df):
    bad = retrieval_df.withColumn("rel", F.col("rel") * 2)
    for op in (
        lambda d: mrr(d, "q", "id", "s", "rel"),
        lambda d: avg_precision_by(d, "q", "id", "s", "rel"),
        lambda d: recall_at_k_by(d, "q", "id", "s", "rel"),
    ):
        with pytest.raises(Exception, match="0|1|integral"):
            op(bad).collect()
    with pytest.raises(ValueError, match="k must be >= 1"):
        mrr(retrieval_df, "q", "id", "s", "rel", k=0)


def test_retrieval_trio_no_global_sort(spark, retrieval_df):
    # per-query ops: windows are query-partitioned, no
    # SinglePartition anywhere in the plan
    for op in (
        avg_precision_by(retrieval_df, "q", "id", "s", "rel"),
        recall_at_k_by(retrieval_df, "q", "id", "s", "rel"),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
    # mrr reduces to ONE summary row, so its final aggregate
    # legitimately fans partial aggregates into a SinglePartition
    # exchange (scalar-sized); what must NOT happen is a WINDOW on
    # a single partition (a data-sized global sort)
    plan = mrr(retrieval_df, "q", "id", "s", "rel")._jdf.queryExecution().executedPlan().toString()
    # every window spec is partitioned by the query column...
    specs = plan.count("windowspecdefinition(")
    assert specs >= 1
    assert specs == plan.count("windowspecdefinition(q#")
    # ...and the only SinglePartition exchanges are scalar fan-ins
    # (final 1-row aggregate + broadcast of the 1-row nq counter),
    # never a data-sized sort
    assert plan.count("Exchange SinglePartition") <= 2


def test_zscore_by_exact_and_null_conventions(spark):
    from hdfe_spark.operators.stats import zscore_by

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0),   # mean 2, sd 1
        ("b", 10.0), ("b", 10.0),             # constant -> NULL
        (None, 5.0), (None, 7.0),             # NULL group is a group
        ("c", 9.0),                           # singleton -> NULL
        ("a", None),                          # NULL value stays NULL
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = sorted(
        [(r["g"], r["v"], r["z"]) for r in zscore_by(df, "g", "v").collect()],
        key=lambda x: (str(x[0]), -1.0 if x[1] is None else x[1]),
    )
    za = [z for g, v, z in got if g == "a" and v is not None]
    assert [round(z, 12) for z in za] == [-1.0, 0.0, 1.0]
    assert all(z is None for g, v, z in got if g == "b")
    assert all(z is None for g, v, z in got if g == "c")
    assert [z for g, v, z in got if g == "a" and v is None] == [None]
    zn = sorted(z for g, v, z in got if g is None)
    import math

    sd = math.sqrt(2.0) * 1e6  # half-unit deviations at scale 1e6
    assert zn[0] == pytest.approx(-1e6 / sd, rel=1e-12)


def test_winsorize_by_clamps_to_group_percentiles(spark):
    from hdfe_spark.operators.stats import winsorize_by

    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize_by(df, "g", "v", 0.0, 0.5, out_col="w").collect()
    wa = sorted(r["w"] for r in out if r["g"] == "a")
    # p50 of 1..10 = 5.5 -> everything above clamps to 5.5
    assert wa == [1.0, 2.0, 3.0, 4.0, 5.0, 5.5, 5.5, 5.5, 5.5, 5.5]
    assert [r["w"] for r in out if r["g"] == "b"] == [100.0]
    with pytest.raises(ValueError, match="p_lo < p_hi"):
        winsorize_by(df, "g", "v", 0.9, 0.1)


def test_topk_by_rank_and_tiebreak(spark):
    from hdfe_spark.operators.groupby import topk_by

    rows = [("a", i, float(i % 7)) for i in range(20)]
    rows += [("b", i, float(i)) for i in range(2)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    got = {
        (r["g"], r["rank"]): (r["v"], r["i"])
        for r in topk_by(df, "g", ["v", "i"], k=3).collect()
    }
    # value 6.0 occurs at i = 6, 13; tiebreak i DESC puts 13 first
    assert got[("a", 1)] == (6.0, 13)
    assert got[("a", 2)] == (6.0, 6)
    assert got[("a", 3)] == (5.0, 19)
    # a group smaller than k yields all its rows
    assert got[("b", 1)] == (1.0, 1) and got[("b", 2)] == (0.0, 0)
    assert ("b", 3) not in got
    with pytest.raises(ValueError, match="k must be >= 1"):
        topk_by(df, "g", ["v"], k=0)


def test_welch_by_matches_global_and_thin_groups(spark):
    import random

    from hdfe_spark.operators.stats import welch_by, welch_ttest

    rng = random.Random(3)
    rows = []
    for g in ("s1", "s2"):
        rows += [(g, "A", round(rng.gauss(10, 2), 3)) for _ in range(30)]
        rows += [(g, "B", round(rng.gauss(11, 3), 3)) for _ in range(25)]
    rows += [("thin", "A", 1.0), ("thin", "B", 2.0), ("thin", "B", 3.0)]
    rows += [(None, "A", 1.0), (None, "A", 2.0), (None, "B", 5.0), (None, "B", 6.0)]
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    out = {r["g"]: r for r in welch_by(df, "g", "arm", "v", "A", "B").collect()}
    glob = welch_ttest(
        df.filter((df.g == "s1") & (df.arm == "A")),
        df.filter((df.g == "s1") & (df.arm == "B")),
        "v",
    ).collect()[0]
    for c in ("mean_a", "mean_b", "var_a", "var_b", "t_stat", "dof"):
        assert out["s1"][c] == pytest.approx(glob[c], rel=1e-9), c
    # thin arm (n_a = 1): moments reported, t/dof/var_a NULL
    thin = out["thin"]
    assert thin["n_a"] == 1 and thin["mean_a"] == 1.0
    assert thin["var_a"] is None and thin["t_stat"] is None
    # a NULL group is itself a group
    assert out[None]["t_stat"] is not None


def test_ks_by_matches_global_per_group(spark):
    import random

    from hdfe_spark.operators.stats import ks_2sample, ks_by

    rng = random.Random(5)
    rows = []
    for g, shift in (("s1", 0.0), ("s2", 2.0)):
        rows += [(g, "A", round(rng.gauss(0, 1), 2)) for _ in range(40)]
        rows += [(g, "B", round(rng.gauss(shift, 1), 2)) for _ in range(35)]
    rows += [("onesided", "A", 1.0)]
    df = spark.createDataFrame(rows, "g string, s string, v double")
    out = {r["g"]: r for r in ks_by(df, "g", "s", "v", "A", "B").collect()}
    for g in ("s1", "s2"):
        glob = ks_2sample(df.filter(df.g == g), "s", "v", "A", "B").collect()[0]
        r = out[g]
        assert (r["n_a"], r["n_b"], r["d_num"], r["d"]) == (
            glob["n_a"], glob["n_b"], glob["d_num"], glob["d"],
        ), g
    # a group missing one side reports counts and NULL d
    assert out["onesided"]["n_b"] == 0 and out["onesided"]["d"] is None
    # group-partitioned windows only: no SinglePartition
    plan = ks_by(df, "g", "s", "v", "A", "B")._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_chi2_gof_by_srm(spark):
    from hdfe_spark.operators.stats import chi2_gof_by

    rows = (
        [("e1", "A")] * 60 + [("e1", "B")] * 40
        + [("e2", "A")] * 50 + [("e2", "B")] * 50
    )
    df = spark.createDataFrame(rows, "g string, arm string")
    out = {
        r["g"]: r
        for r in chi2_gof_by(df, "g", "arm", {"A": 0.5, "B": 0.5}).collect()
    }
    # e1: exp 50/50, obs 60/40 -> chi2 = 100/50 + 100/50 = 4
    assert out["e1"]["chi2"] == 4.0 and out["e1"]["n"] == 100
    assert out["e2"]["chi2"] == 0.0 and out["e2"]["dof"] == 1
    assert out["e1"]["dof"] == 1
    # out-of-design category (incl. NULL) raises in-plan
    bad = df.union(spark.createDataFrame([("e1", "C")], "g string, arm string"))
    with pytest.raises(Exception, match="outside the design"):
        chi2_gof_by(bad, "g", "arm", {"A": 0.5, "B": 0.5}).collect()
    with pytest.raises(ValueError, match="sum to"):
        chi2_gof_by(df, "g", "arm", {"A": 0.5, "B": 0.4})
    with pytest.raises(ValueError, match="> 0"):
        chi2_gof_by(df, "g", "arm", {"A": 1.5, "B": -0.5})


def test_new_per_group_plans_have_no_single_partition(spark):
    from hdfe_spark.operators.stats import chi2_gof_by, welch_by, zscore_by

    rows = [("g1", "A", 1.0), ("g1", "B", 2.0), ("g2", "A", 3.0)]
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    for op in (
        welch_by(df, "g", "arm", "v", "A", "B"),
        zscore_by(df, "g", "v"),
        chi2_gof_by(df, "g", "arm", {"A": 0.5, "B": 0.5}),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


def test_chi2_gof_by_reserved_group_name_raises(spark):
    from hdfe_spark.operators.stats import chi2_gof_by

    df = spark.createDataFrame([("e1", "A")], "n string, arm string")
    with pytest.raises(ValueError, match="collides with a fixed output"):
        chi2_gof_by(df, "n", "arm", {"A": 1.0})


def test_grouped_quantiles_approx_and_certificate(spark):
    """Round-12 pre-build: per-group sketch quantiles + the per-group
    GK-bound certificate (registration deferred to the r12 window)."""
    import random

    from hdfe_spark.operators.rank import (
        grouped_quantiles_approx,
        grouped_quantiles_approx_certificate,
    )

    rng = random.Random(9)
    rows = [(g, rng.uniform(0, 100)) for g in ("a", "b") for _ in range(3000)]
    rows += [(None, float(v)) for v in range(100)]  # NULL group is a group
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in grouped_quantiles_approx(df, "g", "v", (0.25, 0.5, 0.9)).collect()
    }
    assert out["a"]["n"] == 3000 and abs(out["a"]["q1"] - 50.0) < 5.0
    assert out[None]["n"] == 100
    cert = grouped_quantiles_approx_certificate(
        df, "g", "v", (0.25, 0.5, 0.9)
    ).collect()
    assert len(cert) == 3 and all(r["within_bound"] for r in cert)
    with pytest.raises(ValueError, match="probs"):
        grouped_quantiles_approx(df, "g", "v", (1.5,))
