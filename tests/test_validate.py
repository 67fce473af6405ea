"""Data-quality validation operators (`operators/validate.py`):
constraint checks, referential integrity, column profiling, MAD
outliers."""

import pyspark.sql.functions as F
import pytest

from hdfe_spark.operators.validate import (
    check_constraints,
    column_profile,
    mad_outliers,
    referential_integrity,
)
from hdfe_spark.plans.audit import plan_report


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", 12.0),
        (3, None, 11.0),
        (4, "b", -5.0),
        (5, "b", 200.0),
        (5, "c", 13.0),  # duplicate id
    ]
    return spark.createDataFrame(rows, "id bigint, cat string, v double")


def test_check_constraints_report(messy):
    rules = [
        {"kind": "completeness", "column": "cat", "min_fraction": 1.0},
        {"kind": "completeness", "column": "id"},
        {"kind": "uniqueness", "column": "id"},
        {"kind": "bounds", "column": "v", "lo": 0, "hi": 100,
         "min_fraction": 0.9},
        {"kind": "in_set", "column": "cat", "values": ["a", "b"],
         "min_fraction": 0.8},
        {"kind": "min_rows", "n": 3},
    ]
    rep = {r["constraint"]: r for r in
           (x.asDict() for x in check_constraints(messy, rules).collect())}
    assert not rep["completeness(cat)"]["passed"]  # 5/6
    assert rep["completeness(cat)"]["metric"] == pytest.approx(5 / 6)
    assert rep["completeness(id)"]["passed"]
    assert not rep["uniqueness(id)"]["passed"]  # 5 distinct / 6
    assert not rep["bounds(v)"]["passed"]  # 4/6 inside
    assert not rep["in_set(cat)"]["passed"]  # 4/6 in {a,b}
    assert rep["min_rows(>=3)"]["passed"]


def test_check_constraints_is_single_pass(messy):
    rules = [
        {"kind": "completeness", "column": "cat"},
        {"kind": "bounds", "column": "v", "lo": 0, "hi": 100},
        {"kind": "min_rows", "n": 1},
    ]
    rep = plan_report(check_constraints(messy, rules))
    # one 1-row final aggregation; no joins, no Python
    assert rep["n_python_stages"] == 0
    assert rep["n_broadcast_joins"] == 0
    assert rep["n_exchanges"] <= 1


def test_check_constraints_unknown_kind_raises(messy):
    with pytest.raises(ValueError, match="unknown constraint"):
        check_constraints(messy, [{"kind": "nope", "column": "id"}])


def test_referential_integrity_detects_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, None)],
        "row_id int, fk int",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk int")
    out = referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert out["n_child_keys"] == 3  # 10, 20, 99 (null excluded)
    assert out["n_orphan_keys"] == 1  # 99
    assert out["n_orphan_rows"] == 2  # rows 4 and 5
    assert not out["ok"]


def test_referential_integrity_clean(spark):
    child = spark.createDataFrame([(1, 10), (2, 20)], "row_id int, fk int")
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    out = referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert out["ok"] and out["n_orphan_rows"] == 0


def test_column_profile_values(messy):
    prof = {r["column"]: r.asDict()
            for r in column_profile(messy, ["id", "cat", "v"]).collect()}
    assert prof["id"]["n_rows"] == 6
    assert prof["id"]["n_nulls"] == 0
    assert prof["id"]["n_distinct"] == 5
    assert prof["cat"]["n_nulls"] == 1
    assert prof["cat"]["n_distinct"] == 3
    assert prof["cat"]["min_num"] is None  # string column
    assert prof["v"]["min_num"] == -5.0
    assert prof["v"]["max_num"] == 200.0


def test_column_profile_single_pass(messy):
    rep = plan_report(column_profile(messy, ["id", "cat", "v"]))
    assert rep["n_python_stages"] == 0
    assert rep["n_broadcast_joins"] == 0


def test_mad_outliers_flags_the_obvious(spark):
    # group g: tight cluster around 10 plus one wild value
    rows = [("g", float(v)) for v in [9, 10, 10, 10, 11, 500]]
    rows += [("h", float(v)) for v in [1, 2, 3, 4, 5]]
    df = spark.createDataFrame(rows, "k string, v double")
    out = mad_outliers(df, "k", "v", k=5.0).collect()
    assert [(r["k"], r["v"]) for r in out] == [("g", 500.0)]
    r = out[0]
    assert r["group_median"] == 10.0
    assert r["group_mad"] == 0.5
    assert r["deviation"] == 490.0


def test_mad_outliers_approx_path(spark):
    rows = [("g", float(v)) for v in range(100)] + [("g", 1e6)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = mad_outliers(df, "k", "v", k=10.0, accuracy=1000).collect()
    assert [(r["k"], r["v"]) for r in out] == [("g", 1e6)]


def test_mad_outliers_zero_mad_group(spark):
    # constant group: mad 0, every deviating row is an outlier
    rows = [("c", 5.0)] * 4 + [("c", 6.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = mad_outliers(df, "k", "v", k=3.0).collect()
    assert [(r["v"]) for r in out] == [6.0]


def test_streaming_constraints_equal_batch(spark, sf_dir):
    """The availableNow streaming replay of the rule set must produce
    exactly the batch report (counts are mergeable), and streaming
    uniqueness must degrade to the labeled HLL estimate instead of
    erroring."""
    from hdfe_spark.streaming.ops import (
        read_events_stream,
        streaming_constraint_metrics,
    )

    rules = [
        {"kind": "completeness", "column": "user_id"},
        {"kind": "bounds", "column": "value", "lo": 0.0, "hi": 1e9,
         "min_fraction": 0.5},
        {"kind": "min_rows", "n": 10},
    ]
    stream = read_events_stream(spark, sf_dir)
    q = (
        streaming_constraint_metrics(stream, rules)
        .writeStream.format("memory")
        .queryName("dq_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["constraint"]: r.asDict()
           for r in spark.table("dq_stream_test").collect()}
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {r["constraint"]: r.asDict()
            for r in check_constraints(batch, rules).collect()}
    assert got == want

    # uniqueness on a stream: no error, approx label
    u = streaming_constraint_metrics(
        stream, [{"kind": "uniqueness", "column": "event_id",
                  "min_fraction": 0.5}]
    )
    q2 = (
        u.writeStream.format("memory").queryName("dq_stream_uniq")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    rows = spark.table("dq_stream_uniq").collect()
    assert rows[0]["constraint"] == "uniqueness~approx(event_id)"
    assert rows[0]["metric"] > 0.9


def test_psi_no_drift_is_near_zero(spark):
    from hdfe_spark.operators.validate import psi_drift

    a = spark.range(10_000).select(
        (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("v")
    )
    out = psi_drift(a, a, "v", bins=10).collect()
    assert len(out) == 10
    total = sum(r["psi_term"] for r in out)
    assert abs(total) < 1e-12  # identical populations: PSI == 0
    assert all(r["n_a"] == r["n_b"] for r in out)


def test_psi_detects_shift(spark):
    from hdfe_spark.operators.validate import psi_drift

    a = spark.range(10_000).select(
        (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("v")
    )
    b = a.select((F.col("v") + 60.0).alias("v"))  # shift by ~60%
    out = psi_drift(a, b, "v", bins=10).collect()
    total = sum(r["psi_term"] for r in out)
    assert total > 0.2  # conventional drift threshold
    # shares are exact fractions summing to 1 on each side
    assert abs(sum(r["p_a"] for r in out) - 1.0) < 1e-12


def test_psi_empty_bin_laplace_floor(spark):
    from hdfe_spark.operators.validate import psi_drift

    a = spark.createDataFrame(
        [(float(v),) for v in range(100)], "v double"
    )
    b = spark.createDataFrame([(0.5,)] * 50, "v double")  # one bin only
    out = psi_drift(a, b, "v", bins=5).collect()
    import math

    assert all(math.isfinite(r["psi_term"]) for r in out)
    assert sum(r["n_b"] for r in out) == 50


def test_mahalanobis_flags_joint_outlier(spark):
    from hdfe_spark.operators.validate import mahalanobis_outliers

    # y ~ 2x cloud, plus one point that is inside BOTH marginal
    # ranges but off the correlation axis — invisible to per-column
    # checks, flagrant jointly.
    rows = [(float(i % 50), 2.0 * (i % 50) + (i % 7) * 0.1)
            for i in range(500)]
    rows.append((10.0, 80.0))  # x mid-range, y mid-range, wrong pair
    df = spark.createDataFrame(rows, "x double, y double")
    out = mahalanobis_outliers(df, ["x", "y"], threshold=13.8155).collect()
    assert (10.0, 80.0) in {(r["x"], r["y"]) for r in out}
    # the on-axis cloud stays unflagged
    assert len(out) <= 5


def test_mahalanobis_k1_rejected(spark):
    # k >= 3 is implemented since round 7 (exact moments + driver
    # inverse, tests/test_advice_r7.py); only k < 2 is rejected.
    from hdfe_spark.operators.validate import mahalanobis_outliers

    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "a double, b double, c double")
    import pytest as _pt

    with _pt.raises(ValueError, match=">= 2 columns"):
        mahalanobis_outliers(df, ["a"])


def test_benford_digit_audit(spark):
    import math

    from hdfe_spark.operators.validate import benford_digit_audit

    # 100 values with first digits 1..9 in a known pattern + noise rows
    rows = []
    for d in range(1, 10):
        for i in range(d * 3):
            rows.append((float(d) * 10 + i * 0.01,))
    rows += [(None,), (-5.0,), (0.0,)]  # excluded
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r for r in benford_digit_audit(df, "v").collect()}
    n_tot = sum(d * 3 for d in range(1, 10))
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        assert got[d]["n"] == d * 3
        p = math.log10(1 + 1 / d)
        assert got[d]["expected"] == pytest.approx(n_tot * p)
        assert got[d]["chi2_term"] == pytest.approx(
            (d * 3 - n_tot * p) ** 2 / (n_tot * p)
        )
