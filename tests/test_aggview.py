"""Incremental aggregate-view maintenance (`sources/aggview.py`) and
Count-Min sketch (`operators/sketch.py::cms_build/cms_estimate`)."""

from pyspark.sql import functions as F

from hdfe_spark.operators.sketch import cms_build, cms_estimate
from hdfe_spark.sources.aggview import aggregate_view, refresh_agg

def MEASURES():
    return [
        ("cnt", "count", None),
        ("sum_v", "sum", F.col("v")),
        ("min_v", "min", F.col("v")),
        ("max_v", "max", F.col("v")),
    ]


def _collect(df):
    return {
        r.k: (r.cnt, r.sum_v, r.min_v, r.max_v)
        for r in df.collect()
    }


def test_refresh_equals_full_recompute(spark):
    base = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 2), ("c", 7)], ["k", "v"]
    )
    delta = spark.createDataFrame(
        [("a", 3), ("c", -1), ("d", 9)], ["k", "v"]
    )
    base_agg = aggregate_view(base, ["k"], MEASURES())
    got = _collect(refresh_agg(base_agg, delta, ["k"], MEASURES()))
    want = _collect(aggregate_view(base.unionAll(delta), ["k"], MEASURES()))
    assert got == want
    # new key appeared, untouched key passed through
    assert got["d"] == (1, 9, 9, 9)
    assert got["b"] == (1, 2, 2, 2)


def test_refresh_empty_delta_identity(spark):
    base = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    empty = spark.createDataFrame([], "k string, v bigint")
    base_agg = aggregate_view(base, ["k"], MEASURES())
    assert _collect(refresh_agg(base_agg, empty, ["k"], MEASURES())) == _collect(
        base_agg
    )


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    rows = [("hot",)] * 50 + [(f"k{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, ["k"]).repartition(4)
    cms = cms_build(df, "k", d=4, n_hex=2)
    keys = spark.createDataFrame([("hot",), ("k0",), ("absent",)], ["k"])
    est = {r.k: r.est for r in cms_estimate(cms, keys, "k", d=4, n_hex=2).collect()}
    assert est["hot"] >= 50
    assert est["k0"] >= 1
    # 90 items over 4x256 counters: collisions are rare; min-of-4
    # should be exact here for the hot key
    assert est["hot"] == 50
    assert est["absent"] >= 0


def test_cms_sketch_size_bounded(spark):
    rows = [(f"k{i}",) for i in range(5000)]
    df = spark.createDataFrame(rows, ["k"])
    cms = cms_build(df, "k", d=4, n_hex=2)
    assert cms.count() <= 4 * 256
    total = cms.groupBy("j").agg(F.sum("cnt").alias("s")).collect()
    assert all(r.s == 5000 for r in total)  # each row sees every item once
