"""Bloom semi-join tests: no false negatives, useful selectivity,
exact-join equivalence, and the broadcast-only plan shape."""

import pyspark.sql.functions as F

from hdfe_spark.operators.bloom import bloom_bits, bloom_semi_join
from hdfe_spark.plans import plan_report


def test_bloom_no_false_negatives_and_selective(spark):
    build = spark.range(0, 500).selectExpr("id * 7 AS k")  # 0,7,...,3493
    probe = spark.range(0, 20000).selectExpr("id AS k", "id % 13 AS v")
    kept = bloom_semi_join(probe, build, "k", n_bits=1 << 16, n_hashes=5)
    kept_keys = {r.k for r in kept.select("k").collect()}
    true_keys = {r.k for r in build.collect()} & {
        r.k for r in probe.select("k").collect()
    }
    # every true match survives
    assert true_keys <= kept_keys
    # false-positive rate is small: kept is close to the true set
    assert len(kept_keys) <= len(true_keys) + 0.01 * 20000


def test_bloom_prefiltered_join_equals_plain_join(spark):
    build = spark.range(0, 300).selectExpr("id * 11 AS k", "id AS dim")
    probe = spark.range(0, 5000).selectExpr("id AS k", "(id % 97) AS v")
    pre = bloom_semi_join(probe, build, "k", n_bits=1 << 14)
    got = (
        pre.join(build, "k")
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum(F.col("v") * F.col("dim")).alias("s"))
        .collect()[0]
    )
    want = (
        probe.join(build, "k")
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum(F.col("v") * F.col("dim")).alias("s"))
        .collect()[0]
    )
    assert (got.n, got.s) == (want.n, want.s)


def test_bloom_plan_broadcast_only(spark):
    """The probe side must see only broadcast joins (one per hash) —
    a sort-merge join or probe-side exchange defeats the point."""
    build = spark.range(0, 100).selectExpr("id * 3 AS k")
    probe = spark.range(0, 10000).selectExpr("id AS k")
    rep = plan_report(bloom_semi_join(probe, build, "k", n_hashes=4))
    assert rep["n_sortmerge_joins"] == 0
    assert rep["n_broadcast_joins"] >= 4


def test_bloom_bits_table_is_small(spark):
    build = spark.range(0, 1000).selectExpr("id AS k")
    n = bloom_bits(build, "k", n_bits=1 << 16).count()
    assert n <= (1 << 16) // 64  # at most n_bits/64 words


def test_bloom_key_dtype_mismatch_raises(spark):
    """xxhash64(int 5) != xxhash64('5') while the follow-up equi-join
    would cast them equal — silent row loss. The guard must refuse."""
    import pytest

    build = spark.range(0, 10).selectExpr("CAST(id AS STRING) AS k")
    probe = spark.range(0, 100).selectExpr("id AS k")
    with pytest.raises(TypeError, match="dtype mismatch"):
        bloom_semi_join(probe, build, "k")
