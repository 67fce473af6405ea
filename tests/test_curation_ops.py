"""Round-5 curation operators: weighted sampling, version-resolution
dedup, char entropy."""

import math

import pyspark.sql.functions as F

from hdfe_spark.operators.dedup import latest_per_key
from hdfe_spark.operators.sampling import weighted_sample
from hdfe_spark.operators.text import char_entropy


def test_weighted_sample_deterministic_and_weighted(spark):
    df = spark.range(1, 2001).select(
        F.col("id").alias("doc_id"),
        # ids 1-100 get weight 1000, the rest weight 1
        F.when(F.col("id") <= 100, 1000).otherwise(1).alias("w"),
    )
    a = [r.doc_id for r in weighted_sample(df, "w", 50, id_col="doc_id").collect()]
    b = [r.doc_id for r in weighted_sample(df, "w", 50, id_col="doc_id").collect()]
    assert a == b  # same data -> same sample, always
    heavy = sum(1 for i in a if i <= 100)
    # 100 rows carry 1000x the weight of the other 1900: the sample
    # must be dominated by them (expected ~49.1 of 50).
    assert heavy >= 40


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3 - 1).alias("w")
    )
    got = weighted_sample(df, "w", 100, id_col="doc_id").collect()
    assert all(r.w > 0 for r in got)


def test_latest_per_key(spark):
    rows = [
        (1, "a", 10, 100),
        (1, "a", 11, 200),  # newer ts wins
        (1, "b", 12, 100),
        (2, "a", 13, 100),
        (2, "a", 14, 100),  # same ts: higher id wins
    ]
    df = spark.createDataFrame(rows, "k long, t string, eid long, ts long")
    got = {
        (r.k, r.t, r.eid)
        for r in latest_per_key(df, ["k", "t"], ["ts", "eid"]).collect()
    }
    assert got == {(1, "a", 11), (1, "b", 12), (2, "a", 14)}


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab ab"), (3, "   "), (4, "abcd")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_nonspace, r.entropy) for r in char_entropy(df).collect()}
    assert got[1] == (4, 0.0)  # single symbol: zero entropy
    assert got[2] == (4, round(math.log(2), 6))  # two equiprobable symbols
    assert 3 not in got  # whitespace-only doc has no distribution
    assert got[4] == (4, round(math.log(4), 6))  # four equiprobable


def test_semdedup_collapses_planted_duplicates(spark):
    """Planted exact-duplicate vectors must collapse to min-id reps;
    distant vectors must all survive."""
    import random

    rng = random.Random(7)
    rows = []
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(20)]
    for i, v in enumerate(base):
        rows.append((i, v))
    # ids 100..104 duplicate base[0..4] exactly -> 5 pairs to collapse
    for j in range(5):
        rows.append((100 + j, list(base[j])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from hdfe_spark.operators.dedup import semdedup, semdedup_pairs

    pairs = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(
            df, n_centroids=4, threshold=0.999999
        ).collect()
    }
    assert {(j, 100 + j) for j in range(5)} <= pairs
    kept = {r.vec_id for r in semdedup(df, n_centroids=4, threshold=0.999999).collect()}
    assert kept == set(range(20))  # min-id reps survive, clones drop
