"""Exactness tests for the Misra-Gries heavy-hitter operator
(`operators/sketch.py`) and the triangle counter
(`operators/graph.py::triangle_count`)."""

import random

from pyspark.sql import functions as F

from hdfe_spark.operators.graph import triangle_count
from hdfe_spark.operators.sketch import heavy_hitters, misra_gries_candidates


def _truth(rows, s):
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    return {k: v for k, v in c.items() if v * s >= n}


def test_heavy_hitters_exact_on_skewed_multipartition(spark):
    rng = random.Random(7)
    # Zipf-ish: a few hot keys + a long tail, shuffled across 8 partitions
    rows = (
        ["hot_a"] * 4000
        + ["hot_b"] * 1500
        + ["warm"] * 400
        + [f"tail_{rng.randrange(5000)}" for _ in range(14100)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame([(r,) for r in rows], ["k"]).repartition(8)
    for s in (10, 50, 200):
        got = {r.k: r.cnt for r in heavy_hitters(df, "k", s).collect()}
        assert got == _truth(rows, s), s


def test_heavy_hitters_boundary_key_exactly_at_threshold(spark):
    # n = 100, s = 10: a key with exactly 10 occurrences qualifies
    rows = ["edge"] * 10 + [f"u{i}" for i in range(90)]
    df = spark.createDataFrame([(r,) for r in rows], ["k"]).repartition(4)
    got = {r.k: r.cnt for r in heavy_hitters(df, "k", 10).collect()}
    assert got == {"edge": 10}


def test_misra_gries_candidates_never_miss_qualifying_key(spark):
    rows = ["big"] * 300 + [f"t{i % 700}" for i in range(2700)]
    df = spark.createDataFrame([(r,) for r in rows], ["k"]).repartition(6)
    cand = {r.k for r in misra_gries_candidates(df, "k", k=10).collect()}
    # every key with cnt*10 >= n must be a candidate
    for k in _truth(rows, 10):
        assert k in cand


def _tri(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    return triangle_count(df).collect()[0].n_triangles


def test_triangle_count_known_graphs(spark):
    assert _tri(spark, [(1, 2), (2, 3), (1, 3)]) == 1
    # square without diagonal: 0; with one diagonal: 2
    sq = [(1, 2), (2, 3), (3, 4), (4, 1)]
    assert _tri(spark, sq) == 0
    assert _tri(spark, sq + [(1, 3)]) == 2
    # star K1,4 has no triangle
    assert _tri(spark, [(0, i) for i in range(1, 5)]) == 0
    # complete K5: C(5,3) = 10, regardless of input orientation/dups
    import itertools

    k5 = [(b, a) for a, b in itertools.combinations(range(5), 2)]
    assert _tri(spark, k5 + [(0, 1), (1, 0)]) == 10


def test_triangle_count_ignores_self_loops(spark):
    assert _tri(spark, [(1, 1), (1, 2), (2, 3), (1, 3), (2, 2)]) == 1


# ------------------------------------------------- hll_distinct


def test_hll_matches_python_replica(spark):
    import hashlib

    from hdfe_spark.operators.sketch import hll_distinct

    rows = [(i % 3777,) for i in range(20000)]
    df = spark.createDataFrame(rows, "k long")
    r = hll_distinct(df, "k", b=8).collect()[0]

    M = {}
    for k in set(x for (x,) in rows):
        h = hashlib.md5(str(k).encode()).hexdigest()
        bkt = int(h[:2], 16)
        v = int(h[2:10], 16)
        rho = 33 if v == 0 else 33 - v.bit_length()
        M[bkt] = max(M.get(bkt, 0), rho)
    s33 = sum(1 << (33 - mx) for mx in M.values()) + (256 - len(M)) * (
        1 << 33
    )
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    est = (alpha * 256.0 * 256.0 * 8589934592.0) / float(s33)
    # bit-exact: integer denominator, one shared IEEE expression
    assert r["s33"] == s33 and r["est"] == est
    assert r["n_exact"] == 3777 and r["m"] == 256
    assert abs(r["rel_err"]) < 0.2


def test_hll_small_and_empty_buckets(spark):
    from hdfe_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    r = hll_distinct(df, "k", b=8).collect()[0]
    assert r["n_exact"] == 2 and r["n_empty"] == 254
    assert r["s33"] > 254 * (1 << 33)


def test_hll_rejects_bad_b(spark):
    import pytest as _pytest

    from hdfe_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError):
        hll_distinct(df, "k", b=6)
    with _pytest.raises(ValueError):
        hll_distinct(df, "k", b=20)
