"""Round-6 stress, fourth batch: the stats/ML family at 20M rows.

1. `nonparam`: 20M-row two-sample with heavy ties (values quantized
   to 1e4 distinct levels) — Mann-Whitney U and two-sample KS must
   reduce the 20M rows to a 1e4-cell distinct-value table before any
   windowing (the prefix sums run over cells, never rows), and the
   exact statistics must match a numpy replica computed from the
   same cell counts.

2. `moments`: Welch t-test + ridge + standardize over 20M rows —
   each is ONE aggregation scan (wall ~ scan time); standardize's
   projection adds a second scan. Cross-checked against numpy on
   the generating parameters (loose tolerance: the data is random).

3. `kmeans`: 20M points, k=8, 5 iterations — per-iteration wall
   must be flat (each iteration is one map-side-combined groupBy of
   k*(d+1) partials, no point shuffle), and planted well-separated
   blobs must be recovered exactly.

4. `encode`: target_encode_loo over 20M rows x 100k categories —
   the category table stays broadcastable, the encode is one join +
   projection; planted singleton categories land exactly on the
   prior mean.

Usage: python tools/stress_r6d.py [nonparam|moments|kmeans|encode]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20_000_000


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r6d")


def _base(spark, n=N, parts=64):
    from pyspark.sql import functions as F

    return spark.range(0, n, 1, parts).select(
        F.col("id"),
        (F.col("id") % 2 == 0).alias("is_a"),
        # heavy ties: 1e4 distinct quantized values; side b shifted
        (
            F.floor(F.abs(F.hash(F.col("id"), F.lit(1))) % 10_000)
            + F.when(F.col("id") % 2 == 0, 0).otherwise(120)
        ).cast("double").alias("v"),
    )


def stress_nonparam():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import ks_2sample, mann_whitney_u

    spark = _spark()
    df = _base(spark).withColumn(
        "side", F.when(F.col("is_a"), "a").otherwise("b")
    )
    df = df.persist()
    n = df.count()
    print(f"rows: {n}")

    t0 = time.perf_counter()
    mw = mann_whitney_u(df, "side", "v", "a", "b").collect()[0]
    t_mw = time.perf_counter() - t0
    t0 = time.perf_counter()
    ks = ks_2sample(df, "side", "v", "a", "b").collect()[0]
    t_ks = time.perf_counter() - t0
    print(f"mann_whitney: {t_mw:.1f}s z={mw['z']:.3f} "
          f"u_a={mw['u_a']:.0f}")
    print(f"ks_2sample:   {t_ks:.1f}s d={ks['d']:.6f} "
          f"d_num={ks['d_num']}")

    # numpy replica from the same cell counts (exact, fits driver)
    pdf = (
        df.groupBy("v")
        .agg(
            F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias("cb"),
        )
        .toPandas()
        .sort_values("v")
    )
    ca, cb = pdf["ca"].to_numpy(np.int64), pdf["cb"].to_numpy(np.int64)
    na, nb = int(ca.sum()), int(cb.sum())
    c = ca + cb
    before = np.concatenate([[0], np.cumsum(c)[:-1]])
    ra2 = int((ca * (2 * before + c + 1)).sum())
    ua = ra2 / 2.0 - na * (na + 1) / 2.0
    assert ua == mw["u_a"], (ua, mw["u_a"])
    dnum = int(np.abs(np.cumsum(ca) * nb - np.cumsum(cb) * na).max())
    assert dnum == ks["d_num"], (dnum, ks["d_num"])
    print("exactness vs numpy replica: OK")


def stress_moments():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import (
        ridge2,
        standardize,
        welch_ttest,
    )

    spark = _spark()
    df = _base(spark).persist()
    df.count()

    a = df.filter(F.col("is_a"))
    b = df.filter(~F.col("is_a"))
    t0 = time.perf_counter()
    tt = welch_ttest(a, b, "v").collect()[0]
    t_tt = time.perf_counter() - t0
    # planted shift is 120 on a ~uniform(0, 1e4): t must be hugely neg
    print(f"welch_ttest: {t_tt:.1f}s t={tt['t_stat']:.1f} "
          f"dmean={tt['mean_b'] - tt['mean_a']:.2f}")
    assert tt["t_stat"] < -50 and 110 < tt["mean_b"] - tt["mean_a"] < 130

    xdf = df.select(
        "v",
        (F.col("v") * 0.5 + (F.col("id") % 97).cast("double")).alias("x2"),
        (F.col("v") * 2.0 + (F.col("id") % 31).cast("double")).alias("y"),
    )
    t0 = time.perf_counter()
    r = ridge2(xdf, ["v", "x2"], "y", 1.0).collect()[0]
    t_r = time.perf_counter() - t0
    print(f"ridge2: {t_r:.1f}s b_v={r['b_v']:.4f} b_x2={r['b_x2']:.4f}")
    assert abs(r["b_v"] - 2.0) < 0.05  # y = 2v + noise-ish

    t0 = time.perf_counter()
    z = standardize(df, ["v"])
    stats = z.agg(
        F.count(F.lit(1)), F.min("v_z"), F.max("v_z")
    ).collect()[0]
    t_z = time.perf_counter() - t0
    print(f"standardize: {t_z:.1f}s range=({stats[1]:.2f},{stats[2]:.2f})")
    df.unpersist()


def stress_kmeans():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.cluster import kmeans_fixed

    spark = _spark()
    # 8 well-separated blobs on a grid, 2.5M points each
    pts = spark.range(0, N, 1, 64).select(
        F.col("id"),
        ((F.col("id") % 8) % 4 * 100
         + (F.abs(F.hash(F.col("id"), F.lit(7))) % 1000) / 100.0
         ).cast("double").alias("x"),
        (F.floor((F.col("id") % 8) / 4) * 100
         + (F.abs(F.hash(F.col("id"), F.lit(11))) % 1000) / 100.0
         ).cast("double").alias("y"),
    ).persist()
    pts.count()
    t0 = time.perf_counter()
    assigned, cents = kmeans_fixed(
        pts, ["x", "y"], k=8, n_iter=5, order_cols=["id"]
    )
    counts = assigned.groupBy("cluster").count().collect()
    dt = time.perf_counter() - t0
    print(f"kmeans 20M x k=8 x 5 iters: {dt:.1f}s "
          f"({dt / 5:.1f}s/iter incl final assign)")
    sizes = sorted(r["count"] for r in counts)
    print("cluster sizes:", sizes)
    # every blob is 2.5M points; recovered clusters must match blobs
    assert sizes == [2_500_000] * 8, sizes
    # centroids sit at grid + ~5 offset (blob offsets are ~U[0,10))
    want = [(gx * 100 + 5.0, gy * 100 + 5.0)
            for gx in range(4) for gy in range(2)]
    for cx, cy in cents:
        assert any(
            abs(cx - wx) < 1.5 and abs(cy - wy) < 1.5 for wx, wy in want
        ), (cx, cy)
    print("blob recovery: OK")
    pts.unpersist()


def stress_encode():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.encoding import target_encode_loo

    spark = _spark()
    # 100k categories; categories 0..9 are singletons (planted)
    df = spark.range(0, N, 1, 64).select(
        F.col("id"),
        F.when(F.col("id") < 10, F.col("id"))
        .otherwise(10 + F.abs(F.hash(F.col("id"))) % 100_000)
        .cast("string").alias("cat"),
        ((F.col("id") % 1000) / 10.0).alias("y"),
    ).persist()
    df.count()
    t0 = time.perf_counter()
    out = target_encode_loo(df, "cat", "y", prior_weight=20.0)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cat_te"), F.max("cat_te"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(f"target_encode 20M x 100k cats: {dt:.1f}s "
          f"te range=({agg[1]:.3f},{agg[2]:.3f})")
    # singletons land exactly on the prior mean
    mu = df.agg(F.avg("y")).collect()[0][0]
    singles = out.filter(F.col("id") < 10).select("cat_te").collect()
    for r in singles:
        assert abs(r["cat_te"] - mu) < 1e-6, (r, mu)
    print(f"singleton -> prior ({mu:.4f}): OK")
    df.unpersist()


def stress_rolling():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import kfold_ols, rolling_beta

    spark = _spark()
    # 20M rows, 200k keys x 100 rows each
    df = spark.range(0, N, 1, 64).select(
        F.col("id"),
        (F.col("id") % 200_000).alias("k"),
        (F.col("id") / 200_000).cast("double").alias("x"),
        ((F.col("id") / 200_000) * 2.0
         + (F.abs(F.hash(F.col("id"))) % 100) / 100.0
         ).cast("double").alias("y"),
    ).persist()
    df.count()
    t0 = time.perf_counter()
    out = rolling_beta(df, "k", "id", "x", "y", window=20)
    n = out.filter(F.col("beta").isNotNull()).count()
    t_rb = time.perf_counter() - t0
    print(f"rolling_beta 20M x 200k keys, w=20: {t_rb:.1f}s "
          f"non-null={n}")

    t0 = time.perf_counter()
    cv = kfold_ols(df, ["id"], "x", "y").collect()
    t_cv = time.perf_counter() - t0
    b1s = [r["b1"] for r in cv]
    print(f"kfold_ols 20M: {t_cv:.1f}s b1 range="
          f"({min(b1s):.5f},{max(b1s):.5f})")
    assert all(abs(b - 2.0) < 0.01 for b in b1s), b1s
    df.unpersist()


def stress_radius():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.rangejoin import radius_join

    spark = _spark()

    def pts(n, salt, parts=64):
        return spark.range(0, n, 1, parts).select(
            F.col("id"),
            (F.abs(F.hash(F.col("id"), F.lit(salt))) % 1_000_000
             ).cast("long").alias("x"),
            (F.abs(F.hash(F.col("id"), F.lit(salt + 1))) % 1_000_000
             ).cast("long").alias("y"),
        )

    small = pts(200_000, 3).persist()
    big = pts(N, 7).persist()
    small.count(), big.count()
    t0 = time.perf_counter()
    # explode the SMALL side (the operator 9x-explodes `left`)
    n_pairs = radius_join(small, big, "x", "y", 500).count()
    dt = time.perf_counter() - t0
    # expected pairs ~ |S||B| * pi r^2 / area
    want = 200_000 * N * 3.141592653589793 * 500 * 500 / 1e12
    print(f"radius_join 200k x 20M, r=500: {dt:.1f}s pairs={n_pairs} "
          f"(expected ~{want:.0f})")
    assert 0.8 * want < n_pairs < 1.2 * want
    small.unpersist(); big.unpersist()


def stress_containment():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.dedup import containment_pairs

    spark = _spark()
    n_docs = 200_000
    # 20 pseudo-words of ~9 digits each (~200 chars/doc). Shingles
    # must be LONGER than for natural text: digit-alphabet 5-grams
    # have only ~1e5 distinct values (first attempt: the self-join
    # exploded to ~1e10 rows on those hot keys) — 12-grams give a
    # 1e12 space, the quasi-unique regime where exact containment
    # joins are tractable; natural-language corpora need a MinHash/
    # LSH candidate stage upstream (documented in the operator).
    words = [
        F.abs(F.hash(F.col("id"), F.lit(j))).cast("string")
        for j in range(20)
    ]
    base = spark.range(0, n_docs, 1, 64).select(
        F.col("id"), F.concat_ws(" ", *words).alias("text")
    )
    # plant: every 100th doc's text is embedded as the PREFIX of the
    # next doc's text -> containment(planted -> host) = 1.0
    host = F.col("id") % 100 == 1
    prev_words = [
        F.abs(F.hash(F.col("id") - 1, F.lit(j))).cast("string")
        for j in range(10)
    ]
    docs = base.withColumn(
        "text",
        F.when(host, F.concat_ws(" ", *prev_words, F.col("text")))
        .otherwise(F.col("text")),
    ).withColumn(
        "text",
        F.when(F.col("id") % 100 == 0,
               F.concat_ws(" ", *[
                   F.abs(F.hash(F.col("id"), F.lit(j))).cast("string")
                   for j in range(10)
               ]))
        .otherwise(F.col("text")),
    ).persist()
    docs.count()
    t0 = time.perf_counter()
    pairs = containment_pairs(
        docs, "text", "id", shingle_k=12, threshold=0.9
    ).persist()
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    planted = pairs.filter(
        (F.col("id_a") % 100 == 0) & (F.col("id_b") == F.col("id_a") + 1)
    ).count()
    print(f"containment 200k docs (~200 chars): {dt:.1f}s "
          f"pairs(C>=0.9)={n_pairs} planted_recovered={planted}/2000")
    assert planted == 2000, planted
    pairs.unpersist(); docs.unpersist()


def stress_hardneg():
    import numpy as np
    from pyspark.sql import functions as F

    from hdfe_spark.operators.similarity import hard_negatives

    spark = _spark()
    # 1M 32-dim vectors (deterministic hash features), 100 anchors
    n, d = 1_000_000, 32
    cols = [
        ((F.abs(F.hash(F.col("id"), F.lit(j))) % 1000) / 500.0 - 1.0
         ).alias(f"c{j}")
        for j in range(d)
    ]
    emb = spark.range(0, n, 1, 64).select(F.col("id").alias("vec_id"), *cols)
    emb = emb.select(
        "vec_id",
        F.array(*[F.col(f"c{j}") for j in range(d)]).alias("embedding"),
    ).persist()
    emb.count()
    anchors = emb.filter(F.col("vec_id") < 100).withColumnRenamed(
        "vec_id", "query_id"
    )
    t0 = time.perf_counter()
    out = hard_negatives(emb, anchors, k=10, lo=0.5, hi=0.95)
    rows = out.collect()
    dt = time.perf_counter() - t0
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["cosine"])
    n_full = sum(1 for v in per_q.values() if len(v) == 10)
    assert all(0.5 <= c < 0.95 for v in per_q.values() for c in v)
    print(f"hard_negatives 1M x 100 anchors, k=10, band [0.5,0.95): "
          f"{dt:.1f}s anchors_with_full_k={n_full}/100")


if __name__ == "__main__":
    {
        "nonparam": stress_nonparam,
        "moments": stress_moments,
        "kmeans": stress_kmeans,
        "encode": stress_encode,
        "rolling": stress_rolling,
        "radius": stress_radius,
        "containment": stress_containment,
        "hardneg": stress_hardneg,
    }[sys.argv[1]]()
