"""Round-7 stress: the model-eval certificate queries that lacked
SCALE.md rows (VERDICT item 8) plus the round-7 operator batch.

1. `survival`: Kaplan-Meier over 20M subjects with 3,000 distinct
   integral durations — the per-duration cell reduction must bound
   the driver collect at |durations| cells (guarded by max_cells),
   and the product-limit curve must match a numpy replica from the
   same cells.

2. `evalpair`: exact AUC + decile calibration over 20M scored rows
   (scores quantized to 1e5 levels so the rank path reduces to
   cells) — AUC must match the numpy rank-sum replica exactly;
   calibration must produce 10 exact-NTILE tiles of 2M rows each.

3. `r7stats`: one-way ANOVA + Brown-Forsythe + PCA2 + lag-1
   autocorrelation + CUSUM at 20M rows — each reduces to one or two
   aggregation scans (ANOVA/BF collect k group cells; autocorr is
   one partitioned window + one groupBy; CUSUM folds per key).
   ANOVA/PCA cross-checked against the generating parameters.

4. `scrub`: scrub_duplicate_spans over 1M synthetic docs (~40
   tokens each, 5% carrying a planted shared 8-gram) — linear
   gram-keyed work; every planted span must vanish and untouched
   docs must survive byte-identical.

Usage: python tools/stress_r7.py [survival|evalpair|r7stats|scrub]
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

    return get_spark(app_name="stress_r7")


def stress_survival():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import kaplan_meier

    spark = _spark()
    subj = spark.range(0, N, 1, 64).select(
        (F.abs(F.hash(F.col("id"), F.lit(7))) % 3000).alias("t"),
        (F.col("id") % 5 != 0).alias("ev"),  # 20% censored
    )
    t0 = time.time()
    rows = kaplan_meier(subj, "t", "ev", max_cells=10_000).collect()
    wall = time.time() - t0
    # numpy replica from independently-computed cells
    pdf = subj.groupBy("t").agg(
        F.sum(F.col("ev").cast("long")).alias("d"),
        F.sum((~F.col("ev")).cast("long")).alias("c"),
    ).toPandas().sort_values("t")
    n_risk = int(pdf["d"].sum() + pdf["c"].sum())
    s = 1.0
    exp = {}
    for _, r in pdf.iterrows():
        s = s * (1.0 - int(r["d"]) / n_risk)
        exp[int(r["t"])] = (n_risk, s)
        n_risk -= int(r["d"]) + int(r["c"])
    got = {int(r["t"]): (r["n_risk"], r["s"]) for r in rows}
    assert len(rows) == 3000
    for t in exp:
        assert got[t][0] == exp[t][0]
        assert got[t][1] == exp[t][1]  # identical op sequence
    print(f"survival: 20M subjects, 3000 durations, wall={wall:.1f}s")


def stress_evalpair():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.rank import exact_ntile
    from hdfe_spark.operators.stats import auc_score

    spark = _spark()
    # label ~ Bernoulli(sigmoid-ish of score): positives get higher
    # quantized scores on average
    df = spark.range(0, N, 1, 64).select(
        F.col("id"),
        (F.abs(F.hash(F.col("id"), F.lit(3))) % 100_000).alias("s_raw"),
        (F.abs(F.hash(F.col("id"), F.lit(9))) % 100_000).alias("noise"),
    ).select(
        "id",
        (F.col("s_raw").cast("double") / 1e5).alias("score"),
        ((F.col("s_raw") + F.col("noise")) > 120_000).alias("label"),
    )
    t0 = time.time()
    got = auc_score(df, "label", "score").collect()[0]
    wall_auc = time.time() - t0
    # numpy replica over the 1e5-cell distinct table
    cells = df.groupBy("score").agg(
        F.sum(F.col("label").cast("long")).alias("p"),
        F.count(F.lit(1)).alias("n"),
    ).toPandas().sort_values("score")
    p = cells["p"].to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    neg = n - p
    cum_neg = np.concatenate([[0], np.cumsum(neg)[:-1]])
    # rank-sum with average ties: each cell's positives see all
    # lower negatives + half the tied negatives
    u2 = 2 * (p * cum_neg).sum() + (p * neg).sum()  # 2*U to stay int
    auc = float(u2) / (2.0 * p.sum() * neg.sum())
    assert got["n_pos"] == int(p.sum()) and got["n_neg"] == int(neg.sum())
    assert abs(got["auc"] - auc) < 1e-12, (got["auc"], auc)
    t0 = time.time()
    tiled = exact_ntile(df.select("id", "score"), ["score", "id"], 10)
    sizes = tiled.groupBy("tile").count().collect()
    wall_cal = time.time() - t0
    assert sorted(r["count"] for r in sizes) == [N // 10] * 10
    print(
        f"evalpair: 20M rows, auc={got['auc']:.6f} wall={wall_auc:.1f}s; "
        f"10 exact deciles of {N//10} wall={wall_cal:.1f}s"
    )


def stress_r7stats():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import (
        anova_oneway,
        autocorr,
        brown_forsythe,
        cusum,
        pca2,
    )

    spark = _spark()
    base = spark.range(0, N, 1, 64).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 1000).alias("key"),
        F.col("id").alias("o"),
        # group means 0/10/20/30 + uniform noise in [0, 100)
        (
            (F.col("id") % 4) * 10
            + (F.abs(F.hash(F.col("id"), F.lit(5))) % 10_000) / 100.0
        ).alias("v"),
    )
    t0 = time.time()
    a = anova_oneway(base, "g", "v").collect()[0]
    t_anova = time.time() - t0
    assert a["k"] == 4 and a["n"] == N and a["f_stat"] > 1e5
    t0 = time.time()
    bf = brown_forsythe(base, "g", "v").collect()[0]
    t_bf = time.time() - t0
    assert bf["n"] == N
    t0 = time.time()
    pc = pca2(base, "v", "o").collect()[0]
    t_pca = time.time() - t0
    assert pc["n"] == N and 0.5 < pc["var_explained"] <= 1.0
    t0 = time.time()
    ac = autocorr(base, "key", "o", "v", lag=1)
    n_keys = ac.count()
    t_ac = time.time() - t0
    assert n_keys == 1000
    t0 = time.time()
    cs = cusum(base, "key", "o", "v", target=80.0, slack=5.0)
    n_cs = cs.count()
    t_cs = time.time() - t0
    assert n_cs == 1000
    print(
        f"r7stats 20M: anova={t_anova:.1f}s bf={t_bf:.1f}s "
        f"pca2={t_pca:.1f}s autocorr(1000 keys)={t_ac:.1f}s "
        f"cusum={t_cs:.1f}s"
    )


def stress_scrub():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.text import scrub_duplicate_spans

    spark = _spark()
    n_docs = 1_000_000
    planted = "shared span alpha bravo charlie delta echo foxtrot"
    docs = spark.range(0, n_docs, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), (F.abs(F.hash(F.col("id"), F.lit(j))) % 1_000_000).cast("string"))
                for j in range(40)
            ],
        ).alias("body"),
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 == 0,
            F.concat(F.lit(planted + " "), F.col("body")),
        ).otherwise(F.col("body")).alias("text"),
    )
    t0 = time.time()
    out = scrub_duplicate_spans(docs, k=8, min_docs=2)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum((F.col("n_kept") < F.col("n_tokens")).cast("long")).alias(
            "scrubbed"
        ),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    wall = time.time() - t0
    # 50k planted docs each lose AT LEAST the 8 planted tokens.
    # Slightly more is correct behavior, not a bug: the planted span
    # is a prefix, so grams straddling the span/body boundary carry
    # the doc's first body token (hash % 1e6) — among 50k planted
    # docs those collide by birthday, the straddling gram then
    # appears in 2 docs, and its body token is covered too (~2.5k
    # extra tokens at these parameters).
    assert agg["docs"] == n_docs
    assert agg["scrubbed"] == n_docs // 20, agg
    removed = agg["tok"] - agg["kept"]
    assert (n_docs // 20) * 8 <= removed < (n_docs // 20) * 8 + 10_000, agg
    print(
        f"scrub: 1M docs (~40 tokens), 50k planted spans removed "
        f"exactly, wall={wall:.1f}s"
    )


def stress_bfs_iso():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.graph import bfs_levels
    from hdfe_spark.operators.stats import isotonic_fit

    spark = _spark()
    # random bipartite graph: 2M left x 200k right, 20M edges
    e = spark.range(0, N, 1, 64).select(
        (F.abs(F.hash(F.col("id"), F.lit(11))) % 2_000_000).alias("u"),
        (F.abs(F.hash(F.col("id"), F.lit(13))) % 200_000
         + 10_000_000).alias("v"),
    )
    t0 = time.time()
    lv = bfs_levels(e, "u", "v", source=0, max_depth=3)
    counts = {r["level"]: r["cnt"] for r in
              lv.groupBy("level").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    wall = time.time() - t0
    assert counts.get(0, 0) == 1, counts
    # expected: ~10 suppliers at level 1, ~1000 custs at level 2,
    # ~100k supps at level 3 (Poisson degree ~10 each way)
    assert 1 <= counts.get(1, 0) < 100 and counts.get(2, 0) > 100, counts
    t0 = time.time()
    iso_df = spark.range(0, N, 1, 64).select(
        F.col("id"),
        (F.abs(F.hash(F.col("id"), F.lit(17))) % 1_000_000).alias("sc"),
        ((F.abs(F.hash(F.col("id"), F.lit(19))) % 1_000_000
          + F.abs(F.hash(F.col("id"), F.lit(17))) % 1_000_000)
         > 1_200_000).alias("label"),
    )
    rows = isotonic_fit(iso_df, ["sc", "id"], "label", n_bins=10).collect()
    wall_iso = time.time() - t0
    iso = [r["iso_rate"] for r in sorted(rows, key=lambda r: r["tile"])]
    assert all(a <= b + 1e-15 for a, b in zip(iso, iso[1:]))
    assert sum(r["n"] for r in rows) == N
    print(
        f"bfs: 20M-edge bipartite, levels {counts}, wall={wall:.1f}s; "
        f"isotonic 20M rows 10 bins wall={wall_iso:.1f}s"
    )


def stress_gini_xcorr():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import cross_corr, gini

    spark = _spark()
    t0 = time.time()
    df = spark.range(0, N, 1, 64).select(
        F.col("id"),
        (F.col("id") % 1000).alias("key"),
        F.col("id").alias("o"),
        (F.abs(F.hash(F.col("id"), F.lit(31))) % 100_000).cast(
            "double"
        ).alias("x"),
        (F.abs(F.hash(F.col("id"), F.lit(37))) % 100_000).cast(
            "double"
        ).alias("y"),
    )
    g = gini(df, "x", scale=1.0).collect()[0]
    t_g = time.time() - t0
    # uniform distribution -> Gini ~ 1/3
    assert abs(g["gini"] - 1.0 / 3.0) < 0.01, g
    t0 = time.time()
    cc = cross_corr(df, "key", "o", "x", "y", lag=1)
    n_keys = cc.count()
    t_c = time.time() - t0
    assert n_keys == 1000
    print(f"gini 20M (uniform, G={g['gini']:.4f}): {t_g:.1f}s; "
          f"cross_corr 20M x 1000 keys: {t_c:.1f}s")


def stress_dbscan():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.cluster import dbscan_grid

    spark = _spark()
    n_pts = 2_000_000
    # ~63k blobs of ~30 points in 60x60 boxes on a sparse 1e8 grid
    # (each eps-ball ~ the blob: ~30 points, so the pair
    # materialization stays ~n*30, not quadratic), + 5% uniform noise
    pts = spark.range(0, n_pts, 1, 64).select(
        F.col("id"),
        F.when(
            F.col("id") % 20 != 0,
            (F.col("id") % 63_333) * 1_500
            + (F.abs(F.hash(F.col("id"), F.lit(43))) % 60),
        ).otherwise(
            F.abs(F.hash(F.col("id"), F.lit(47))) % 100_000_000
        ).alias("x"),
        F.when(
            F.col("id") % 20 != 0,
            (F.col("id") % 63_333) * 1_500
            + (F.abs(F.hash(F.col("id"), F.lit(53))) % 60),
        ).otherwise(
            F.abs(F.hash(F.col("id"), F.lit(59))) % 100_000_000
        ).alias("y"),
    )
    t0 = time.time()
    out = dbscan_grid(pts, "id", "x", "y", eps=100, min_pts=10)
    agg = out.agg(
        F.count(F.lit(1)).alias("labeled"),
        F.count_distinct("cluster").alias("clusters"),
        F.sum(F.col("is_core").cast("long")).alias("core"),
    ).collect()[0]
    wall = time.time() - t0
    # each blob's 60x60 box sits inside one eps=100 ball -> all ~30
    # members are core and each blob is (at least) one cluster
    assert agg["clusters"] >= 63_000, agg
    assert agg["core"] >= n_pts * 9 // 10, agg
    print(
        f"dbscan: 2M points, ~63k planted blobs -> {agg['clusters']} "
        f"clusters, {agg['core']} core, wall={wall:.1f}s"
    )


if __name__ == "__main__":
    {
        "survival": stress_survival,
        "evalpair": stress_evalpair,
        "r7stats": stress_r7stats,
        "scrub": stress_scrub,
        "bfs_iso": stress_bfs_iso,
        "gini_xcorr": stress_gini_xcorr,
        "dbscan": stress_dbscan,
    }[sys.argv[1]]()
