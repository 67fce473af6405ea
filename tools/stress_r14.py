"""Round-14 stress: dml_plm(learner='tree2') and
qte_by_approx_certificate at 20M rows.

tree2: residue-valued columns make every per-fold cell sum exact in
float64 (integer-valued doubles well under 2^53), so the numpy
replica of the fold trees and theta matches tightly.

Usage: python tools/stress_r14.py [tree2|qtecert|all]
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

    return get_spark(app_name="stress_r14")


def stress_tree2(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import dml_plm

    # x: 60 distinct integer values; g(x): monotone 4-step confounder
    # (exactly representable by a depth-2 tree); d and y integer-
    # valued combinations so the 20M cell sums are float64-exact.
    df = spark.range(0, N, 1, 64).select(
        F.col("id"),
        ((F.col("id") * 7919) % 60).cast("double").alias("x"),
    ).select(
        "id", "x",
        F.when(F.col("x") < 15, 0.0).when(F.col("x") < 30, 1.0)
        .when(F.col("x") < 45, 9.0).otherwise(10.0).alias("gx"),
    ).select(
        "id", "x",
        (F.col("gx") + ((F.col("id") * 104729) % 5).cast("double"))
        .alias("d"),
        (
            2.0 * (F.col("gx") + ((F.col("id") * 104729) % 5)
                   .cast("double"))
            + 3.0 * F.col("gx")
            + ((F.col("id") * 48271) % 7).cast("double")
        ).alias("y"),
    )
    t0 = time.perf_counter()
    row = dml_plm(df, "y", "d", "x", id_col="id",
                  learner="tree2").collect()[0]
    wall = time.perf_counter() - t0

    # numpy replica on the same closed-form columns
    i = np.arange(N, dtype=np.int64)
    x = ((i * 7919) % 60).astype(np.float64)
    gx = np.select([x < 15, x < 30, x < 45], [0.0, 1.0, 9.0], 10.0)
    d = gx + ((i * 104729) % 5).astype(np.float64)
    y = 2.0 * d + 3.0 * gx + ((i * 48271) % 7).astype(np.float64)
    fold = i % 2

    from hdfe_spark.operators.causal import _fit_tree2_numpy

    ry = np.empty(N)
    rv = np.empty(N)
    for f in (0, 1):
        comp = fold != f
        vals, inv = np.unique(x[comp], return_inverse=True)
        c = np.bincount(inv).astype(np.float64)
        sy = np.bincount(inv, weights=y[comp])
        sd = np.bincount(inv, weights=d[comp])
        gl = _fit_tree2_numpy(vals, c, sy)
        ml = _fit_tree2_numpy(vals, c, sd)

        def pred(leaves, xs):
            out = np.full(len(xs), leaves[-1][1])
            done = np.zeros(len(xs), dtype=bool)
            for ub, m in leaves[:-1]:
                hit = (~done) & (xs <= ub)
                out[hit] = m
                done |= hit
            return out

        m = fold == f
        ry[m] = y[m] - pred(gl, x[m])
        rv[m] = d[m] - pred(ml, x[m])
    theta_rep = float((rv * ry).sum() / (rv * rv).sum())
    rel = abs(row["theta"] - theta_rep) / max(abs(theta_rep), 1e-300)
    print(
        f"tree2: wall={wall:.1f}s theta={row['theta']:.6f}"
        f" replica={theta_rep:.6f} rel={rel:.2e}"
        f" n_used={row['n_used']}"
    )
    assert rel < 1e-9
    assert row["n_used"] == N


def stress_qtecert(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import qte_by_approx_certificate

    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 8).cast("long").alias("seg"),
        F.when((F.col("id") % 2) == 0, "a").otherwise("b").alias("arm"),
        (
            ((F.col("id") * 7919) % 100000).cast("double")
            + (F.col("id") % 8).cast("double") * 1000.0
        ).alias("v"),
    )
    t0 = time.perf_counter()
    rows = qte_by_approx_certificate(
        df, "seg", "arm", "v", "a", "b", accuracy=1000
    ).collect()
    wall = time.perf_counter() - t0
    ok = all(r["within_bound"] for r in rows)
    print(
        f"qtecert: wall={wall:.1f}s groups={len(rows)}"
        f" all_within_bound={ok}"
        f" n_a_total={sum(r['n_a'] for r in rows)}"
    )
    assert ok and len(rows) == 8
    assert sum(r["n_a"] + r["n_b"] for r in rows) == N


def stress_psm(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.matching import psm_att

    # Control lattice: k/10000 for k NOT ≡ 0 (mod 5) (7919·id mod
    # 10000 never hits multiples of 5 for id ≢ 0 mod 5); treated k
    # IS a multiple of 5, so no exact-score control exists and every
    # match resolves a real neighbor decision: +0.00004 offsets sit
    # nearer the NEXT lattice point (k+1, dist 0.00006 < 0.00014),
    # −0.00004 nearer the PREV (k−1) — both directions exercised.
    # Control mean at lattice point m is exactly m/100, treated y is
    # k/100 + 2, so att = ((2−0.01) + (2+0.01))/2 = 2.0 exactly.
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 5 == 0).alias("t"),
        (
            ((F.col("id") * 7919) % 10000).cast("double") / 10000.0
            + F.when(F.col("id") % 5 == 0,
                     F.when(F.col("id") % 2 == 0, 0.00004)
                     .otherwise(-0.00004)).otherwise(0.0)
        ).alias("s"),
        (
            ((F.col("id") * 7919) % 10000).cast("double") / 100.0
            + F.when(F.col("id") % 5 == 0, 2.0).otherwise(0.0)
        ).alias("y"),
    )
    t0 = time.perf_counter()
    row = psm_att(df, "y", "t", "s").collect()[0]
    wall = time.perf_counter() - t0
    print(
        f"psm_att: wall={wall:.1f}s att={row['att']:.9f}"
        f" n_treat={row['n_treat']} n_matched={row['n_matched']}"
        f" n_ctrl={row['n_ctrl']}"
    )
    assert abs(row["att"] - 2.0) < 1e-6
    assert row["n_treat"] == N // 5 and row["n_matched"] == N // 5
    assert row["n_ctrl"] == N - N // 5


def stress_wcb(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import wild_cluster_bootstrap

    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 1000).alias("g"),
        ((F.col("id") * 7919) % 100).cast("double").alias("x"),
        (
            0.05 * ((F.col("id") * 7919) % 100).cast("double")
            + (F.col("id") % 1000).cast("double") * 0.01
            + ((F.col("id") * 104729) % 7).cast("double")
        ).alias("y"),
    )
    t0 = time.perf_counter()
    row = wild_cluster_bootstrap(df, "y", "x", "g", n_boot=99).collect()[0]
    wall = time.perf_counter() - t0
    print(
        f"wcb: wall={wall:.1f}s beta={row['beta']:.6f}"
        f" p={row['p_value']} n_clusters={row['n_clusters']}"
    )
    assert row["n_clusters"] == 1000
    assert abs(row["beta"] - 0.05) < 1e-3  # real effect recovered
    assert row["p_value"] == 0.01          # strong signal -> floor p


def stress_msprt(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import msprt_by

    # Exact arm balance: for id = 20m + 10a + s (s = segment,
    # a = arm bit), the base value depends only on m — every (m, s)
    # cell contributes ONE a row and ONE b row with identical base v,
    # so null segments have delta exactly 0 (any modular-lattice
    # shortcut here correlates v with the arm and a 2M-row arm
    # detects the ulp-level systematic difference).
    arm_b = (F.col("id") % 20) >= 10
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 10).cast("long").alias("seg"),
        F.when(arm_b, "b").otherwise("a").alias("arm"),
        (
            (((F.col("id") / 20).cast("long") * 7919) % 1000)
            .cast("double") / 100.0
            + F.when(arm_b & (F.col("id") % 10 < 5),
                     0.05).otherwise(0.0)
        ).alias("v"),
    )
    t0 = time.perf_counter()
    rows = {r["seg"]: r for r in msprt_by(
        df, "seg", "arm", "v", "a", "b", tau2=1.0
    ).collect()}
    wall = time.perf_counter() - t0
    shifted = [rows[s]["p_always"] for s in range(5)]
    nulls = [rows[s]["p_always"] for s in range(5, 10)]
    print(
        f"msprt_by: wall={wall:.1f}s shifted_max_p={max(shifted):.2e}"
        f" null_min_p={min(nulls):.3f}"
    )
    assert max(shifted) < 1e-6 and min(nulls) > 0.05


def stress_cem(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.matching import cem_att

    # covariates derive from id div 5 so every 5-block carries ONE
    # treated and FOUR control rows with IDENTICAL (x1, x2) — the
    # within-stratum contrast is exactly the 3.0 shift (a lattice
    # keyed on raw id would deterministically separate the arms in
    # joint-bin space: the psm-stress lesson)
    blk = (F.col("id") / 5).cast("long")
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 5 == 0).alias("t"),
        ((blk * 7919) % 100).cast("double").alias("x1"),
        ((blk * 104729) % 50).cast("double").alias("x2"),
    ).select(
        "t", "x1", "x2",
        (F.col("x1") * 2.0 + F.col("x2")
         + F.when(F.col("t"), 3.0).otherwise(0.0)).alias("y"),
    )
    t0 = time.perf_counter()
    row = cem_att(df, "y", "t", ["x1", "x2"], bins=10).collect()[0]
    wall = time.perf_counter() - t0
    print(
        f"cem_att: wall={wall:.1f}s att={row['att']:.6f}"
        f" strata={row['n_strata_matched']}"
        f" matched={row['n_treat_matched']}"
    )
    assert abs(row["att"] - 3.0) < 1e-6
    assert row["n_treat_matched"] == N // 5


def stress_attgt(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import att_gt

    # 8 periods, cohorts 3/5 (effects 1.0/2.0), one-third never
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 8 + 1).alias("t"),
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("long"))
        .when(F.col("id") % 3 == 1, F.lit(3))
        .otherwise(F.lit(5)).alias("g"),
        F.col("id"),
    ).select(
        "t", "g",
        (
            0.5 * F.col("t").cast("double")
            + ((F.col("id") * 7919) % 9).cast("double")
            + F.when(
                F.col("g").isNotNull() & (F.col("t") >= F.col("g")),
                F.when(F.col("g") == 3, 1.0).otherwise(2.0),
            ).otherwise(0.0)
        ).alias("y"),
    )
    t0 = time.perf_counter()
    rows = {(r["g"], r["t"]): r for r in att_gt(
        df, "y", "t", "g"
    ).collect()}
    wall = time.perf_counter() - t0
    worst = max(
        abs(r["att"] - (1.0 if g == 3 else 2.0))
        for (g, t), r in rows.items()
    )
    print(f"att_gt: wall={wall:.1f}s cells={len(rows)} worst={worst:.2e}")
    assert len(rows) == 6 + 4  # g=3: t 3..8, g=5: t 5..8
    assert worst < 1e-2


def stress_ddd(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import triple_diff

    # block-keyed flags so every (t,p,g) cell shares the base value
    # lattice; the DDD effect is exactly 2.0 on top of a t*p shock
    blk = (F.col("id") / 8).cast("long")
    t = F.col("id") % 2 == 0
    p = (F.col("id") / 2).cast("long") % 2 == 0
    g = (F.col("id") / 4).cast("long") % 2 == 0
    df = spark.range(0, N, 1, 64).select(
        t.alias("t"), p.alias("p"), g.alias("g"),
        (
            ((blk * 7919) % 1000).cast("double") / 100.0
            + F.when(t & p, 0.7).otherwise(0.0)
            + F.when(t & p & g, 2.0).otherwise(0.0)
        ).alias("y"),
    )
    t0 = time.perf_counter()
    row = triple_diff(df, "y", "t", "p", "g").collect()[0]
    wall = time.perf_counter() - t0
    print(
        f"triple_diff: wall={wall:.1f}s ddd={row['ddd']:.9f}"
        f" did_g={row['did_group']:.4f}"
    )
    assert abs(row["ddd"] - 2.0) < 1e-9
    assert abs(row["did_group"] - 2.7) < 1e-9
    assert row["n_group"] + row["n_ctrlgroup"] == N


def stress_lee(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import lee_bounds

    # uniform 0..9999 outcomes + effect 5000 for treated; treated
    # observed 9/10, control 6/10 (selection independent of y)
    t = F.col("id") % 2 == 0
    seen = (F.col("id") / 2).cast("long") % 10 < F.when(t, 9).otherwise(6)
    df = spark.range(0, N, 1, 64).select(
        t.alias("t"),
        F.when(
            seen,
            ((F.col("id") * 7919) % 10000).cast("double")
            + F.when(t, 5000.0).otherwise(0.0),
        ).alias("y"),
    )
    t0 = time.perf_counter()
    row = lee_bounds(df, "y", "t").collect()[0]
    wall = time.perf_counter() - t0
    print(
        f"lee_bounds: wall={wall:.1f}s lower={row['lower']:.1f}"
        f" naive={row['naive']:.1f} upper={row['upper']:.1f}"
        f" q={row['q_trim']:.4f}"
    )
    # selection independent of y -> bounds bracket the true 5000;
    # trimming a uniform at q from one tail shifts the mean by
    # ~q/2*range/(1) — the bracket is wide but must contain truth
    assert row["lower"] < 5000.0 < row["upper"]
    assert row["q_trim"] == 1.0 - 6.0 / 9.0
    assert row["n_treat_obs"] == int(N / 2 * 0.9)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    if which in ("tree2", "all"):
        stress_tree2(spark)
    if which in ("qtecert", "all"):
        stress_qtecert(spark)
    if which in ("psm", "all"):
        stress_psm(spark)
    if which in ("wcb", "all"):
        stress_wcb(spark)
    if which in ("msprt", "all"):
        stress_msprt(spark)
    if which in ("cem", "all"):
        stress_cem(spark)
    if which in ("attgt", "all"):
        stress_attgt(spark)
    if which in ("ddd", "all"):
        stress_ddd(spark)
    if which in ("lee", "all"):
        stress_lee(spark)
