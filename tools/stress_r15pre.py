"""Round-15 pre-build stress: cuped2_by and bayes_ab at 20M rows.

cuped2_by: integer-lattice covariates + a constructed linear outcome
with an exact arm shift; the numpy lstsq replica on the identical
scaled-integer moments must match to float precision.

bayes_ab: 20M bernoulli rows per arm with LCG-derived outcomes; the
exact-sum path is exercised at raw scale via a subsample fixture
(the sum is O(successes)), the normal escape at the full 20M.

mediation_by: 20M rows x 8 segments, m = 1.5t + lattice noise and
y = 2m + 0.5t + independent lattice noise; checks the indirect
effect against the 3.0 construction and the a*b == c - c' identity.

manski_bounds: 20M rows, 80%/70% observed arms over uniform 0-100
outcomes; checks the width == (y_max - y_min) * missingness
identity and that the bounds bracket the naive contrast.

Usage: python tools/stress_r15pre.py [cuped2|bayes|mediation|manski|kink|nw|wilson|all]
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

    return get_spark(app_name="stress_r15pre")


def stress_cuped2(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import cuped2_by

    # 10 segments; x1, x2 integer lattices; y = 3x1 - 2x2 + e + shift
    x1 = ((F.col("id") * 48271) % 50).cast("double")
    x2 = ((F.col("id") * 7919) % 30).cast("double")
    armb = (F.col("id") / 10).cast("long") % 2 == 1
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 10).cast("string").alias("g"),
        F.when(armb, "B").otherwise("A").alias("arm"),
        x1.alias("x1"),
        x2.alias("x2"),
        (F.lit(3.0) * x1 - F.lit(2.0) * x2
         + ((F.col("id") * 104729) % 7).cast("double")
         + F.when(armb, F.lit(5.0)).otherwise(F.lit(0.0))).alias("y"),
    )
    t0 = time.perf_counter()
    out = {r["g"]: r for r in
           cuped2_by(df, "g", "arm", "y", "x1", "x2", "A", "B",
                     scale=1e6).collect()}
    wall = time.perf_counter() - t0

    ids = np.arange(N, dtype=np.int64)
    g = ids % 10
    arm_b = ((ids // 10) % 2).astype(bool)
    x1 = ((ids * 48271) % 50).astype(np.float64)
    x2 = ((ids * 7919) % 30).astype(np.float64)
    y = 3.0 * x1 - 2.0 * x2 + ((ids * 104729) % 7) + np.where(arm_b, 5.0, 0.0)
    worst = 0.0
    for s in (0, 5, 9):
        m = g == s
        u1, u2, uy = (np.round(x1[m] * 1e6), np.round(x2[m] * 1e6),
                      np.round(y[m] * 1e6))
        X = np.stack([u1, u2], 1)
        Xc = X - X.mean(0)
        yc = uy - uy.mean()
        th = np.linalg.solve(Xc.T @ Xc, Xc.T @ yc)
        b = arm_b[m]
        adj = ((uy[b].mean() - uy[~b].mean())
               - th[0] * (u1[b].mean() - u1[~b].mean())
               - th[1] * (u2[b].mean() - u2[~b].mean())) / 1e6
        r = out[str(s)]
        worst = max(worst,
                    abs(r["theta1"] - th[0]) / abs(th[0]),
                    abs(r["theta2"] - th[1]) / abs(th[1]),
                    abs(r["effect_adj"] - adj) / abs(adj))
        assert abs(r["effect_adj"] - 5.0) < 1e-2
    print(f"cuped2_by 20M x 10 segments: {wall:.1f}s, worst rel "
          f"{worst:.2e} vs numpy lstsq on identical scaled moments; "
          f"adjusted effect ~5.0 everywhere")


def stress_bayes(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import bayes_ab

    df = spark.range(0, N, 1, 64).select(
        F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.when(
            F.col("id") % 2 == 0,
            ((F.col("id") * 48271) % 100 < 30).cast("int"),
        ).otherwise(
            ((F.col("id") * 48271) % 100 < 32).cast("int"),
        ).alias("s"),
    )
    t0 = time.perf_counter()
    r = bayes_ab(df, "arm", "s", "A", "B").collect()[0]
    wall = time.perf_counter() - t0
    assert r["method"] == "normal" and r["n_a"] == N // 2
    # truth: 30% vs 32% at 10M/arm (even/odd residue lattices) -- B
    # wins with near certainty
    assert r["p_b_beats_a"] > 0.999999
    # exact path at a 1/4096 systematic subsample of the same stream
    sub = spark.range(0, N, 4096, 32).select(
        F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.when(
            F.col("id") % 2 == 0,
            ((F.col("id") * 48271) % 100 < 30).cast("int"),
        ).otherwise(
            ((F.col("id") * 48271) % 100 < 32).cast("int"),
        ).alias("s"),
    )
    t1 = time.perf_counter()
    re = bayes_ab(sub, "arm", "s", "A", "B").collect()[0]
    wall2 = time.perf_counter() - t1
    assert re["method"] == "exact"
    print(f"bayes_ab 20M (normal escape): {wall:.1f}s, "
          f"p = {r['p_b_beats_a']:.8f}; exact path at n={re['n_a']+re['n_b']}: "
          f"{wall2:.1f}s, p = {re['p_b_beats_a']:.6f}")


def stress_mediation(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import mediation_by

    # 8 segments; t binary, m = 1.5t + lattice noise, y = 2m + 0.5t + noise
    t = (F.col("id") % 2).cast("double")
    em = ((F.col("id") * 48271) % 9).cast("double") - F.lit(4.0)
    ey = ((F.col("id") * 7919) % 11).cast("double") - F.lit(5.0)
    m_ = F.lit(1.5) * t + em
    df = spark.range(0, N, 1, 64).select(
        ((F.col("id") / 2).cast("long") % 8).cast("string").alias("g"),
        (F.lit(2.0) * m_ + F.lit(0.5) * t + ey).alias("y"),
        t.alias("t"),
        m_.alias("m"),
    )
    t0 = time.perf_counter()
    out = {r["g"]: r for r in
           mediation_by(df, "g", "y", "t", "m", scale=1e6).collect()}
    wall = time.perf_counter() - t0
    worst_ind = max(abs(r["indirect"] - 3.0) for r in out.values())
    worst_id = max(abs(r["indirect"] - (r["c"] - r["c_direct"]))
                   for r in out.values())
    assert worst_ind < 0.05 and worst_id < 1e-9
    print(f"mediation_by 20M x 8 segments: {wall:.1f}s, indirect "
          f"worst |err| {worst_ind:.2e} vs the 3.0 construction, "
          f"a*b == c - c' identity to {worst_id:.1e}")


def stress_manski(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import manski_bounds

    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 2 == 0).alias("t"),
        F.when(
            (F.col("id") * 48271) % 10
            < F.when(F.col("id") % 2 == 0, 8).otherwise(7),
            ((F.col("id") * 7919) % 101).cast("double"),
        ).alias("y"),
    )
    t0 = time.perf_counter()
    r = manski_bounds(df, "y", "t", 0.0, 100.0).collect()[0]
    wall = time.perf_counter() - t0
    width = 100.0 * (r["miss_treat"] / r["n_treat"]
                     + r["miss_ctrl"] / r["n_ctrl"])
    assert abs((r["upper"] - r["lower"]) - width) < 1e-6
    assert r["lower"] < r["naive"] < r["upper"]
    print(f"manski_bounds 20M: {wall:.1f}s, bounds "
          f"[{r['lower']:.3f}, {r['upper']:.3f}] bracket the naive "
          f"{r['naive']:.3f}; width == missingness identity exact")


def stress_kink(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import regression_kink

    # y = 3 + 1.5 x- + 4 x+ + lattice noise, kink at 50, bw 40
    x = ((F.col("id") * 48271) % 101).cast("double")
    xm = F.least(x - F.lit(50.0), F.lit(0.0))
    xp = F.greatest(x - F.lit(50.0), F.lit(0.0))
    df = spark.range(0, N, 1, 64).select(
        x.alias("run"),
        (F.lit(3.0) + F.lit(1.5) * xm + F.lit(4.0) * xp
         + ((F.col("id") * 7919) % 11).cast("double") - F.lit(5.0)
         ).alias("y"),
    )
    t0 = time.perf_counter()
    r = regression_kink(df, "y", "run", 50.0, 40.0).collect()[0]
    wall = time.perf_counter() - t0
    assert abs(r["kink_effect"] - 2.5) < 1e-3, r
    assert abs(r["slope_left"] - 1.5) < 1e-3
    print(f"regression_kink 20M: {wall:.1f}s, kink effect "
          f"{r['kink_effect']:.6f} (truth 2.5), slopes "
          f"({r['slope_left']:.6f}, {r['slope_right']:.6f})")


def stress_nw(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import newey_west_by

    # 50 entities x 400k steps; x and e both slow lattice cycles so
    # u is genuinely autocorrelated; b truth 2.5
    T = N // 50
    x = ((F.col("id") / 50).cast("long") % 7).cast("double")
    e = (((F.col("id") / 50).cast("long") * 48271) % 5).cast("double")
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 50).cast("string").alias("g"),
        (F.col("id") / 50).cast("long").alias("t"),
        x.alias("x"),
        (F.lit(2.5) * x + e).alias("y"),
    )
    t0 = time.perf_counter()
    out = {r["g"]: r for r in
           newey_west_by(df, "g", "y", "x", "t", 5).collect()}
    wall = time.perf_counter() - t0
    worst = max(abs(r["b"] - 2.5) for r in out.values())
    assert all(r["se_hac"] is not None for r in out.values())
    print(f"newey_west_by 20M x 50 entities (L=5): {wall:.1f}s, "
          f"slope worst |err| {worst:.2e} vs 2.5 truth")


def stress_wilson(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import wilson_ci_by

    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 1000).cast("string").alias("g"),
        # prime modulus COPRIME with the 1000-group key (a mod-100
        # lattice is constant within mod-1000 groups)
        ((F.col("id") * 48271) % 101 < 30).cast("int").alias("s"),
    )
    t0 = time.perf_counter()
    out = {r["g"]: r for r in wilson_ci_by(df, "g", "s").collect()}
    wall = time.perf_counter() - t0
    p0 = 30.0 / 101.0
    cover = sum(1 for r in out.values() if r["lo"] <= p0 <= r["hi"])
    assert cover == 1000
    print(f"wilson_ci_by 20M x 1000 groups: {wall:.1f}s, all 1000 "
          f"intervals cover the 30/101 construction")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sp = _spark()
    if which in ("cuped2", "all"):
        stress_cuped2(sp)
    if which in ("bayes", "all"):
        stress_bayes(sp)
    if which in ("mediation", "all"):
        stress_mediation(sp)
    if which in ("manski", "all"):
        stress_manski(sp)
    if which in ("kink", "all"):
        stress_kink(sp)
    if which in ("nw", "all"):
        stress_nw(sp)
    if which in ("wilson", "all"):
        stress_wilson(sp)
