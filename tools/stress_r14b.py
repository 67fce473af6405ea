"""Round-14 second-batch stress: conformal_by and synthetic_control
at 20M rows.

conformal_by: 20 segments x 1M rows, integer-lattice scores from an
LCG residue so the numpy replica recomputes the exact per-segment
k-th order statistic and coverage.

synthetic_control: J=10 donors x 2M periods (20M donor rows + 2M
treated rows); the treated path is an exact integer-valued linear
combination of the donors plus a post-period effect, so recovered
weights and the post gap are checked against construction truth.

Usage: python tools/stress_r14b.py [conformal|synth|all]
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

    return get_spark(app_name="stress_r14b")


def stress_conformal(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import conformal_by

    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 20).cast("string").alias("seg"),
        (((F.col("id") * 48271) % 1000003).cast("double") / F.lit(1000.0))
        .alias("score"),
        ((F.col("id") / 20).cast("long") % 5 < 4).alias("cal"),
    )
    t0 = time.perf_counter()
    out = {r["seg"]: r for r in
           conformal_by(df, "seg", "score", "cal", 0.1).collect()}
    wall = time.perf_counter() - t0

    ids = np.arange(N, dtype=np.int64)
    score = ((ids * 48271) % 1000003).astype(np.float64) / 1000.0
    seg = ids % 20
    cal = ((ids // 20) % 5) < 4
    worst = 0.0
    for s in range(20):
        m = seg == s
        cs = np.sort(score[m & cal])
        k = len(cs) + 1 - int(np.floor((len(cs) + 1) * 0.1))
        q = cs[k - 1]
        ts = score[m & ~cal]
        cov = float((ts <= q).mean())
        r = out[str(s)]
        assert r["n_cal"] == len(cs) and r["n_test"] == len(ts)
        assert r["q_hat"] == q, (s, r["q_hat"], q)
        worst = max(worst, abs(r["coverage"] - cov))
    print(f"conformal_by 20M: {wall:.1f}s, q_hat EXACT x20 segments, "
          f"coverage max |diff| {worst:.2e}")


def stress_synth(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import synthetic_control

    J, T, T0 = 10, 2_000_000, 1_600_000
    # donor j at period t: integer lattice via LCG residues
    dons = spark.range(0, J * T, 1, 64).select(
        F.concat(F.lit("d"), (F.col("id") % J).cast("string"))
        .alias("unit"),
        (F.col("id") / J).cast("long").alias("period"),
        (((F.col("id") * 48271 + (F.col("id") % J) * 7919) % 97)
         .cast("double")).alias("y"),
    )
    # treated: w_j = j+1 over donors 0..2 only (sparse truth), +5 post
    w_true = {0: 1.0, 1: 2.0, 2: 3.0}
    tr = spark.range(0, T, 1, 32).select(
        F.lit("tr").alias("unit"),
        F.col("id").alias("period"),
        sum(
            F.lit(w) * (((F.col("id") * J + j) * 48271
                         + F.lit(j * 7919)) % 97).cast("double")
            for j, w in w_true.items()
        ).alias("y0"),
    ).select(
        "unit", "period",
        (F.col("y0") + F.when(F.col("period") >= T0, F.lit(5.0))
         .otherwise(F.lit(0.0))).alias("y"),
    )
    df = dons.unionByName(tr)
    t0 = time.perf_counter()
    wdf = synthetic_control(df, "unit", "period", "y", "tr", T0,
                            return_weights=True)
    w = {r["unit"]: r["weight"] for r in wdf.collect()}
    t1 = time.perf_counter()
    gaps = synthetic_control(df, "unit", "period", "y", "tr", T0).agg(
        F.sum(F.when(F.col("is_post"), F.col("gap"))).alias("sp"),
        F.count(F.when(F.col("is_post"), 1)).alias("np"),
        F.max(F.abs(F.when(~F.col("is_post"), F.col("gap"))))
        .alias("maxpre"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    werr = max(
        abs(w[f"d{j}"] - w_true.get(j, 0.0)) for j in range(J)
    )
    att = float(gaps["sp"]) / int(gaps["np"])
    print(f"synthetic_control 20M+2M: weights {t1-t0:.1f}s, total "
          f"{wall:.1f}s, max |w err| {werr:.2e}, post ATT {att:.6f} "
          f"(truth 5.0), max pre |gap| {float(gaps['maxpre']):.2e}")
    assert werr < 1e-6 and abs(att - 5.0) < 1e-6


def stress_gseq(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import group_sequential_by

    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 10).cast("string").alias("seg"),
        ((F.col("id") / 10).cast("long") % 4 + 1).alias("look"),
        F.when((F.col("id") / 40).cast("long") % 2 == 0, "A")
        .otherwise("B").alias("arm"),
        (((F.col("id") * 48271) % 997).cast("double")
         + F.when(F.col("id") % 10 == 7,
                  F.when((F.col("id") / 40).cast("long") % 2 == 1,
                         F.lit(25.0)).otherwise(F.lit(0.0)))
         .otherwise(F.lit(0.0))).alias("v"),
    )
    t0 = time.perf_counter()
    out = {(r["seg"], r["look"]): r for r in
           group_sequential_by(df, "seg", "arm", "v", "look",
                               "A", "B").collect()}
    wall = time.perf_counter() - t0

    ids = np.arange(N, dtype=np.int64)
    seg = ids % 10
    look = (ids // 10) % 4 + 1
    arm_b = ((ids // 40) % 2).astype(bool)
    v = ((ids * 48271) % 997).astype(np.float64)
    v = v + np.where((seg == 7) & arm_b, 25.0, 0.0)
    u = np.round(v * 1e6)
    worst = 0.0
    for s in range(10):
        for lk in (1, 2, 3, 4):
            m = (seg == s) & (look <= lk)
            a, b = u[m & ~arm_b], u[m & arm_b]
            z = (a.mean() - b.mean()) / np.sqrt(
                a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
            r = out[(str(s), lk)]
            assert r["n_a"] == len(a) and r["n_b"] == len(b)
            worst = max(worst, abs(r["z"] - z) / max(abs(z), 1e-300))
    crossed = [k for k, r in out.items() if r["crossed"]]
    assert all(k[0] == "7" for k in crossed) and crossed
    print(f"group_sequential_by 20M: {wall:.1f}s, 40 cells, "
          f"z worst rel {worst:.2e}, crossed only in the shifted "
          f"segment ({len(crossed)} looks)")


def stress_meta(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import meta_analysis_by

    # 20M "study" rows across 1000 groups: dyadic se in {1/4,1/2,1,2}
    # and integer estimates make every weighted addend exact
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 1000).cast("string").alias("g"),
        ((F.col("id") * 48271) % 21).cast("double").alias("est"),
        F.pow(F.lit(2.0),
              ((F.col("id") * 7919) % 4).cast("double") - F.lit(2.0))
        .alias("se"),
    )
    t0 = time.perf_counter()
    out = {r["g"]: r for r in
           meta_analysis_by(df, "g", "est", "se").collect()}
    wall = time.perf_counter() - t0

    ids = np.arange(N, dtype=np.int64)
    g = ids % 1000
    est = ((ids * 48271) % 21).astype(np.float64)
    se = 2.0 ** (((ids * 7919) % 4).astype(np.float64) - 2.0)
    w = 1 / se**2
    worst = 0.0
    for gg in (0, 1, 499, 998, 999):
        m = g == gg
        th, wv = est[m], w[m]
        tf = (wv * th).sum() / wv.sum()
        q = (wv * th * th).sum() - (wv * th).sum() ** 2 / wv.sum()
        k = int(m.sum())
        tau2 = max(0.0, (q - (k - 1)) / (wv.sum() - (wv**2).sum() / wv.sum()))
        ws = 1 / (se[m] ** 2 + tau2)
        tr = (ws * th).sum() / ws.sum()
        r = out[str(gg)]
        assert r["k"] == k
        worst = max(worst,
                    abs(r["theta_fixed"] - tf) / abs(tf),
                    abs(r["tau2"] - tau2) / max(tau2, 1e-300),
                    abs(r["theta_random"] - tr) / abs(tr))
    print(f"meta_analysis_by 20M x 1000 groups: {wall:.1f}s, "
          f"worst rel err {worst:.2e} (fixed/tau2/random vs numpy)")


def stress_ope(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import off_policy_eval

    # 20M logged rounds, dyadic propensities, integer rewards
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 50).cast("string").alias("seg"),
        F.when((F.col("id") * 48271) % 4 == 0, "x").otherwise("y")
        .alias("a"),
        F.when((F.col("id") * 48271) % 4 == 0, F.lit(0.25))
        .otherwise(F.lit(0.75)).alias("p"),
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("pi"),
        ((F.col("id") * 7919) % 11).cast("double").alias("r"),
    )
    t0 = time.perf_counter()
    out = {r["seg"]: r for r in
           off_policy_eval(df, "r", "a", "p", "pi", by=["seg"]).collect()}
    wall = time.perf_counter() - t0

    ids = np.arange(N, dtype=np.int64)
    seg = ids % 50
    is_x = (ids * 48271) % 4 == 0
    p = np.where(is_x, 0.25, 0.75)
    pi_x = ids % 2 == 0
    match = is_x == pi_x
    r = ((ids * 7919) % 11).astype(np.float64)
    w = np.where(match, 1 / p, 0.0)
    worst = 0.0
    for s in (0, 1, 25, 49):
        m = seg == s
        n = int(m.sum())
        vips = (w[m] * r[m]).sum() / n
        vsnips = (w[m] * r[m]).sum() / w[m].sum()
        ess = w[m].sum() ** 2 / (w[m] ** 2).sum()
        o = out[str(s)]
        assert o["n"] == n and o["n_matched"] == int(match[m].sum())
        worst = max(worst, abs(o["v_ips"] - vips) / vips,
                    abs(o["v_snips"] - vsnips) / vsnips,
                    abs(o["ess"] - ess) / ess)
    print(f"off_policy_eval 20M x 50 segments: {wall:.1f}s, "
          f"worst rel err {worst:.2e} (ips/snips/ess vs numpy)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sp = _spark()
    if which in ("conformal", "all"):
        stress_conformal(sp)
    if which in ("synth", "all"):
        stress_synth(sp)
    if which in ("gseq", "all"):
        stress_gseq(sp)
    if which in ("meta", "all"):
        stress_meta(sp)
    if which in ("ope", "all"):
        stress_ope(sp)
