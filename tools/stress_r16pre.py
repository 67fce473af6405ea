"""Round-16 pre-build stress: dsir_weights, sun_abraham, and
local_projections at 20M rows (local_projections was registered in
round 15 after this file landed; its stress stays here with its
batch).

dsir_weights: 20M synthetic docs (4 tokens each, ~80M tokens) over a
two-vocabulary mixture — target docs draw from the "clean" vocab,
20% of the pool matches it; clean-vocab pool docs must outscore
spam-vocab pool docs for every single document (complete separation
by construction), and the plan's token shuffle must materialize
once.

sun_abraham: 20M-row staggered panel (2M units, cohorts 3/4/never,
periods 1-10, noiseless construction) — the IW estimates must match
the constructed cohort-size-weighted effects to 1e-12 (cell means
divide exact dyadic sums, so only division rounding remains).

local_projections: 20M rows (200k entities x 100 periods), MA(1)
construction on a deterministically lag-correlated LCG lattice —
every horizon's pooled slope must match the numpy moment replica
over the identical 20M ids to 1e-6.

granger_by: 20M rows x 200k entities, y_t driven by x_{t-1} — every
entity's F must be deep in the rejection region with zero NULLs.

pretrends: 20M staggered panel with a planted +0.3/period cohort
pre-trend — the placebo slope must recover it exactly.

rdd_sensitivity: 20M rows, planted +7 jump — every bandwidth's
effect recovers it from ONE aggregation.

Usage: python tools/stress_r16pre.py [dsir|sa|lp|granger|pretrends|rdds|all]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20_000_000


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r16pre")


def stress_dsir(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.text import dsir_weights

    # clean vocab: c0..c9; spam vocab: s0..s9. Target = clean-only.
    # Pool: ids % 5 == 0 are clean-profile, rest spam-profile.
    is_target = F.col("id") % 17 == 0
    clean = F.col("id") % 5 == 0
    use_clean = is_target | clean

    def word(k):
        return F.concat(
            F.when(use_clean, F.lit("c")).otherwise(F.lit("s")),
            ((F.col("id") * (k * 2 + 3)) % 10).cast("string"),
        )

    df = spark.range(0, N, 1, 64).select(
        F.col("id").alias("doc_id"),
        is_target.alias("is_target"),
        F.concat_ws(" ", word(0), word(1), word(2), word(3))
        .alias("text"),
    )
    t0 = time.perf_counter()
    out = dsir_weights(df, "is_target")
    agg = out.join(
        df.select("doc_id", "is_target",
                  (F.col("doc_id") % 5 == 0).alias("clean")),
        on="doc_id",
    ).filter(~F.col("is_target")).groupBy("clean").agg(
        F.min("log_weight").alias("mn"),
        F.max("log_weight").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    dt = time.perf_counter() - t0
    r = {row["clean"]: row for row in agg}
    # complete separation: every clean-profile pool doc outscores
    # every spam-profile pool doc
    assert r[True]["mn"] > r[False]["mx"], (r[True]["mn"],
                                            r[False]["mx"])
    assert r[True]["n"] + r[False]["n"] == N - (N + 16) // 17
    print(f"dsir_weights 20M docs (~80M tokens): {dt:.1f}s ok "
          f"(clean min {r[True]['mn']:.2f} > spam max "
          f"{r[False]['mx']:.2f})")


def stress_sa(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import sun_abraham

    # 2M units x 10 periods; cohorts: unit%4==0 -> g=3 (effect 2),
    # unit%4==1 -> g=4 (effect 6), else never-treated
    unit = (F.col("id") / 10).cast("long")
    t = (F.col("id") % 10 + 1).cast("int")
    g = (
        F.when(unit % 4 == 0, F.lit(3))
        .when(unit % 4 == 1, F.lit(4))
        .otherwise(F.lit(None).cast("int"))
    )
    eff = (
        F.when((unit % 4 == 0) & (t >= 3), F.lit(2.0))
        .when((unit % 4 == 1) & (t >= 4), F.lit(6.0))
        .otherwise(F.lit(0.0))
    )
    y = (unit % 7).cast("double") + t.cast("double") * 0.5 + eff
    df = spark.range(0, N, 1, 64).select(
        unit.alias("unit"), t.alias("t"), g.alias("g"), y.alias("y")
    )
    t0 = time.perf_counter()
    out = {r["rel_period"]: r for r in
           sun_abraham(df, "y", "t", "g").collect()}
    dt = time.perf_counter() - t0
    n_units = N // 10
    n3, n4 = n_units // 4, n_units // 4
    # l in 0..6 has both cohorts (g=3 up to t=10 -> l<=7 for g=3
    # only); weighted effect = (n3*2 + n4*6)/(n3+n4) = 4 exactly
    for l in range(0, 7):
        assert out[l]["n_cohorts"] == 2, (l, out[l])
        assert math.isclose(
            out[l]["att_iw"], (n3 * 2.0 + n4 * 6.0) / (n3 + n4),
            rel_tol=1e-12,
        ), (l, out[l]["att_iw"])
    assert out[7]["n_cohorts"] == 1
    assert math.isclose(out[7]["att_iw"], 2.0, rel_tol=1e-12)
    print(f"sun_abraham 20M panel: {dt:.1f}s ok (IW 0..6 == 4.0 "
          "exactly, l=7 == 2.0)")


def stress_lp(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import local_projections

    # 200k entities x 100 periods; y_t = x_t + 0.5 x_{t-1} (MA(1)),
    # x a centered LCG lattice — closed-form pooled IRF: b0 ~ 1,
    # b1 ~ 0.5, b2 ~ 0 (up to the lattice's small lag correlations)
    e = (F.col("id") / 100).cast("long")
    t = (F.col("id") % 100).cast("int")

    def xf(idc):
        return ((idc * 48271) % 97).cast("double") - 48.0

    x = xf(F.col("id"))
    xm1 = F.when(t >= 1, xf(F.col("id") - 1)).otherwise(F.lit(0.0))
    df = spark.range(0, N, 1, 64).select(
        e.alias("e"), t.alias("t"), x.alias("x"),
        (x + F.lit(0.5) * xm1).alias("y"),
    )
    t0 = time.perf_counter()
    out = {r["horizon"]: r for r in
           local_projections(df, "e", "t", "y", "x", 3).collect()}
    dt = time.perf_counter() - t0
    assert out[0]["n"] == N
    assert out[1]["n"] == N - N // 100
    # the LCG lattice is deterministically lag-correlated
    # (x_t = (x_{t-1}+62) mod 97), so the pooled IRF is NOT the
    # textbook (1, 0.5, 0); the ground truth is the numpy replica
    # over the identical 20M ids
    import numpy as np

    ids = np.arange(N, dtype=np.int64)
    ee, tt = ids // 100, ids % 100
    xx = ((ids * 48271) % 97).astype(np.float64) - 48.0
    xm = np.where(tt >= 1,
                  (((ids - 1) * 48271) % 97).astype(np.float64) - 48.0,
                  0.0)
    yy = xx + 0.5 * xm
    for h in range(3):
        keep = tt < 100 - h
        xs = xx[keep]
        ys = yy[keep.nonzero()[0] + h]
        n = len(xs)
        vx = n * float(xs @ xs) - float(xs.sum()) ** 2
        cxy = n * float(xs @ ys) - float(xs.sum()) * float(ys.sum())
        want = cxy / vx
        assert abs(out[h]["b"] - want) < 1e-6, (h, out[h]["b"], want)
    assert all(out[h]["se"] > 0 for h in range(4))
    print(f"local_projections 20M x 200k entities H=3: {dt:.1f}s ok "
          f"(b0={out[0]['b']:.3f}, b1={out[1]['b']:.3f})")


def stress_granger(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import granger_by

    # 200k entities x 100 periods; y_t = 0.5 y_{t-1}-ish via a
    # direct MA spelling: y_t = x_{t-1} + small lattice noise, so
    # the unrestricted fit loads on beta and F is huge for every
    # entity; a second x' column (independent lattice) gives F ~ 1
    e = (F.col("id") / 100).cast("long")
    t = (F.col("id") % 100).cast("int")

    def xf(idc, mult):
        return ((idc * mult) % 97).cast("double") - 48.0

    x = xf(F.col("id"), 48271)
    xm1 = F.when(t >= 1, xf(F.col("id") - 1, 48271)).otherwise(F.lit(0.0))
    noise = ((F.col("id") * 7919) % 7).cast("double") * 0.01
    df = spark.range(0, N, 1, 64).select(
        e.alias("e"), t.alias("t"), x.alias("x"),
        (xm1 + noise).alias("y"),
    )
    t0 = time.perf_counter()
    out = granger_by(df, "e", "t", "y", "x")
    agg = out.agg(
        F.min("f_stat").alias("mn"),
        F.count(F.when(F.col("f_stat").isNull(), 1)).alias("nulls"),
        F.sum("n").alias("ntot"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    assert agg["nulls"] == 0
    assert agg["ntot"] == N - N // 100  # one lost triple per entity
    assert agg["mn"] > 1e4, agg["mn"]  # x_{t-1} drives y everywhere
    print(f"granger_by 20M x 200k entities: {dt:.1f}s ok "
          f"(min F {agg['mn']:.3g})")


def stress_pretrends(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import pretrends

    # 2M units x 10 periods; cohort g=6 drifts +0.3/period pre-
    # adoption vs never-treated: the placebo slope must recover 0.3
    unit = (F.col("id") / 10).cast("long")
    t = (F.col("id") % 10 + 1).cast("int")
    g = F.when(unit % 3 == 0, F.lit(6)).otherwise(
        F.lit(None).cast("int")
    )
    drift = F.when(unit % 3 == 0, t.cast("double") * 0.3).otherwise(
        F.lit(0.0)
    )
    y = (unit % 7).cast("double") + t.cast("double") * 0.5 + drift
    df = spark.range(0, N, 1, 64).select(
        unit.alias("unit"), t.alias("t"), g.alias("g"), y.alias("y")
    )
    t0 = time.perf_counter()
    r = pretrends(df, "y", "t", "g").collect()[0]
    dt = time.perf_counter() - t0
    assert r["n_cells"] == 4  # t = 1..4 (5 is the anchor)
    assert abs(r["slope"] - 0.3) < 1e-9, r["slope"]
    # the placebo drift is linear; only cell-mean float rounding
    # remains in the weighted RSS
    assert r["se"] is None or r["se"] < 1e-6, r["se"]
    print(f"pretrends 20M panel: {dt:.1f}s ok (slope "
          f"{r['slope']:.4f})")


def stress_rdd_sens(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import rdd_sensitivity

    # 20M rows, running = lattice 0..999/10, jump +7 at 50, slope 0.2
    run = (((F.col("id") * 48271) % 1000).cast("double")) / 10.0
    noise = ((F.col("id") * 7919) % 11).cast("double") * 0.1
    y = run * 0.2 + F.when(run >= 50.0, F.lit(7.0)).otherwise(
        F.lit(0.0)
    ) + noise
    df = spark.range(0, N, 1, 64).select(
        run.alias("run"), y.alias("y")
    )
    t0 = time.perf_counter()
    out = {r["bandwidth"]: r for r in
           rdd_sensitivity(df, "y", "run", 50.0,
                           [5.0, 10.0, 25.0, 50.0]).collect()}
    dt = time.perf_counter() - t0
    for h, r in out.items():
        assert abs(r["effect"] - 7.0) < 0.05, (h, r["effect"])
        assert r["n_left"] > 0 and r["n_right"] > 0
    print(f"rdd_sensitivity 20M x 4 bandwidths: {dt:.1f}s ok "
          f"(effects {[round(out[h]['effect'], 3) for h in sorted(out)]})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    if which in ("dsir", "all"):
        stress_dsir(spark)
    if which in ("sa", "all"):
        stress_sa(spark)
    if which in ("lp", "all"):
        stress_lp(spark)
    if which in ("granger", "all"):
        stress_granger(spark)
    if which in ("pretrends", "all"):
        stress_pretrends(spark)
    if which in ("rdds", "all"):
        stress_rdd_sens(spark)
    print("stress_r16pre done")
