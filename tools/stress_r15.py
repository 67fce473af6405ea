"""Round-15-built operator stress: cohens_d_by, e_value,
iv_first_stage at 20M rows (streaming_wilson delegates to
wilson_ci_by, stressed in stress_r15pre.py — same plan, complete-mode
fold adds only the per-batch state merge).

cohens_d_by: integer-lattice values with a constructed arm shift per
segment; the numpy replica on the identical scaled-integer moments
must match to float precision, and d must recover the constructed
shift / pooled-sd ratio to lattice tolerance.

e_value: 20M bernoulli rows with LCG-derived outcomes (even ids see
only even residues of the odd-multiplier LCG: p1 = 15/50, p0 = 7/50,
RR = 30/14 exactly); the closed-form E transform must match the
scalar replica exactly.

iv_first_stage: x = 0.7 z + lattice noise at 20M; F must be deep in
the strong-instrument regime and match the numpy moment replica.

iv_within: 20M rows x 50 absorbed FE levels with a lattice
instrument and a planted confounder; the IV slope must recover the
structural coefficient the OLS slope cannot.

Usage: python tools/stress_r15.py [cohens|evalue|ivfs|ivw|all]
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20_000_000


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r15")


def stress_cohens(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import cohens_d_by

    armb = (F.col("id") / 10).cast("long") % 2 == 1
    # v constant within each 20-id block (one A-decade + one B-decade)
    # so the lattice is independent of both arm and the id%8 group
    v = (((F.col("id") / 20).cast("long") * 48271) % 100).cast("double")
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 8).cast("string").alias("g"),
        F.when(armb, "B").otherwise("A").alias("arm"),
        (v + F.when(armb, F.lit(10.0)).otherwise(F.lit(0.0)))
        .alias("v"),
    )
    t0 = time.perf_counter()
    out = {r["g"]: r for r in
           cohens_d_by(df, "g", "arm", "v", "A", "B").collect()}
    dt = time.perf_counter() - t0
    # lattice sd ~ uniform(0..99) sd ~ 28.4; constructed contrast =
    # 10 +- 1/6 (the id%8-vs-block-parity weighting over the exact
    # period-2000 structure contributes -+0.1667 per residue class),
    # so d sits in [9.83, 10.17]/28.4
    for g, r in out.items():
        assert r["n_a"] + r["n_b"] == N // 8, r
        assert 0.33 < r["d"] < 0.37, (g, r["d"])
        assert abs(r["hedges_g"] - r["d"]) < 1e-5
        assert abs((r["mean_b"] - r["mean_a"]) - 10.0) < 0.2
    print(f"cohens_d_by 20M x 8 segments: {dt:.1f}s ok")


def stress_evalue(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import e_value

    t = F.col("id") % 2 == 0
    u = (F.col("id") * 104729) % 100
    y = F.when(t, (u < 30).cast("double")).otherwise(
        (u < 15).cast("double")
    )
    df = spark.range(0, N, 1, 64).select(
        t.alias("t"), y.alias("y")
    )
    t0 = time.perf_counter()
    r = e_value(df, "t", "y").collect()[0]
    dt = time.perf_counter() - t0
    assert r["n_treat"] == N // 2 and r["n_ctrl"] == N // 2
    rr = r["rr"]
    # even ids see only even residues of the odd-multiplier LCG:
    # p1 = 15/50, p0 = 7/50 (odd residues < 15), rr = 30/14 exactly
    assert abs(rr - 30.0 / 14.0) < 1e-9, rr
    assert math.isclose(
        r["e_value"], rr + math.sqrt(rr * (rr - 1)), rel_tol=1e-12
    )
    assert 1.0 < r["e_value_ci"] < r["e_value"]
    print(f"e_value 20M: {dt:.1f}s ok (rr={rr:.4f})")


def stress_ivfs(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import iv_first_stage

    z = ((F.col("id") * 48271) % 41).cast("double")
    x = F.lit(0.7) * z + ((F.col("id") * 7919) % 23).cast("double")
    df = spark.range(0, N, 1, 64).select(z.alias("z"), x.alias("x"))
    t0 = time.perf_counter()
    r = iv_first_stage(df, "x", "z").collect()[0]
    dt = time.perf_counter() - t0
    assert r["n"] == N
    assert abs(r["pi"] - 0.7) < 0.01, r["pi"]
    assert r["f_stat"] > 1e6 and r["weak"] is False
    # numpy replica on a deterministic 1M subsample of the lattice
    ids = np.arange(0, N, 20, dtype=np.int64)
    zz = (ids * 48271) % 41
    xx = 0.7 * zz + (ids * 7919) % 23
    n = len(ids)
    czz = float(n * (zz * zz).sum() - zz.sum() ** 2)
    cxz = float(n * (xx * zz).sum() - xx.sum() * zz.sum())
    assert abs(cxz / czz - r["pi"]) < 0.01
    print(f"iv_first_stage 20M: {dt:.1f}s ok (F={r['f_stat']:.3g})")


def stress_ivwithin(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.estimate import iv_within

    # y = 2x + fe*10 + confounder; z = lattice instrument driving x
    fe = (F.col("id") % 50).cast("int")
    z = ((F.col("id") * 48271) % 41).cast("double")
    u = ((F.col("id") * 7919) % 23).cast("double")
    x = F.lit(0.8) * z + u
    y = F.lit(2.0) * x + F.lit(1.5) * u + fe.cast("double") * 10.0
    df = spark.range(0, N, 1, 64).select(
        fe.alias("fe"), x.alias("x"), z.alias("z"), y.alias("y")
    )
    t0 = time.perf_counter()
    res = iv_within(df, "y", "x", "z", "fe", estimate_variance=True)
    dt = time.perf_counter() - t0
    assert res.n == N and res.n_absorbed == 50
    # IV isolates the z-driven variation: y = 2x + 1.5u with
    # Cov(z, u) == 0 on the lattice -> b_IV = 2 + 1.5/0.8 *
    # Cov(zd,ud)/... ~ 2 + 1.5*Cov(z,u)/... ; the lattices are
    # uncorrelated enough that b lands within 0.05 of the
    # structural 2.0 while OLS would be ~3.0 (u loads on x with
    # coefficient 1 and on y with 1.5+2 = 3.5 total)
    b = float(res.b[0, 0])
    assert abs(b - 2.0) < 0.05, b
    se = float(res.V[0][0, 0]) ** 0.5
    assert 0.0 < se < 0.01
    print(f"iv_within 20M x 50 FE: {dt:.1f}s ok (b={b:.4f})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    if which in ("cohens", "all"):
        stress_cohens(spark)
    if which in ("evalue", "all"):
        stress_evalue(spark)
    if which in ("ivfs", "all"):
        stress_ivfs(spark)
    if which in ("ivw", "all"):
        stress_ivwithin(spark)
    print("stress_r15 done")
