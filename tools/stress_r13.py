"""Round-13 stress: the new experimentation operators at 20M rows.

Residue designs keep every scaled moment an exact integer (decimal
sums are order-independent anyway, but integer fixtures let the numpy
replica match EXACTLY rather than at tolerance). The ri_pvalue case
uses dense 0..N-1 ids — exactly the id shape that exposed the
small-multiplier degeneracy fixed this round (48271-scaled LCG), so
the stress doubles as a permutation-balance check at scale.

Usage: python tools/stress_r13.py [cuped|smd|ri|mde|all]
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

    return get_spark(app_name="stress_r13")


def _base(spark):
    """20M rows, 100 segments, 2 arms decorrelated from values (the
    r10/r11 modulus lesson: group from i mod 100, everything else
    from i div 100). y and x integer-valued on the 1e-6 grid."""
    from pyspark.sql import functions as F

    return spark.range(0, N, 1, 64).select(
        (F.col("id") % 100).alias("g"),
        F.when((F.col("id").cast("long") / 100).cast("long") % 2 == 0,
               "a").otherwise("b").alias("arm"),
        (((F.col("id").cast("long") / 100).cast("long") * 7919) % 13)
        .cast("double").alias("x"),
        (
            2.0 * (((F.col("id").cast("long") / 100).cast("long")
                    * 7919) % 13).cast("double")
            + (((F.col("id").cast("long") / 100).cast("long")
                * 104729) % 7).cast("double")
        ).alias("y"),
    )


def _np_base():
    i = np.arange(N, dtype=np.int64)
    g = i % 100
    j = i // 100
    arm = np.where(j % 2 == 0, "a", "b")
    x = ((j * 7919) % 13).astype(np.float64)
    y = 2.0 * x + ((j * 104729) % 7).astype(np.float64)
    return g, arm, x, y


def stress_cuped(spark):
    from hdfe_spark.operators.stats import cuped_by

    t0 = time.perf_counter()
    out = (
        cuped_by(_base(spark), "g", "arm", "y", "x", "a", "b")
        .toPandas().set_index("g").sort_index()
    )
    wall = time.perf_counter() - t0
    g, arm, x, y = _np_base()
    worst = 0.0
    for gi in (0, 37, 99):
        m = g == gi
        xs, ys, arms = x[m], y[m], arm[m]
        theta = np.cov(ys, xs, ddof=0)[0, 1] / xs.var(ddof=0)
        a, b = arms == "a", arms == "b"
        raw = ys[b].mean() - ys[a].mean()
        adj = raw - theta * (xs[b].mean() - xs[a].mean())
        r = out.loc[gi]
        worst = max(worst,
                    abs(r["theta"] - theta) / max(abs(theta), 1e-300),
                    abs(r["diff_raw"] - raw),
                    abs(r["diff_cuped"] - adj))
    print(f"cuped_by 20M x 100 groups: {wall:.1f} s, worst diff {worst:.1e}")
    assert worst < 1e-9


def stress_smd(spark):
    from hdfe_spark.operators.stats import smd_by

    t0 = time.perf_counter()
    out = (
        smd_by(_base(spark), "arm", ["x", "y"], "a", "b")
        .toPandas().set_index("covariate")
    )
    wall = time.perf_counter() - t0
    g, arm, x, y = _np_base()
    worst = 0.0
    for c, v in (("x", x), ("y", y)):
        a, b = v[arm == "a"], v[arm == "b"]
        smd = (b.mean() - a.mean()) / np.sqrt(
            (a.var(ddof=1) + b.var(ddof=1)) / 2.0
        )
        worst = max(worst, abs(out.loc[c, "smd"] - smd))
        assert out.loc[c, "n_a"] == len(a)
    print(f"smd_by 20M x 2 covariates: {wall:.1f} s, worst diff {worst:.1e}")
    assert worst < 1e-9


def stress_ri(spark):
    """20M dense ids — every permutation must stay near the observed
    treated fraction (the multiplier-degeneracy regression check) and
    p must match the numpy replay exactly."""
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import ri_pvalue

    n_perm = 25
    df = spark.range(0, N, 1, 64).select(
        F.col("id"),
        ((F.col("id") * 7919) % 5 == 0).alias("t"),  # ~20/80 design
        ((F.col("id") * 104729) % 9).cast("double").alias("y"),
    )
    t0 = time.perf_counter()
    row = ri_pvalue(df, "y", "t", n_perm=n_perm, id_col="id").collect()[0]
    wall = time.perf_counter() - t0
    i = np.arange(N, dtype=np.int64)
    t = (i * 7919) % 5 == 0
    y = ((i * 104729) % 9).astype(np.float64)
    M = 1_000_003
    half = (M * int(t.sum())) // N
    obs = y[t].mean() - y[~t].mean()
    hits = 1
    fracs = []
    for k in range(n_perm):
        rid = i % M
        tk = ((rid * (48271 * (2 * k + 3)) + 7919 * (k + 1)) % M) < half
        fracs.append(float(tk.mean()))
        if tk.sum() == 0 or (~tk).sum() == 0:
            hits += 1
            continue
        if abs(y[tk].mean() - y[~tk].mean()) >= abs(obs):
            hits += 1
    frac_lo, frac_hi = min(fracs), max(fracs)
    print(f"ri_pvalue 20M x {n_perm} perms: {wall:.1f} s, "
          f"p={row['p_value']} (replica {hits / (n_perm + 1)}), "
          f"perm treated share in [{frac_lo:.4f}, {frac_hi:.4f}] "
          f"(design 0.2)")
    assert abs(row["p_value"] - hits / (n_perm + 1)) < 1e-12
    assert 0.19 < frac_lo and frac_hi < 0.21


def stress_mde(spark):
    from hdfe_spark.operators.stats import mde_by

    t0 = time.perf_counter()
    out = (
        mde_by(_base(spark), "g", "arm", "y", "a", "b")
        .toPandas().set_index("g").sort_index()
    )
    wall = time.perf_counter() - t0
    g, arm, x, y = _np_base()
    z = 1.959963984540054 + 0.8416212335729143
    worst = 0.0
    for gi in (0, 50, 99):
        m = g == gi
        ys, arms = y[m], arm[m]
        a, b = ys[arms == "a"], ys[arms == "b"]
        mde = z * np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
        worst = max(worst, abs(out.loc[gi, "mde"] - mde) / mde)
    print(f"mde_by 20M x 100 groups: {wall:.1f} s, worst rel {worst:.1e}")
    assert worst < 1e-9


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    if which in ("cuped", "all"):
        stress_cuped(spark)
    if which in ("smd", "all"):
        stress_smd(spark)
    if which in ("ri", "all"):
        stress_ri(spark)
    if which in ("mde", "all"):
        stress_mde(spark)


if __name__ == "__main__":
    main()
