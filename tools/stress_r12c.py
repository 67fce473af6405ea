"""Round-12 stress, third batch: the econometrics panel at 20M rows.

Fixtures use small-integer residue designs so every moment sum stays
below 2^53 — the double sums are then EXACT integers regardless of
reduction order, and Spark's driver-side solve can be compared
bit-for-bit against a numpy replica fed the same (exact) moments.
The within/demeaned paths (fit_stats, two-way cluster on the within
plan) introduce group-mean fractions, so those compare at relative
tolerance against a pandas groupby replica instead.

Usage: python tools/stress_r12c.py [cluster2|iv|wls|did|eventstudy|fitstats|all]
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

    return get_spark(app_name="stress_r12c")


def _base(spark):
    """20M-row residue design: x1 in 0..6, x2 in 0..2, z in 0..4
    (correlated with x1 through the shared index), two cluster
    dimensions (10k × 2k), y integer-linear in x1,x2 + residue noise."""
    from pyspark.sql import functions as F

    return spark.range(0, N, 1, 64).select(
        (F.col("id") % 7).cast("double").alias("x1"),
        (F.col("id") % 3).cast("double").alias("x2"),
        ((F.col("id") % 35) % 5).cast("double").alias("z"),
        (F.col("id") % 10000).alias("ca"),
        ((F.col("id") * 7919) % 2000).alias("cb"),
        (1.0 + (F.col("id") % 4).cast("double")).alias("w"),
        (
            2.0 * (F.col("id") % 7).cast("double")
            - (F.col("id") % 3).cast("double")
            + ((F.col("id") * 104729) % 11).cast("double")
            - 5.0
        ).alias("y"),
    )


def _np_cols():
    i = np.arange(N, dtype=np.int64)
    x1 = (i % 7).astype(np.float64)
    x2 = (i % 3).astype(np.float64)
    z = ((i % 35) % 5).astype(np.float64)
    ca = i % 10000
    cb = (i * 7919) % 2000
    w = 1.0 + (i % 4).astype(np.float64)
    y = 2.0 * x1 - x2 + ((i * 104729) % 11).astype(np.float64) - 5.0
    return x1, x2, z, ca, cb, w, y


def stress_cluster2():
    from hdfe_spark.operators.estimate import estimate

    spark = _spark()
    df = _base(spark)
    t0 = time.time()
    res = estimate(df, "y", ["x1", "x2"], estimate_variance=True,
                   cluster=["ca", "cb"])
    wall = time.time() - t0
    x1, x2, z, ca, cb, w, y = _np_cols()
    X = np.stack([x1, x2], axis=1)
    b = np.linalg.solve(X.T @ X, X.T @ y)
    e = y - X @ b
    S = X * e[:, None]
    import pandas as pd

    def meat(keys):
        u = pd.DataFrame(S).groupby(keys).sum().to_numpy()
        return u.T @ u

    M = meat(ca) + meat(cb) - meat(ca * 2000 + cb)
    Ginv = np.linalg.inv(X.T @ X)
    V = Ginv @ M @ Ginv
    rel = np.max(np.abs(res.V[0] - V) / np.abs(V))
    print(f"cluster2: wall={wall:.1f}s  b={res.b[:,0]}  max_rel_V={rel:.2e}")
    assert rel < 1e-9, rel


def stress_iv():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.estimate import iv_2sls

    spark = _spark()
    df = _base(spark)
    t0 = time.time()
    res = iv_2sls(df, "y", "x1", "z", x_exog="x2", estimate_variance=True)
    wall = time.time() - t0
    x1, x2, z, ca, cb, w, y = _np_cols()
    Z = np.stack([z, x2], axis=1)
    X = np.stack([x1, x2], axis=1)
    bt = np.linalg.solve(Z.T @ X, Z.T @ y)
    diff = np.max(np.abs(res.b[:, 0] - bt))
    print(f"iv_2sls: wall={wall:.1f}s  b={res.b[:,0]}  abs_diff={diff:.2e}")
    assert diff < 1e-9, diff
    assert abs(res.b[0, 0] - 2.0) < 0.05  # structural slope recovered


def stress_wls():
    from hdfe_spark.operators.estimate import wls

    spark = _spark()
    df = _base(spark)
    t0 = time.time()
    res = wls(df, "y", ["x1", "x2"], weights="w", estimate_variance=True)
    wall = time.time() - t0
    x1, x2, z, ca, cb, w, y = _np_cols()
    X = np.stack([x1, x2], axis=1)
    G = X.T @ (X * w[:, None])
    bt = np.linalg.solve(G, X.T @ (w * y))
    e = y - X @ bt
    sigma2 = float(w @ (e * e)) / (N - 2)
    V = np.linalg.inv(G) * sigma2
    rel = np.max(np.abs(res.V[0] - V) / np.abs(V))
    bdiff = np.max(np.abs(res.b[:, 0] - bt))
    print(f"wls: wall={wall:.1f}s  b={res.b[:,0]}  b_diff={bdiff:.2e}"
          f"  max_rel_V={rel:.2e}")
    assert bdiff < 1e-12, bdiff
    assert rel < 1e-9, rel


def stress_did():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import did

    spark = _spark()
    df = spark.range(0, N, 1, 64).select(
        ((F.col("id") % 2) == 0).alias("treat"),
        ((F.col("id") % 5) < 2).alias("post"),
        # integer outcome with a +7 jump on the treated-post cell
        (
            (F.col("id") % 100).cast("double")
            + F.when(
                ((F.col("id") % 2) == 0) & ((F.col("id") % 5) < 2),
                F.lit(7.0),
            ).otherwise(F.lit(0.0))
        ).cast("decimal(18,2)").alias("y"),
    )
    t0 = time.time()
    row = did(df, "y", "treat", "post").collect()[0]
    wall = time.time() - t0
    i = np.arange(N, dtype=np.int64)
    t = (i % 2) == 0
    p = (i % 5) < 2
    y = (i % 100).astype(np.float64) + np.where(t & p, 7.0, 0.0)

    def m(mask):
        # exact integer sums in int64 — the decimal path's ground truth
        return float(np.sum(y[mask], dtype=np.float64)) / int(mask.sum())

    att = (m(t & p) - m(t & ~p)) - (m(~t & p) - m(~t & ~p))
    print(f"did: wall={wall:.1f}s  att={row['att']}  expect={att}")
    assert abs(row["att"] - att) < 1e-9
    assert row["n_treat_post"] == int((t & p).sum())


def stress_eventstudy():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import event_study

    spark = _spark()
    # treat from id parity, period from id//2 — DECORRELATED (the
    # r10/r11 modulus lesson: id%2 and id%8 share the low bit, which
    # empties period 3's treated arm).
    kk_c = (F.floor(F.col("id") / 2) % 8).cast("int")
    tr_c = (F.col("id") % 2) == 0
    df = spark.range(0, N, 1, 64).select(
        tr_c.alias("treat"),
        kk_c.alias("k"),
        (
            (F.col("id") % 100).cast("double")
            + F.when(
                tr_c & (kk_c >= 4), (kk_c - 3).cast("double")
            ).otherwise(F.lit(0.0))
        ).cast("decimal(18,2)").alias("y"),
    )
    t0 = time.time()
    out = {r["k"]: r["att"] for r in
           event_study(df, "y", "treat", "k", 3).collect()}
    wall = time.time() - t0
    i = np.arange(N, dtype=np.int64)
    t = (i % 2) == 0
    kk = (i // 2) % 8
    y = (i % 100).astype(np.float64) + np.where(
        t & (kk >= 4), (kk - 3).astype(np.float64), 0.0
    )

    def m(mask):
        return float(np.sum(y[mask])) / int(mask.sum())

    worst = 0.0
    for kv in range(8):
        att = (m(t & (kk == kv)) - m(t & (kk == 3))) - (
            m(~t & (kk == kv)) - m(~t & (kk == 3))
        )
        worst = max(worst, abs(out[kv] - att))
    print(f"event_study: wall={wall:.1f}s  8 periods, worst_abs={worst:.2e}")
    assert worst < 1e-9, worst


def stress_fitstats():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.estimate import fit_stats

    spark = _spark()
    df = _base(spark).withColumn(
        "fe", (F.col("ca") % 1000).alias("fe")
    )
    t0 = time.time()
    fs = fit_stats(df, "y", ["x1", "x2"], categorical_controls=["fe"])
    wall = time.time() - t0
    import pandas as pd

    x1, x2, z, ca, cb, w, y = _np_cols()
    fe = ca % 1000
    pdf = pd.DataFrame({"x1": x1, "x2": x2, "y": y, "fe": fe})
    g = pdf.groupby("fe")
    for c in ("x1", "x2", "y"):
        pdf[c] = pdf[c] - g[c].transform("mean")
    Xd = pdf[["x1", "x2"]].to_numpy()
    yd = pdf["y"].to_numpy()
    b = np.linalg.solve(Xd.T @ Xd, Xd.T @ yd)
    rss = float(yd @ yd) - float(b @ (Xd.T @ yd))
    tss = float(yd @ yd)
    r2 = 1 - rss / tss
    rel = abs(fs["r2"] - r2) / abs(r2)
    print(f"fit_stats: wall={wall:.1f}s  r2={fs['r2']:.6f}  f={fs['f_stat']:.1f}"
          f"  rel_vs_pandas={rel:.2e}")
    assert rel < 1e-9, rel
    assert fs["n_groups"] == 1000




def stress_cluster2_100m():
    """100M-row leg for the heaviest new machinery: two-way CGM
    clustered variance with 1M × 100k cluster levels (≈37M distinct
    intersection pairs — far beyond anything a driver-side scores
    collect could hold; the old n_clusters×k collect is exactly what
    this path removed). Closed-form verification: residue design as
    in `_base`, betas vs the exact integer-moment solve."""
    from pyspark.sql import functions as F

    from hdfe_spark.operators.estimate import estimate

    spark = _spark()
    n = 100_000_000
    df = spark.range(0, n, 1, 256).select(
        (F.col("id") % 7).cast("double").alias("x1"),
        (F.col("id") % 3).cast("double").alias("x2"),
        (F.col("id") % 1_000_000).alias("ca"),
        ((F.col("id") * 7919) % 100_000).alias("cb"),
        (
            2.0 * (F.col("id") % 7).cast("double")
            - (F.col("id") % 3).cast("double")
            + ((F.col("id") * 104729) % 11).cast("double")
            - 5.0
        ).alias("y"),
    )
    t0 = time.time()
    res = estimate(df, "y", ["x1", "x2"], estimate_variance=True,
                   cluster=["ca", "cb"])
    wall = time.time() - t0
    # Exact-moment beta check WITHOUT a 100M-element numpy allocation
    # (review r12b: ~4.8 GB of driver arrays next to a local[32] JVM):
    # (x1, x2, y) is jointly periodic in i with period lcm(7,3,11) =
    # 231, so the exact integer moments are full_cycles * cycle_moment
    # + the remainder's prefix — a 231-element computation.
    period = 231
    ic = np.arange(period, dtype=np.int64)
    x1c = (ic % 7).astype(np.float64)
    x2c = (ic % 3).astype(np.float64)
    yc = 2.0 * x1c - x2c + ((ic * 104729) % 11).astype(np.float64) - 5.0
    full, rem = divmod(n, period)

    def _mom(a, b):
        return full * float(a @ b) + float(a[:rem] @ b[:rem])

    G = np.array([[_mom(x1c, x1c), _mom(x1c, x2c)],
                  [_mom(x1c, x2c), _mom(x2c, x2c)]])
    Xty = np.array([_mom(x1c, yc), _mom(x2c, yc)])
    bt = np.linalg.solve(G, Xty)
    bdiff = np.max(np.abs(res.b[:, 0] - bt))
    d = np.diag(res.V[0])
    print(f"cluster2_100m: wall={wall:.1f}s  b_diff={bdiff:.2e}"
          f"  V_diag={d}")
    assert bdiff < 1e-12, bdiff
    assert np.all(d > 0)




ALL = {
    "cluster2": stress_cluster2,
    "iv": stress_iv,
    "wls": stress_wls,
    "did": stress_did,
    "eventstudy": stress_eventstudy,
    "fitstats": stress_fitstats,
    "cluster2_100m": stress_cluster2_100m,
}



def stress_ri_20m():
    """ri_pvalue at 20M rows, n_perm=99: 400 fused conditional
    aggregates in ONE scan (the textbook implementation would scan
    100 times). Closed-form check: effects under the LCG family
    replay from the 231-cycle design, but here the treat assignment
    is id-parity and y has a +2 jump, so no permutation should beat
    the observed effect -> p = 1/100 exactly."""
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import ri_pvalue

    spark = _spark()
    # y's base varies on id//2 — DECORRELATED from the parity arm
    # (id%2 and id%100 share the low bit: the recurring modulus
    # lesson; the correlated version shifts the observed effect).
    df = spark.range(0, N, 1, 64).select(
        F.col("id").alias("rid"),
        ((F.col("id") % 2) == 0).alias("t"),
        (
            (F.floor(F.col("id") / 2) % 100).cast("double")
            + F.when((F.col("id") % 2) == 0, F.lit(2.0))
            .otherwise(F.lit(0.0))
        ).alias("y"),
    )
    t0 = time.time()
    row = ri_pvalue(df, "y", "t", n_perm=99, id_col="rid").collect()[0]
    wall = time.time() - t0
    print(f"ri_pvalue_20m: wall={wall:.1f}s  observed={row['observed']}"
          f"  p={row['p_value']}")
    assert abs(row["observed"] - 2.0) < 1e-9
    assert abs(row["p_value"] - 0.01) < 1e-12


def stress_mde_20m():
    """mde_by at 20M rows x 100 segments on the welch_by machinery —
    exact per-segment replica via the residue closed form is covered
    by the r11 welch stress; here: wall + the power_ratio invariant
    (observed/mde must equal |t| / z up to the shared SE factor)."""
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import mde_by, welch_by

    spark = _spark()
    # seg from id//2 so both arms exist in every segment (modulus
    # lesson: id%2 and id%100 share the low bit).
    df = spark.range(0, N, 1, 64).select(
        (F.floor(F.col("id") / 2) % 100).alias("seg"),
        F.when((F.col("id") % 2) == 0, F.lit("A")).otherwise(F.lit("B"))
        .alias("arm"),
        (
            ((F.col("id") * 104729) % 1000).cast("double") / 100.0
            + F.when((F.col("id") % 2) == 1, F.lit(0.05))
            .otherwise(F.lit(0.0))
        ).alias("v"),
    )
    t0 = time.time()
    rows = mde_by(df, "seg", "arm", "v", "A", "B").collect()
    wall = time.time() - t0
    w = {r["seg"]: r for r in
         welch_by(df, "seg", "arm", "v", "A", "B").collect()}
    z = 1.959963984540054 + 0.8416212335729143
    worst = 0.0
    for r in rows:
        ref = w[r["seg"]]
        se = (ref["var_a"] / ref["n_a"] + ref["var_b"] / ref["n_b"]) ** 0.5
        worst = max(worst, abs(r["mde"] - z * se))
    print(f"mde_20m: wall={wall:.1f}s  100 segments, worst_abs={worst:.2e}")
    assert worst < 1e-12, worst


ALL["ri_20m"] = stress_ri_20m
ALL["mde_20m"] = stress_mde_20m


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in ALL.items():
        if which in ("all", name):
            fn()
