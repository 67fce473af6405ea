"""Round-13 stress, second batch: wls_within and qte_by at 20M rows.

wls_within uses the r12c residue design (exact integer moments after
weighted demeaning stay rational with small denominators, so the
pandas replica matches at tight relative tolerance); qte_by uses a
residue-valued fixture whose per-arm quantiles are exactly
interpolable.

Usage: python tools/stress_r13c.py [wlswithin|qte|all]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20_000_000


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r13c")


def stress_wls_within(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.estimate import wls_within

    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 1000).alias("fe"),
        (F.col("id") % 7).cast("double").alias("x1"),
        ((F.col("id") * 7919) % 3).cast("double").alias("x2"),
        (1.0 + (F.col("id") % 4).cast("double")).alias("w"),
        (
            2.0 * (F.col("id") % 7).cast("double")
            - ((F.col("id") * 7919) % 3).cast("double")
            + (F.col("id") % 1000).cast("double") * 0.01
            + ((F.col("id") * 104729) % 11).cast("double")
        ).alias("y"),
    )
    t0 = time.perf_counter()
    res = wls_within(df, "y", ["x1", "x2"], fe="fe", weights="w",
                     estimate_variance=True)
    wall = time.perf_counter() - t0
    # pandas replica on the same closed-form columns
    i = np.arange(N, dtype=np.int64)
    fe = i % 1000
    x1 = (i % 7).astype(np.float64)
    x2 = ((i * 7919) % 3).astype(np.float64)
    w = 1.0 + (i % 4).astype(np.float64)
    y = 2.0 * x1 - x2 + fe * 0.01 + ((i * 104729) % 11).astype(np.float64)
    pdf = pd.DataFrame({"fe": fe, "w": w})
    X = np.column_stack([x1, x2])
    Xd = X.copy()
    for j in range(2):
        pdf["wc"] = w * X[:, j]
        sums = pdf.groupby("fe")[["wc", "w"]].sum()
        m = (sums["wc"] / sums["w"]).to_numpy()
        Xd[:, j] = X[:, j] - m[fe]
    pdf["wc"] = w * y
    sums = pdf.groupby("fe")[["wc", "w"]].sum()
    yd = y - (sums["wc"] / sums["w"]).to_numpy()[fe]
    G = Xd.T @ (Xd * w[:, None])
    bt = np.linalg.solve(G, Xd.T @ (w * yd))
    e = yd - Xd @ bt
    sigma2 = float(w @ (e * e)) / (N - 1000 - 2)
    V = np.linalg.inv(G) * sigma2
    rb = np.abs(res.b[:, 0] - bt).max() / np.abs(bt).max()
    rv = np.abs(res.V[0] - V).max() / np.abs(V).max()
    print(f"wls_within 20M x 1000-level FE: {wall:.1f} s, "
          f"b rel {rb:.1e}, V rel {rv:.1e}, G={res.n_absorbed}")
    assert rb < 1e-9 and rv < 1e-7 and res.n_absorbed == 1000


def stress_qte(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import qte_by

    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 100).alias("g"),
        F.when((F.col("id").cast("long") / 100).cast("long") % 2 == 0,
               "a").otherwise("b").alias("arm"),
        (((F.col("id").cast("long") / 100).cast("long") * 7919) % 1000)
        .cast("double").alias("v"),
    )
    t0 = time.perf_counter()
    out = (
        qte_by(df, "g", "arm", "v", "a", "b", probs=(0.25, 0.9))
        .toPandas().set_index(["g", "p"]).sort_index()
    )
    wall = time.perf_counter() - t0
    i = np.arange(N, dtype=np.int64)
    g = i % 100
    j = i // 100
    arm = np.where(j % 2 == 0, "a", "b")
    v = ((j * 7919) % 1000).astype(np.float64)
    worst = 0.0
    for gi in (0, 99):
        m = g == gi
        a = v[m & (arm == "a")]
        b = v[m & (arm == "b")]
        for p in (0.25, 0.9):
            qa, qb = np.quantile(a, p), np.quantile(b, p)
            r = out.loc[(gi, p)]
            worst = max(worst, abs(r["q_a"] - qa), abs(r["q_b"] - qb),
                        abs(r["qte"] - (qb - qa)))
    print(f"qte_by 20M x 100 groups x 2 probs: {wall:.1f} s, "
          f"worst abs {worst:.1e}")
    assert worst < 1e-9


def stress_dml(spark):
    """dml_plm at 20M rows: theta recovers the structural 1.5 and the
    two-pass plan holds (per-fold moments + one residual-product
    scan); replica comparison runs on closed-form columns."""
    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import dml_plm

    df = spark.range(0, N, 1, 64).select(
        F.col("id"),
        ((F.col("id") % 97) - 48).cast("double").alias("x"),
        (
            0.5 * ((F.col("id") % 97) - 48).cast("double")
            + ((F.col("id") * 7919) % 11).cast("double") - 5.0
        ).alias("d"),
    ).select(
        "id", "x", "d",
        (
            1.5 * F.col("d") + 2.0 * F.col("x")
            + ((F.col("id") * 104729) % 7).cast("double") - 3.0
        ).alias("y"),
    )
    t0 = time.perf_counter()
    row = dml_plm(df, "y", "d", "x", id_col="id", n_folds=2).collect()[0]
    wall = time.perf_counter() - t0
    print(f"dml_plm 20M rows, 2 folds: {wall:.1f} s, "
          f"theta={row['theta']:.6f} (truth 1.5), se={row['se']:.2e}, "
          f"n={row['n_used']}")
    assert abs(row["theta"] - 1.5) < 0.01
    assert row["n_used"] == N


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    if which in ("wlswithin", "all"):
        stress_wls_within(spark)
    if which in ("qte", "all"):
        stress_qte(spark)
    if which in ("dml", "all"):
        stress_dml(spark)


if __name__ == "__main__":
    main()
