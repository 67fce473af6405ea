"""Round-8 second-wave stress: the five round-9 PRE-BUILD operators
(funnel, retention_cohorts, assoc_rules, grouped_weighted_quantiles,
changepoint) at 10-20M rows, each verified against an exact replica
(closed-form generator arithmetic or a numpy replay over the same
distributed cells).

Usage: python tools/stress_r8b.py [funnel|retention|assoc|gwq|cp]
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

    return get_spark(app_name="stress_r8b")


def stress_funnel():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.sessions import funnel

    spark = _spark()
    n_users = 2_000_000
    # 10 events per user: type s(seq%3), except users uid%3==0 whose
    # s1 events are renamed away -> they complete exactly 1 step
    ev = spark.range(0, N, 1, 64).select(
        (F.col("id") % n_users).alias("uid"),
        (F.col("id") / n_users).cast("long").alias("t"),
        F.when(
            ((F.col("id") % n_users) % 3 == 0)
            & ((F.col("id") / n_users).cast("long") % 3 == 1),
            F.lit("x"),
        )
        .otherwise(
            F.concat(
                F.lit("s"),
                ((F.col("id") / n_users).cast("long") % 3).cast("string"),
            )
        )
        .alias("typ"),
    )
    t0 = time.time()
    out = funnel(ev, "uid", "t", "typ", ["s0", "s1", "s2"])
    agg = out.groupBy("steps_completed").agg(
        F.count(F.lit(1)).alias("c"),
        F.min("t_1").alias("mn1"),
        F.max("t_1").alias("mx1"),
        F.min("t_3").alias("mn3"),
    ).orderBy("steps_completed").collect()
    wall = time.time() - t0
    got = {int(r["steps_completed"]): int(r["c"]) for r in agg}
    n_blocked = (n_users + 2) // 3  # uids ≡ 0 (mod 3)
    assert got == {1: n_blocked, 3: n_users - n_blocked}, got
    full = [r for r in agg if r["steps_completed"] == 3][0]
    assert (full["mn1"], full["mx1"], full["mn3"]) == (0, 0, 2)
    print(
        f"funnel: {N} events, {n_users} users -> "
        f"{n_users - n_blocked} full conversions / {n_blocked} "
        f"blocked at step 1 (exact) in {wall:.1f}s"
    )


def stress_retention():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.sessions import retention_cohorts

    spark = _spark()
    n_users = 2_000_000
    # user's first bucket = uid%4; active for 10 consecutive buckets,
    # but odd uids stop after 5
    ev = spark.range(0, N, 1, 64).select(
        (F.col("id") % n_users).alias("uid"),
        (F.col("id") / n_users).cast("long").alias("seq"),
    ).filter(
        (F.col("uid") % 2 == 0) | (F.col("seq") < 5)
    ).select(
        "uid",
        (((F.col("uid") % 4) + F.col("seq")) * 10).alias("t"),
    )
    t0 = time.time()
    rows = retention_cohorts(ev, "uid", "t", bucket=10).collect()
    wall = time.time() - t0
    got = {(int(r["cohort"]), int(r["offset"])): r for r in rows}
    # cohorts 0/2 hold only EVEN uids (uid%4 parity) -> full 10
    # offsets; cohorts 1/3 hold only odd uids -> offsets 0-4
    assert len(got) == 30, len(got)
    size = n_users // 4
    for c in range(4):
        n_off = 10 if c % 2 == 0 else 5
        for off in range(n_off):
            r = got[(c, off)]
            assert int(r["cohort_size"]) == size
            assert int(r["n_active"]) == size, (c, off, r)
            assert float(r["retention"]) == 1.0
    print(
        f"retention: ~{N} events, {n_users} users, 30 exact "
        f"(cohort, offset) cells in {wall:.1f}s"
    )


def stress_assoc():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.basket import assoc_rules

    spark = _spark()
    n_baskets = 2_000_000
    # basket b contains: "c" always, "a" iff b%2==0, "b" iff b%3==0,
    # plus 4 filler items f(b%7)..f(b%7+3) -> baskets bounded at 7
    b = spark.range(0, n_baskets, 1, 64)
    parts = [
        b.select(F.col("id").alias("bk"), F.lit("c").alias("it")),
        b.filter(F.col("id") % 2 == 0).select(
            F.col("id").alias("bk"), F.lit("a").alias("it")
        ),
        b.filter(F.col("id") % 3 == 0).select(
            F.col("id").alias("bk"), F.lit("b").alias("it")
        ),
    ]
    for j in range(4):
        parts.append(
            b.select(
                F.col("id").alias("bk"),
                F.concat(
                    F.lit("f"), ((F.col("id") + j) % 7).cast("string")
                ).alias("it"),
            )
        )
    bi = parts[0]
    for p in parts[1:]:
        bi = bi.unionByName(p)
    t0 = time.time()
    rules = assoc_rules(bi, "bk", "it", min_count=100_000).collect()
    wall = time.time() - t0
    got = {(r["antecedent"], r["consequent"]): r for r in rules}
    na = n_baskets // 2
    nb = (n_baskets + 2) // 3
    nab = (n_baskets + 5) // 6  # baskets 0, 6, 12, ...
    r = got[("a", "b")]
    assert (int(r["n_ab"]), int(r["n_a"]), int(r["n_b"])) == (
        nab, na, nb,
    ), r
    assert float(r["lift"]) == nab * float(n_baskets) / (na * nb)
    r2 = got[("a", "c")]
    assert (int(r2["n_ab"]), int(r2["n_b"])) == (na, n_baskets)
    assert float(r2["confidence"]) == 1.0
    print(
        f"assoc: {n_baskets} baskets (~{7 * n_baskets // 1_000_000}M "
        f"basket-item rows), {len(rules)} rules >= 100k support, "
        f"margins exact in {wall:.1f}s"
    )


def stress_gwq():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.rank import grouped_weighted_quantiles

    spark = _spark()
    base = spark.range(0, N, 1, 64).select(
        (F.col("id") % 1000).alias("g"),
        (F.abs(F.hash(F.col("id"), F.lit(13))) % 100).alias("v"),
        (F.col("id") % 5 + 1).alias("w"),
    )
    t0 = time.time()
    rows = grouped_weighted_quantiles(
        base, "g", "v", "w", [10, 50, 90]
    ).collect()
    wall = time.time() - t0
    assert len(rows) == 3000
    # numpy replica for 5 sampled groups from the same cells
    for g in (0, 17, 250, 777, 999):
        cells = (
            base.filter(F.col("g") == g)
            .groupBy("v")
            .agg(F.sum("w").alias("w"))
            .orderBy("v")
            .collect()
        )
        v = np.array([r["v"] for r in cells])
        cw = np.cumsum([int(r["w"]) for r in cells])
        W = cw[-1]
        for p in (10, 50, 90):
            exp = v[np.searchsorted(cw * 100, p * W, side="left")]
            gotr = [
                r for r in rows if r["g"] == g and r["pct"] == p
            ][0]
            assert int(gotr["value"]) == int(exp), (g, p, gotr, exp)
    print(
        f"gwq: {N} rows x 1000 groups x 3 pcts -> {len(rows)} "
        f"quantiles, 5 groups replica-exact in {wall:.1f}s"
    )


def stress_cp():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import changepoint

    spark = _spark()
    n_keys, per_key = 20_000, 1_000
    # planted mean shift of +5.0 at position 200 + key%600
    base = spark.range(0, n_keys * per_key, 1, 64).select(
        (F.col("id") % n_keys).alias("k"),
        (F.col("id") / n_keys).cast("long").alias("t"),
    ).withColumn(
        "v",
        F.when(
            F.col("t") < 200 + F.col("k") % 600, F.lit(1.0)
        ).otherwise(F.lit(6.0)),
    )
    t0 = time.time()
    out = changepoint(base, "k", "t", "v")
    agg = out.agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum(
            (
                F.col("split_order") == (F.lit(199) + F.col("k") % 600)
            ).cast("long")
        ).alias("n_exact"),
        F.max(F.abs(F.col("sse_split"))).alias("max_sse"),
    ).collect()[0]
    wall = time.time() - t0
    assert int(agg["nk"]) == n_keys
    assert int(agg["n_exact"]) == n_keys, agg
    assert float(agg["max_sse"]) < 1e-6
    print(
        f"cp: {n_keys * per_key} rows x {n_keys} keys, all planted "
        f"changepoints recovered exactly (max sse_split "
        f"{float(agg['max_sse']):.1e}) in {wall:.1f}s"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {
        "funnel": stress_funnel,
        "retention": stress_retention,
        "assoc": stress_assoc,
        "gwq": stress_gwq,
        "cp": stress_cp,
    }
    if which == "all":
        for f in fns.values():
            f()
    else:
        fns[which]()
