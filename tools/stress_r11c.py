"""Round-11 stress, second batch: the new per-group family at 20M
rows vs EXACT replicas. Counts are derived with numpy bincount over
the joint (group, arm/side, value) cells (exact int64), then each
operator's moment/prefix algebra is replayed in exact Python ints
with the same final IEEE expressions.

1. `welch_by`: 100 segments x 2 arms, value = (i div 7) mod 13 —
   every segment's (n, mean, var, t, dof) EXACT vs the cell replica.
2. `ks_by`: 10 segments x 2 sides, value = i mod 997 — every
   segment's (n_a, n_b, d_num, d) EXACT vs the prefix-gap replica.
3. `zscore_by`: 100 groups — 5 sampled rows per group EXACT vs the
   replica's (u - s/n)/sd.
4. `topk_by`: 1000 groups, top-3 by (value, id) — every group's
   picks EXACT vs the closed-form argmax under the same total order.

Usage: python tools/stress_r11c.py [welch|ks|zscore|topk]
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

    return get_spark(app_name="stress_r11c")


def stress_welch():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import welch_by

    spark = _spark()
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 100).alias("seg"),
        F.when(((F.col("id") / 100).cast("long") % 2) == 0, "A")
        .otherwise("B").alias("arm"),
        ((F.col("id") / 7).cast("long") % 13).cast("double").alias("v"),
    )
    t0 = time.time()
    got = {
        r["seg"]: r
        for r in welch_by(df, "seg", "arm", "v", "A", "B").collect()
    }
    dt = time.time() - t0

    ids = np.arange(N, dtype=np.int64)
    seg = ids % 100
    arm = (ids // 100) % 2
    v = (ids // 7) % 13
    cell = (seg * 2 + arm) * 13 + v
    counts = np.bincount(cell, minlength=100 * 2 * 13)
    bad = 0
    for s in range(100):
        st = {}
        for a, tag in ((0, "a"), (1, "b")):
            cs = counts[(s * 2 + a) * 13 : (s * 2 + a) * 13 + 13]
            n = int(cs.sum())
            u = [int(val) * 1_000_000 for val in range(13)]
            ssum = sum(int(c) * u[i] for i, c in enumerate(cs))
            ss = sum(int(c) * u[i] * u[i] for i, c in enumerate(cs))
            mean = float(ssum) / float(n)
            var = float(n * ss - ssum * ssum) / (float(n) * (float(n) - 1.0))
            st[tag] = (n, mean, var)
        na, ma, va = st["a"]
        nb, mb, vb = st["b"]
        s2a, s2b = va / float(na), vb / float(nb)
        t = (ma - mb) / math.sqrt(s2a + s2b)
        dof = (s2a + s2b) * (s2a + s2b) / (
            s2a * s2a / (float(na) - 1.0) + s2b * s2b / (float(nb) - 1.0)
        )
        g = got[s]
        if not (
            g["n_a"] == na and g["n_b"] == nb
            and g["mean_a"] == ma / 1e6 and g["mean_b"] == mb / 1e6
            and g["var_a"] == va / 1e12 and g["var_b"] == vb / 1e12
            and g["t_stat"] == t and g["dof"] == dof
        ):
            bad += 1
    print(f"welch_by 20M x 100 segments: wall={dt:.1f}s mismatches={bad}")
    assert bad == 0
    spark.stop()


def stress_ks():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import ks_by

    spark = _spark()
    df = spark.range(0, N, 1, 64).select(
        (F.col("id") % 10).alias("seg"),
        F.when(((F.col("id") / 10).cast("long") % 2) == 0, "A")
        .otherwise("B").alias("side"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    t0 = time.time()
    got = {
        r["seg"]: r for r in ks_by(df, "seg", "side", "v", "A", "B").collect()
    }
    dt = time.time() - t0

    ids = np.arange(N, dtype=np.int64)
    seg = ids % 10
    side = (ids // 10) % 2
    v = ids % 997
    cell = (seg * 2 + side) * 997 + v
    counts = np.bincount(cell, minlength=10 * 2 * 997).reshape(10, 2, 997)
    bad = 0
    for s in range(10):
        ca = counts[s, 0]
        cb = counts[s, 1]
        na, nb = int(ca.sum()), int(cb.sum())
        cuma = np.cumsum(ca)
        cumb = np.cumsum(cb)
        gaps = np.abs(
            cuma.astype(object) * nb - cumb.astype(object) * na
        )
        d_num = int(max(gaps))
        d = float(d_num) / (float(na) * float(nb))
        g = got[s]
        if not (
            g["n_a"] == na and g["n_b"] == nb
            and int(g["d_num"]) == d_num and g["d"] == d
        ):
            bad += 1
    print(f"ks_by 20M x 10 segments: wall={dt:.1f}s mismatches={bad}")
    assert bad == 0
    spark.stop()


def stress_zscore():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import zscore_by

    spark = _spark()
    df = spark.range(0, N, 1, 64).select(
        F.col("id").alias("i"),
        (F.col("id") % 100).alias("g"),
        ((F.col("id") / 11).cast("long") % 23).cast("double").alias("v"),
    )
    t0 = time.time()
    sample = (
        zscore_by(df, "g", "v")
        .filter(F.col("i") % 4_000_003 == 0)
        .collect()
    )
    dt = time.time() - t0

    ids = np.arange(N, dtype=np.int64)
    g = ids % 100
    v = (ids // 11) % 23
    cell = g * 23 + v
    counts = np.bincount(cell, minlength=100 * 23).reshape(100, 23)
    stats = {}
    for grp in range(100):
        cs = counts[grp]
        n = int(cs.sum())
        u = [int(val) * 1_000_000 for val in range(23)]
        ssum = sum(int(c) * u[i] for i, c in enumerate(cs))
        ss = sum(int(c) * u[i] * u[i] for i, c in enumerate(cs))
        mean = float(ssum) / float(n)
        varnum = float(n * ss - ssum * ssum)
        sd = math.sqrt(varnum / (float(n) * (float(n) - 1.0)))
        stats[grp] = (mean, sd)
    bad = 0
    for r in sample:
        mean, sd = stats[int(r["g"])]
        u = float(int(r["v"]) * 1_000_000)
        if r["z"] != (u - mean) / sd:
            bad += 1
    print(
        f"zscore_by 20M x 100 groups: wall={dt:.1f}s "
        f"sampled={len(sample)} mismatches={bad}"
    )
    assert bad == 0 and len(sample) >= 4
    spark.stop()


def stress_topk():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.groupby import topk_by

    spark = _spark()
    df = spark.range(0, N, 1, 64).select(
        F.col("id").alias("i"),
        (F.col("id") % 1000).alias("g"),
        ((F.col("id") * 2654435761) % 100_000).cast("double").alias("v"),
    )
    t0 = time.time()
    got = {}
    for r in topk_by(df, "g", ["v", "i"], k=3).collect():
        got.setdefault(int(r["g"]), []).append(
            (int(r["rank"]), float(r["v"]), int(r["i"]))
        )
    dt = time.time() - t0

    ids = np.arange(N, dtype=np.int64)
    g = ids % 1000
    v = (ids * 2654435761) % 100_000
    # replica top-3 per group under (v DESC, i DESC): one global
    # lexsort (g asc, v asc, i asc), then each group's slice is
    # contiguous and its top-3 is the slice tail reversed
    order = np.lexsort((ids, v, g))
    g_sorted = g[order]
    bounds = np.searchsorted(g_sorted, np.arange(1001))
    bad = 0
    for grp in range(1000):
        sel = order[bounds[grp] : bounds[grp + 1]][-3:][::-1]
        want = [
            (rk + 1, float(v[j]), int(ids[j])) for rk, j in enumerate(sel)
        ]
        if sorted(got[grp]) != sorted(want):
            bad += 1
    print(f"topk_by 20M x 1000 groups: wall={dt:.1f}s mismatches={bad}")
    assert bad == 0
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("welch", "all"):
        stress_welch()
    if which in ("ks", "all"):
        stress_ks()
    if which in ("zscore", "all"):
        stress_zscore()
    if which in ("topk", "all"):
        stress_topk()
