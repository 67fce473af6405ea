"""Round-12 stress: the redesigned blocked Holt family at 100M rows
on ONE key (VERDICT r11 items 4 and 5).

1. `holt100m_lean`: holt_blocked after the r12 redesign (2-field
   offset fold + lens-snapshot linear-map table) on the identical
   r11 fixture (constant dyadic series, alpha=gamma=0.5). Target:
   a 16 GiB heap — where the retired 6-field fold needed 48 GiB.
   Run with SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=16: at 32
   concurrent task slots per 16 GiB JVM the unified pool is
   oversubscribed for the whole blocked family (scalar ewma sits at
   the same edge); 16 slots is the executor-cores knob any real
   cluster sets per-executor.

2. `hw100m`: holt_winters_blocked (period 4, alpha=gamma=delta=0.5)
   at 100M rows / ONE key — the seasonal state is 6-dimensional, so
   this is the scale proof for the K-vector composition. Constant
   dyadic series: level == c, trend == 0, season == 0 in exact
   arithmetic; blocked re-association asserted at 1e-12 rel.

3. `hw20m`: holt_winters_blocked at 20M rows x 100 keys on a
   sinusoidal+seasonal series vs the sequential holt_winters
   (which still fits at this scale) — max rel diff reported, the
   documented re-association envelope.

Usage: python tools/stress_r12.py [holt100m_lean|hw100m|hw20m]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r12")


N100 = 100_000_000


def stress_holt100m_lean():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import holt_blocked

    spark = _spark()
    c = 3.1416015625
    df = spark.range(0, N100, 1, 128).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("t"),
        F.lit(c).alias("v"),
    )
    t0 = time.time()
    row = holt_blocked(
        df, "k", "t", "v", 0.5, 0.5,
        block_len=262_144, max_blocks=400,
    ).collect()[0]
    dt = time.time() - t0
    rel_l = abs(row["level"] - c) / c
    ok = rel_l < 1e-12 and abs(row["trend"]) < 1e-9 and row["n"] == N100
    print(
        f"holt100m_lean: n={row['n']} level={row['level']!r} "
        f"trend={row['trend']!r} rel_l={rel_l:.1e} ok={ok} "
        f"wall={dt:.1f}s"
    )
    assert ok
    spark.stop()


def stress_hw100m():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import holt_winters_blocked

    spark = _spark()
    c = 3.1416015625
    df = spark.range(0, N100, 1, 128).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("t"),
        F.lit(c).alias("v"),
    )
    t0 = time.time()
    row = holt_winters_blocked(
        df, "k", "t", "v", 4, 0.5, 0.5, 0.5,
        block_len=262_144, max_blocks=400,
    ).collect()[0]
    dt = time.time() - t0
    rel_l = abs(row["level"] - c) / c
    ok = (
        rel_l < 1e-12
        and abs(row["trend"]) < 1e-9
        and abs(row["season"]) < 1e-9
        and row["n"] == N100
    )
    print(
        f"hw100m: n={row['n']} level={row['level']!r} "
        f"trend={row['trend']!r} season={row['season']!r} "
        f"rel_l={rel_l:.1e} ok={ok} wall={dt:.1f}s"
    )
    assert ok
    spark.stop()


def stress_hw20m():
    import math

    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import (
        holt_winters,
        holt_winters_blocked,
    )

    spark = _spark()
    n, keys, m = 20_000_000, 100, 4
    per = n // keys
    df = spark.range(0, n, 1, 64).select(
        (F.col("id") % keys).alias("k"),
        (F.col("id") / F.lit(keys)).cast("long").alias("t"),
        (
            F.lit(10.0)
            + F.sin(F.col("id").cast("double") * F.lit(0.001))
            + F.lit(2.0)
            * F.sin(
                (F.col("id") / F.lit(keys)).cast("long").cast("double")
                % F.lit(float(m))
                * F.lit(2.0 * math.pi / m)
            )
        ).alias("v"),
    )
    t0 = time.time()
    seq = {
        r["k"]: r
        for r in holt_winters(
            df, "k", "t", "v", m, 0.3, 0.2, 0.25,
            max_series_len=per,
        ).collect()
    }
    t1 = time.time()
    blk = {
        r["k"]: r
        for r in holt_winters_blocked(
            df, "k", "t", "v", m, 0.3, 0.2, 0.25,
            block_len=65_536, max_blocks=10,
        ).collect()
    }
    t2 = time.time()
    worst = 0.0
    for k in seq:
        for fld in ("level", "trend", "season", "forecast"):
            s, b = seq[k][fld], blk[k][fld]
            worst = max(worst, abs(s - b) / max(1.0, abs(s)))
    ok = len(seq) == keys == len(blk) and worst < 1e-9
    print(
        f"hw20m: keys={len(blk)} seq_wall={t1 - t0:.1f}s "
        f"blk_wall={t2 - t1:.1f}s max_rel={worst:.1e} ok={ok}"
    )
    assert ok
    spark.stop()


def stress_mw20m():
    """mann_whitney_by at 20M rows x 100 groups, EXACT vs a pure-
    Python replica. Fixture decorrelation (the r10/r11 modulus
    lesson): with j = i div 100, arm = j mod 2 and v = (j div 2)
    mod 97 are independent of the group i mod 100, and every group
    has the IDENTICAL (arm, value) histogram -- computed once in
    Python, checked against all 100 groups."""
    import collections
    import math as _m
    import time as _t

    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import mann_whitney_by

    spark = _spark()
    n, keys, mod = 20_000_000, 100, 97
    j = (F.col("id") / F.lit(keys)).cast("long")
    df = spark.range(0, n, 1, 64).select(
        (F.col("id") % keys).alias("g"),
        F.when(j % 2 == 0, F.lit("A")).otherwise(F.lit("B")).alias(
            "arm"
        ),
        ((j / F.lit(2)).cast("long") % mod).cast("double").alias("v"),
    )
    t0 = _t.time()
    got = {
        r["g"]: r
        for r in mann_whitney_by(df, "g", "arm", "v", "A", "B").collect()
    }
    dt = _t.time() - t0
    per = n // keys
    ca = collections.Counter()
    cb = collections.Counter()
    for jj in range(per):
        (ca if jj % 2 == 0 else cb)[(jj // 2) % mod] += 1
    vals = sorted(set(ca) | set(cb))
    before, r2 = 0, {}
    for v in vals:
        c = ca[v] + cb[v]
        r2[v] = 2 * before + c + 1
        before += c
    n_a, n_b = sum(ca.values()), sum(cb.values())
    u2 = sum(r2[v] * ca[v] for v in ca) - n_a * (n_a + 1)
    t3 = sum((ca[v] + cb[v]) ** 3 - (ca[v] + cb[v]) for v in vals)
    nn = n_a + n_b
    var = n_a * n_b / 12.0 * ((nn + 1.0) - t3 / (nn * (nn - 1.0)))
    zr = (u2 - n_a * n_b) / (2.0 * _m.sqrt(var))
    worst = 0.0
    assert len(got) == keys
    for g, row in got.items():
        assert row["n_a"] == n_a and row["n_b"] == n_b, g
        assert row["u2_a"] == float(u2), (g, row["u2_a"], u2)
        worst = max(worst, abs(row["z"] - zr))
    ok = worst == 0.0
    print(
        f"mw20m: groups={len(got)} u2_exact=True "
        f"worst_z_absdiff={worst:.1e} wall={dt:.1f}s ok={ok}"
    )
    assert ok
    spark.stop()


def stress_bh20m():
    """bh_fdr at 20M p-values EXACT vs a numpy replica: same
    quadratic residue p's as the registered query, q=0.05."""
    import time as _t

    import numpy as np
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import bh_fdr

    spark = _spark()
    n = 20_000_000
    pe = ((F.col("id") * 7919) % 100_000).cast("double") / F.lit(
        100_000.0
    )
    df = spark.range(0, n, 1, 64).select(
        F.col("id"), (pe * pe).alias("p")
    )
    t0 = _t.time()
    out = bh_fdr(df, "p", ["id"], q=0.05)
    n_rej, k_max = out.agg(
        F.sum(F.col("rejected").cast("long")),
        F.max(F.when(F.col("rejected"), F.col("rank"))),
    ).collect()[0]
    dt = _t.time() - t0
    ids = np.arange(n, dtype=np.int64)
    base = ((ids * 7919) % 100_000).astype(np.float64) / 100_000.0
    p = np.sort(base * base)
    i = np.arange(1, n + 1, dtype=np.float64)
    sat = np.nonzero(p <= i * 0.05 / float(n))[0]
    k = int(sat[-1] + 1) if len(sat) else 0
    ok = int(n_rej) == k and (k_max or 0) == k
    print(f"bh20m: k={k} n_rejected={n_rej} wall={dt:.1f}s ok={ok}")
    assert ok
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("holt100m_lean", "all"):
        stress_holt100m_lean()
    if which in ("hw100m", "all"):
        stress_hw100m()
    if which in ("hw20m", "all"):
        stress_hw20m()
    if which in ("mw20m", "all"):
        stress_mw20m()
    if which in ("bh20m", "all"):
        stress_bh20m()
