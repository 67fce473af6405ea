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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("holt100m_lean", "all"):
        stress_holt100m_lean()
    if which in ("hw100m", "all"):
        stress_hw100m()
    if which in ("hw20m", "all"):
        stress_hw20m()
