"""Round-11 stress: the blocked series folds at 100M rows on ONE
key — the hot-key scenario the sequential family's max_series_len
guard fences (VERDICT r10 item 3).

1. `cusum100m`: 100M-row single-key cusum_blocked with integer
   deltas d_i = (i * 2654435761) % 7 - 3 (exact in binary64), 100
   blocks of 1M. Verified BIT-EXACT against the numpy prefix-sum
   identity s_final = ps_n - min_{0<=j<=n} ps_j (exact int64).

2. `boundary`: n = 8,000,000 — EXACTLY the sequential family's
   max_series_len boundary, where both paths are allowed — on one
   key. cusum sequential vs cusum_blocked (8 x 1M blocks) pinned
   BIT-EQUAL on the integer fixture; ewma / holt sequential vs
   blocked on a float series with max rel diff reported (the
   documented re-association envelope, expected ~1e-15/step-count).

3. `ewma100m`: 100M-row single-key ewma_blocked on a CONSTANT
   series (every IEEE step exact: a*c + (1-a)*c = c for dyadic a)
   — result pinned EXACTLY equal to the constant; plus wall time.

Usage: python tools/stress_r11.py [cusum100m|boundary|ewma100m]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r11")


N100 = 100_000_000
NB = 8_000_000  # the sequential family's max_series_len boundary


def _delta_col(F):
    # exact integer deltas in [-3, 3]; id*2654435761 stays < 2^63
    return ((F.col("id") * F.lit(2654435761)) % 7 - 3).cast("double")


def stress_cusum100m():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import cusum_blocked

    spark = _spark()
    df = spark.range(0, N100, 1, 128).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("t"),
        _delta_col(F).alias("v"),
    )
    t0 = time.time()
    row = cusum_blocked(
        df, "k", "t", "v", target=0.0,
        block_len=1_000_000, max_blocks=200,
    ).collect()[0]
    dt = time.time() - t0
    # numpy replica: s_final = ps_n - min(0, running min of ps)
    ids = np.arange(N100, dtype=np.int64)
    d = (ids * 2654435761) % 7 - 3
    ps = np.cumsum(d)
    s_final = float(ps[-1] - min(0, ps.min()))
    ok = row["cusum"] == s_final and row["n"] == N100
    print(
        f"cusum100m: n={row['n']} spark={row['cusum']!r} "
        f"numpy={s_final!r} BIT-EXACT={ok} wall={dt:.1f}s"
    )
    assert ok
    spark.stop()


def stress_boundary():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import (
        cusum,
        cusum_blocked,
        ewma,
        ewma_blocked,
        holt,
        holt_blocked,
    )

    spark = _spark()
    base = spark.range(0, NB, 1, 64)

    # integer cusum: bit-equality at the boundary
    dfi = base.select(
        F.lit("hot").alias("k"),
        F.col("id").alias("t"),
        _delta_col(F).alias("v"),
    )
    t0 = time.time()
    seq = cusum(dfi, "k", "t", "v", 0.0, max_series_len=NB).collect()[0]
    t_seq = time.time() - t0
    t0 = time.time()
    blk = cusum_blocked(
        dfi, "k", "t", "v", 0.0, block_len=1_000_000, max_blocks=16
    ).collect()[0]
    t_blk = time.time() - t0
    print(
        f"boundary cusum 8M: seq={seq['cusum']!r} ({t_seq:.1f}s) "
        f"blk={blk['cusum']!r} ({t_blk:.1f}s) "
        f"BIT-EQUAL={seq['cusum'] == blk['cusum']}"
    )
    assert seq["cusum"] == blk["cusum"]

    # float ewma/holt: re-association envelope at the boundary
    dff = base.select(
        F.lit("hot").alias("k"),
        F.col("id").alias("t"),
        (F.sin(F.col("id").cast("double") * 0.001) * 5.0).alias("v"),
    )
    t0 = time.time()
    e_seq = ewma(dff, "k", "t", "v", 0.3, max_series_len=NB).collect()[0]
    t_es = time.time() - t0
    t0 = time.time()
    e_blk = ewma_blocked(
        dff, "k", "t", "v", 0.3, block_len=1_000_000, max_blocks=16
    ).collect()[0]
    t_eb = time.time() - t0
    rel_e = abs(e_seq["ewma"] - e_blk["ewma"]) / max(1e-300, abs(e_seq["ewma"]))
    print(
        f"boundary ewma 8M: seq={e_seq['ewma']!r} ({t_es:.1f}s) "
        f"blk={e_blk['ewma']!r} ({t_eb:.1f}s) rel={rel_e:.2e}"
    )
    assert rel_e < 1e-12

    t0 = time.time()
    h_seq = holt(dff, "k", "t", "v", 0.4, 0.2, max_series_len=NB).collect()[0]
    t_hs = time.time() - t0
    t0 = time.time()
    h_blk = holt_blocked(
        dff, "k", "t", "v", 0.4, 0.2, block_len=1_000_000, max_blocks=16
    ).collect()[0]
    t_hb = time.time() - t0
    rels = [
        abs(h_seq[c] - h_blk[c]) / max(1e-300, abs(h_seq[c]))
        for c in ("level", "trend", "forecast")
    ]
    print(
        f"boundary holt 8M: seq=({h_seq['level']!r},{h_seq['trend']!r}) "
        f"({t_hs:.1f}s) blk=({h_blk['level']!r},{h_blk['trend']!r}) "
        f"({t_hb:.1f}s) max_rel={max(rels):.2e}"
    )
    assert max(rels) < 1e-10
    spark.stop()


def stress_ewma100m():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import ewma_blocked

    spark = _spark()
    c = 3.1416015625  # dyadic constant: a*c + (1-a)*c == c exactly
    df = spark.range(0, N100, 1, 128).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("t"),
        F.lit(c).alias("v"),
    )
    t0 = time.time()
    # default block_len (2^18): ~382 blocks; 1M blocks OOMed the
    # 16 GiB local JVM at 32-way concurrency (see the blocked-family
    # memory-sizing note in stats.py)
    row = ewma_blocked(
        df, "k", "t", "v", 0.5, block_len=262_144, max_blocks=400
    ).collect()[0]
    dt = time.time() - t0
    ok = row["ewma"] == c and row["n"] == N100
    print(
        f"ewma100m: n={row['n']} spark={row['ewma']!r} const={c!r} "
        f"EXACT={ok} wall={dt:.1f}s"
    )
    assert ok
    spark.stop()


def stress_holt100m():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import holt_blocked

    spark = _spark()
    c = 3.1416015625  # dyadic constant; alpha = gamma = 0.5
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
    # constant series: level = c, trend = 0 in exact arithmetic; the
    # blocked composition re-associates, so assert at 1e-12 rel
    rel_l = abs(row["level"] - c) / c
    ok = rel_l < 1e-12 and abs(row["trend"]) < 1e-9 and row["n"] == N100
    print(
        f"holt100m: n={row['n']} level={row['level']!r} "
        f"trend={row['trend']!r} rel_l={rel_l:.1e} ok={ok} "
        f"wall={dt:.1f}s"
    )
    assert ok
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("cusum100m", "all"):
        stress_cusum100m()
    if which in ("boundary", "all"):
        stress_boundary()
    if which in ("ewma100m", "all"):
        stress_ewma100m()
    if which == "all":
        print(
            "holt100m: SKIPPED from the all-path — needs a 48 GiB"
            " driver heap (SPARK_DRIVER_MEM=48g); run"
            " `SPARK_DRIVER_MEM=48g python tools/stress_r11.py"
            " holt100m` explicitly (see SCALE.md)"
        )
    if which in ("holt100m",):
        stress_holt100m()
