"""Round-11 adversarial SKEW stress (VERDICT r10 item 6): the
per-group eval family (`auc_by`, `gini_by`, `spearman_by`) rides
GROUP-PARTITIONED window prefix sums — parallel across groups, but a
single group lands in ONE task. Fixture: 20M rows, 99% in one hot
group, the rest spread over 99 cold groups.

Measurement: wall time on the skewed fixture vs the SAME 20M rows
rebalanced over 100 equal groups (the fair baseline for "does the
hot group cliff").

Correctness: the hot group's statistic is cross-checked EXACTLY
(== on floats) against the GLOBAL operator (`auc_score`, `gini`,
`spearman_corr`) run on the hot subset — a different execution path
(distributed prefix sums over distinct values, no per-group window),
but the identical exact-integer algebra, so any divergence is a bug,
not noise.

Usage: python tools/stress_r11b.py [auc|gini|spearman]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r11b")


N = 20_000_000


def _fixture(spark, skewed: bool):
    from pyspark.sql import functions as F

    base = spark.range(0, N, 1, 64)
    if skewed:
        # 99% of rows -> group 'hot'; 1% spread over g0..g98
        g = F.when(
            (F.col("id") % 100) < 99, F.lit("hot")
        ).otherwise(F.concat(F.lit("g"), (F.col("id") % 9900 / 100).cast("long")))
    else:
        g = F.concat(F.lit("g"), (F.col("id") % 100).cast("long"))
    return base.select(
        g.alias("grp"),
        ((F.col("id") % 3 == 0).cast("long")).alias("y"),
        (F.col("id") % 997).cast("double").alias("score"),
        ((F.col("id") * 7919) % 10000).cast("double").alias("mass"),
        (F.col("id") % 977).cast("double").alias("x"),
        ((F.col("id") * 31) % 983).cast("double").alias("yv"),
    )


def _timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s")
    return out, dt


def stress_auc():
    from hdfe_spark.operators.stats import auc_by, auc_score

    spark = _spark()
    skew, bal = _fixture(spark, True), _fixture(spark, False)
    rs, t_skew = _timed(
        "auc_by skewed 20M (99% hot)",
        lambda: {r["grp"]: r["auc"] for r in auc_by(skew, "grp", "y", "score").collect()},
    )
    _, t_bal = _timed(
        "auc_by balanced 20M (100 groups)",
        lambda: auc_by(bal, "grp", "y", "score").count(),
    )
    hot_global = auc_score(
        skew.filter(skew["grp"] == "hot"), "y", "score"
    ).collect()[0]["auc"]
    ok = rs["hot"] == hot_global
    print(
        f"auc hot-group cross-check: by={rs['hot']!r} "
        f"global={hot_global!r} EXACT={ok} "
        f"skew/balanced={t_skew / max(t_bal, 1e-9):.2f}x"
    )
    assert ok
    spark.stop()


def stress_gini():
    from hdfe_spark.operators.stats import gini, gini_by

    spark = _spark()
    skew, bal = _fixture(spark, True), _fixture(spark, False)
    rs, t_skew = _timed(
        "gini_by skewed 20M (99% hot)",
        lambda: {r["grp"]: r["gini"] for r in gini_by(skew, "grp", "mass").collect()},
    )
    _, t_bal = _timed(
        "gini_by balanced 20M (100 groups)",
        lambda: gini_by(bal, "grp", "mass").count(),
    )
    hot_global = gini(
        skew.filter(skew["grp"] == "hot"), "mass"
    ).collect()[0]["gini"]
    ok = rs["hot"] == hot_global
    print(
        f"gini hot-group cross-check: by={rs['hot']!r} "
        f"global={hot_global!r} EXACT={ok} "
        f"skew/balanced={t_skew / max(t_bal, 1e-9):.2f}x"
    )
    assert ok
    spark.stop()


def stress_spearman():
    from hdfe_spark.operators.stats import spearman_by, spearman_corr

    spark = _spark()
    skew, bal = _fixture(spark, True), _fixture(spark, False)
    rs, t_skew = _timed(
        "spearman_by skewed 20M (99% hot)",
        lambda: {r["grp"]: r["rho"] for r in spearman_by(skew, "grp", "x", "yv").collect()},
    )
    _, t_bal = _timed(
        "spearman_by balanced 20M (100 groups)",
        lambda: spearman_by(bal, "grp", "x", "yv").count(),
    )
    hot_global = spearman_corr(
        skew.filter(skew["grp"] == "hot"), "x", "yv"
    ).collect()[0]["rho"]
    # NOT bit-equal by design: spearman_by's den comes from the
    # EXACT decimal moments (the r10-advice fix) while
    # spearman_corr spells the double-difference expression — each
    # matches its own oracle; they agree to ~1 ulp (measured
    # 3e-16 rel at 19.8M rows)
    rel = abs(rs["hot"] - hot_global) / max(1e-300, abs(hot_global))
    print(
        f"spearman hot-group cross-check: by={rs['hot']!r} "
        f"global={hot_global!r} rel={rel:.1e} "
        f"skew/balanced={t_skew / max(t_bal, 1e-9):.2f}x"
    )
    assert rel < 1e-12
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("auc", "all"):
        stress_auc()
    if which in ("gini", "all"):
        stress_gini()
    if which in ("spearman", "all"):
        stress_spearman()
