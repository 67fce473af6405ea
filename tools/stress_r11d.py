"""Round-11 stress, third batch: the retrieval-eval trio at 20M
rows — 2M queries x 10 ranked docs, relevance DERIVED so every
metric has a closed form (the joint-residue discipline):

doc j of query q scores 10 - j (rank = j + 1, unique id tiebreak);
rel = 1 iff j == q mod 11 — so queries with q mod 11 <= 9 have
exactly ONE relevant doc at a known rank, and q mod 11 == 10
queries have none.

1. `mrr`: rr_sum_q = sum over residues r in 0..9 of
   count(q: q mod 11 == r) * round(2^30 / (r + 1)) — exact integer
   closed form, one summary row checked EXACTLY.
2. `avg_precision_by`: per-query ap_num = 2520 / rank for hit
   queries, 0 else — checked EXACTLY as grouped (n_rel, ap_num)
   histograms (collecting 2M rows is the anti-pattern the operators
   avoid; the histogram is the exact fingerprint).
3. `recall_at_k_by`: per-query (n_rel, n_hit) histogram EXACT.

Usage: python tools/stress_r11d.py [mrr|ap|recall]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NQ = 2_000_000
NDOC = 10
N = NQ * NDOC


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r11d")


def _fixture(spark):
    from pyspark.sql import functions as F

    base = spark.range(0, N, 1, 64)
    q = (F.col("id") / NDOC).cast("long")
    j = F.col("id") % NDOC
    return base.select(
        q.alias("q"),
        F.col("id").alias("doc"),
        (F.lit(float(NDOC)) - j.cast("double")).alias("s"),
        (j == (q % 11)).cast("long").alias("rel"),
    )


def _residue_counts():
    # count of q in [0, NQ) with q mod 11 == r
    return [NQ // 11 + (1 if r < NQ % 11 else 0) for r in range(11)]


def stress_mrr():
    from hdfe_spark.operators.ml import mrr

    spark = _spark()
    df = _fixture(spark)
    t0 = time.time()
    row = mrr(df, "q", "doc", "s", "rel", k=10).collect()[0]
    dt = time.time() - t0
    cnt = _residue_counts()
    rr_sum = sum(cnt[r] * round((1 << 30) / (r + 1)) for r in range(10))
    n_hit = sum(cnt[:10])
    want_mrr = float(rr_sum) / (float(1 << 30) * float(NQ))
    ok = (
        row["n_queries"] == NQ and row["n_hit"] == n_hit
        and row["rr_sum_q"] == rr_sum and row["mrr"] == want_mrr
    )
    print(
        f"mrr 20M (2M queries): rr_sum={row['rr_sum_q']} "
        f"mrr={row['mrr']:.6f} EXACT={ok} wall={dt:.1f}s"
    )
    assert ok
    spark.stop()


def stress_ap():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import avg_precision_by

    spark = _spark()
    df = _fixture(spark)
    t0 = time.time()
    hist = {
        (r["n_rel"], r["ap_num"]): r["c"]
        for r in avg_precision_by(df, "q", "doc", "s", "rel", k=10)
        .groupBy("n_rel", "ap_num")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }
    dt = time.time() - t0
    cnt = _residue_counts()
    want = {(1, 2520 // (r + 1)): cnt[r] for r in range(10)}
    want[(0, 0)] = cnt[10]
    ok = hist == want
    print(
        f"avg_precision 20M: {len(hist)} histogram cells "
        f"EXACT={ok} wall={dt:.1f}s"
    )
    assert ok
    spark.stop()


def stress_recall():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import recall_at_k_by

    spark = _spark()
    df = _fixture(spark)
    t0 = time.time()
    hist = {
        (r["n_rel"], r["n_hit"]): r["c"]
        for r in recall_at_k_by(df, "q", "doc", "s", "rel", k=5)
        .groupBy("n_rel", "n_hit")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }
    dt = time.time() - t0
    cnt = _residue_counts()
    # k = 5: hit iff the relevant rank r+1 <= 5, i.e. r in 0..4
    want = {
        (1, 1): sum(cnt[:5]),
        (1, 0): sum(cnt[5:10]),
        (0, 0): cnt[10],
    }
    ok = hist == want
    print(
        f"recall_at_k 20M (k=5): {hist} EXACT={ok} wall={dt:.1f}s"
    )
    assert ok
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("mrr", "all"):
        stress_mrr()
    if which in ("ap", "all"):
        stress_ap()
    if which in ("recall", "all"):
        stress_recall()
