"""Round-8 stress: the five newly registered operators that lacked
SCALE.md Measured rows (VERDICT r7 item 5).

1. `bm25`: Okapi BM25 over 4M synthetic docs (~40M token rows after
   explode) against a 3-term bag query with a repeated term. tf, df,
   |d|, N are all arithmetic functions of doc_id, so 1,000 sampled
   docs are verified against an exact numpy replica of the formula.

2. `split`: best_split over 20M rows with 100k distinct feature
   levels and a planted threshold at 50,000 flipped by 5% label
   noise — the operator's argmax must match a numpy replica computed
   from the SAME distributed cell table (prefix sums + identical
   IEEE expression order).

3. `mi`: mutual_information over 20M rows with a 50x40 deterministic
   joint — per-cell counts are exact by construction; every mi_term
   is re-derived in numpy from the collected counts and must match.

4. `seasonal`: seasonal_decompose over 20M rows (20k keys x 1,000
   points, period 7) with value = linear trend + zero-mean planted
   phase pattern — the centered MA reproduces the trend EXACTLY on
   this construction, so max |resid| must stay at fixed-point
   rounding scale (~1e-5) across all ~19.9M full-window rows.

5. `km_by`: stratified Kaplan-Meier over 20M subjects in 3 cohorts
   with 3,000 distinct durations (9,000 cells) — each stratum's
   curve must be bit-identical to a Python replay of the
   product-limit recurrence from the same cells (the `_km_curve` op
   sequence).

Usage: python tools/stress_r8.py [bm25|split|mi|seasonal|km_by]
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

    return get_spark(app_name="stress_r8")


def stress_bm25():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.text import bm25_scores

    spark = _spark()
    n_docs = 4_000_000
    # text: 8 filler tokens + "alpha" on id%4==0 + "beta beta" on
    # id%10==0 -> tf/df/dl are closed-form in id
    docs = spark.range(0, n_docs, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("f1 f2 f3 f4 f5 f6 f7 f8"),
            F.when(F.col("id") % 4 == 0, F.lit(" alpha")).otherwise(
                F.lit("")
            ),
            F.when(F.col("id") % 10 == 0, F.lit(" beta beta")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    t0 = time.time()
    out = bm25_scores(docs, ["alpha", "beta", "alpha"])
    got = {
        int(r["doc_id"]): (float(r["score"]), int(r["n_hit_terms"]))
        for r in out.filter(F.col("doc_id") < 2000).collect()
    }
    n_hits = out.count()
    wall = time.time() - t0

    # exact replica from the generator arithmetic
    n = n_docs
    df_a = n // 4
    df_b = n // 10
    tot_dl = 8 * n + df_a + 2 * df_b
    avgdl = tot_dl / n
    k1, b = 1.2, 0.75

    def term(qtf, tf, dfc, dl):
        idf = math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
        return qtf * idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / avgdl)
        )

    n_checked = 0
    for i in range(2000):
        has_a, has_b = i % 4 == 0, i % 10 == 0
        if not (has_a or has_b):
            assert i not in got, i
            continue
        dl = 8 + (1 if has_a else 0) + (2 if has_b else 0)
        exp = 0.0
        hits = 0
        if has_a:
            exp += term(2, 1, df_a, dl)
            hits += 1
        if has_b:
            exp += term(1, 2, df_b, dl)
            hits += 1
        score, nh = got[i]
        assert nh == hits, (i, nh, hits)
        assert abs(score - exp) < 1e-9 * max(1.0, abs(exp)), (
            i, score, exp,
        )
        n_checked += 1
    exp_hits = df_a + df_b - n // 20  # inclusion-exclusion
    assert n_hits == exp_hits, (n_hits, exp_hits)
    print(
        f"bm25: {n_docs} docs (~{8*n_docs//1_000_000}M+ token rows), "
        f"{n_hits} scored docs, {n_checked} docs formula-verified "
        f"in {wall:.1f}s"
    )


def stress_split():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import best_split

    spark = _spark()
    base = spark.range(0, N, 1, 64).select(
        (F.abs(F.hash(F.col("id"), F.lit(11))) % 100_000).alias("v"),
        (
            (F.abs(F.hash(F.col("id"), F.lit(11))) % 100_000 > 50_000)
            != (F.col("id") % 20 == 0)
        ).alias("y"),
    )
    t0 = time.time()
    row = best_split(base, "v", "y").collect()[0]
    wall = time.time() - t0

    # numpy replica from the SAME distributed cells (exact counts)
    cells = (
        base.groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("y").cast("long")).alias("p"),
        )
        .orderBy("v")
        .collect()
    )
    v = np.array([r["v"] for r in cells], dtype=np.int64)
    cc = np.cumsum([r["c"] for r in cells]).astype(np.float64)
    cp = np.cumsum([r["p"] for r in cells]).astype(np.float64)
    n, p = cc[-1], cp[-1]
    keep = cc < n
    nl, pl = cc[keep], cp[keep]
    nr, pr = n - nl, p - pl
    gini_l = 2.0 * (pl / nl) * (1.0 - pl / nl)
    gini_r = 2.0 * (pr / nr) * (1.0 - pr / nr)
    child = (nl / n) * gini_l + (nr / n) * gini_r
    parent = 2.0 * (p / n) * (1.0 - p / n)
    gain = parent - child
    best = int(np.argmax(gain))  # numpy argmax = first max = min v
    assert int(row["threshold"]) == int(v[keep][best]), (
        row["threshold"], v[keep][best],
    )
    assert abs(float(row["gain"]) - float(gain[best])) < 1e-15
    assert 49_000 <= int(row["threshold"]) <= 51_000, row["threshold"]
    print(
        f"split: {N} rows, {len(cells)} candidate thresholds, "
        f"best={int(row['threshold'])} gain={row['gain']:.6f} "
        f"in {wall:.1f}s (replica exact)"
    )


def stress_mi():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import mutual_information

    spark = _spark()
    base = spark.range(0, N, 1, 64).select(
        (F.col("id") % 50).alias("a"),
        ((F.col("id") * 7 + 3) % 40).alias("b"),
    )
    t0 = time.time()
    rows = mutual_information(base, "a", "b").collect()
    wall = time.time() - t0
    assert len(rows) <= 2000
    nt = rows[0]["n_tot"]
    assert nt == N
    s = 0.0
    for r in rows:
        nab, na, nb = r["n_ab"], r["n_a"], r["n_b"]
        exp = (nab / nt) * math.log2((nt * nab) / (na * nb))
        assert abs(float(r["mi_term"]) - exp) < 1e-12, r
        s += exp
    assert sum(r["n_ab"] for r in rows) == N
    print(
        f"mi: {N} rows -> {len(rows)} cells, MI={s:.6f} bits, "
        f"all terms replica-exact in {wall:.1f}s"
    )


def stress_seasonal():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import seasonal_decompose

    spark = _spark()
    n_keys, per_key = 20_000, 1_000
    # zero-mean 7-phase pattern (sums to 0 exactly in fixed point)
    pat = [3.0, -1.0, 2.0, -2.5, 0.5, -1.5, -0.5]
    pat_col = F.array(*[F.lit(x) for x in pat])
    base = spark.range(0, n_keys * per_key, 1, 64).select(
        (F.col("id") % n_keys).alias("k"),
        (F.col("id") / n_keys).cast("long").alias("t"),
    )
    base = base.withColumn(
        "v",
        F.col("t") * 0.25
        + F.element_at(pat_col, (F.col("t") % 7 + 1).cast("int")),
    )
    t0 = time.time()
    out = seasonal_decompose(base, "k", "t", "v", period=7)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.abs(F.col("resid"))).alias("mr"),
        F.max(
            F.abs(F.col("seasonal") - F.element_at(
                pat_col, (F.col("t") % 7 + 1).cast("int")
            ))
        ).alias("ms"),
    ).collect()[0]
    wall = time.time() - t0
    assert agg["n"] == n_keys * (per_key - 6), agg["n"]
    assert float(agg["mr"]) < 1e-4, agg["mr"]
    assert float(agg["ms"]) < 1e-4, agg["ms"]
    print(
        f"seasonal: {n_keys * per_key} rows, {agg['n']} full-window "
        f"rows, max|resid|={float(agg['mr']):.2e}, max seasonal "
        f"error={float(agg['ms']):.2e} in {wall:.1f}s"
    )


def stress_km_by():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import kaplan_meier_by

    spark = _spark()
    subj = spark.range(0, N, 1, 64).select(
        (F.col("id") % 3).alias("g"),
        (F.abs(F.hash(F.col("id"), F.lit(7))) % 3000).alias("t"),
        (F.col("id") % 5 != 0).alias("ev"),
    )
    t0 = time.time()
    rows = kaplan_meier_by(subj, "g", "t", "ev", max_cells=20_000).collect()
    wall = time.time() - t0

    cells = (
        subj.groupBy("g", "t")
        .agg(
            F.sum(F.col("ev").cast("long")).alias("d"),
            F.sum((~F.col("ev")).cast("long")).alias("c"),
        )
        .collect()
    )
    by_g: dict = {}
    for r in cells:
        by_g.setdefault(int(r["g"]), []).append(
            (int(r["t"]), int(r["d"]), int(r["c"]))
        )
    expect = {}
    for g, cs in by_g.items():
        cs.sort()
        n_risk = sum(d + c for _, d, c in cs)
        s = 1.0
        for t, d, c in cs:
            s = s * (1.0 - d / n_risk)
            expect[(g, t)] = (n_risk, d, c, s)
            n_risk -= d + c
    assert len(rows) == len(expect)
    for r in rows:
        nr, d, c, s = expect[(int(r["g"]), int(r["t"]))]
        assert (int(r["n_risk"]), int(r["d"]), int(r["c"])) == (nr, d, c)
        assert float(r["s"]) == s, (r, s)  # bit-identical op sequence
    print(
        f"km_by: {N} subjects, 3 strata x ~3000 cells -> "
        f"{len(rows)} curve rows, all bit-identical to the replica "
        f"in {wall:.1f}s"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {
        "bm25": stress_bm25,
        "split": stress_split,
        "mi": stress_mi,
        "seasonal": stress_seasonal,
        "km_by": stress_km_by,
    }
    if which == "all":
        for f in fns.values():
            f()
    else:
        fns[which]()
