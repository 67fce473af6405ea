"""Round-10 stress, second batch: kruskal_wallis / auc_by /
cohen_kappa / brier_score / silhouette_fixed at 20M rows, each vs a
CLOSED-FORM Python replica (bigint/IEEE, never the operator's own
output). Modulus correlations are used DELIBERATELY here (the
r10c cuped lesson): each generator's joint structure is derived in
the replica, not assumed independent.

1. `kruskal_wallis`: v = i mod 1000, g = v mod 2 — the two groups
   own disjoint value sets (even/odd), so every rank sum is an
   arithmetic-series closed form.
2. `auc_by`: 1000 groups, score index s = (i div 1000) mod 100
   (independent of the group BY CONSTRUCTION — i mod 100 is constant
   within a group since 100 | 1000), label y = s mod 2 — positives
   own the odd scores; identical exact AUC per group.
3. `cohen_kappa`: y = i mod 3, p = y except every 5th row — counts
   by CRT over mod 15 (N mod 15 != 0: the first residues carry one
   extra row, derived not assumed).
4. `brier_score`: p = (i mod 100)/100, y = i mod 2 — the quantized
   term sum is a 100-residue closed form (i mod 100 determines y).
5. `silhouette_fixed`: rows cycle over 4 fixed 4-d templates
   against 2 centroids — per-template s replicated with the same
   IEEE op sequence.

Usage: python tools/stress_r10d.py [kruskal|auc|kappa|brier|sil]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r10d")


N = 20_000_000


def stress_kruskal():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import kruskal_wallis

    spark = _spark()
    M = 1000
    rows = spark.range(0, N, 1, 64).select(
        ((F.col("id") % M) % 2).cast("string").alias("g"),
        (F.col("id") % M).cast("double").alias("v"),
    )
    t0 = time.time()
    r = kruskal_wallis(rows, "g", "v").collect()[0]
    dt = time.time() - t0
    per_v = N // M
    # replica: value v (0..M-1) has count per_v, owned by group v%2
    ranks = {}
    cum = 0
    for v in range(M):
        ranks[v] = 2 * cum + per_v + 1  # doubled avg rank
        cum += per_v
    ties = sum(per_v**3 - per_v for _ in range(M))
    groups = {}
    for par in (0, 1):
        r2 = sum(per_v * ranks[v] for v in range(M) if v % 2 == par)
        groups[str(par)] = (N // 2, r2)
    ks = sorted(groups)
    terms = [
        float(groups[g][1]) * float(groups[g][1])
        / (4.0 * float(groups[g][0]))
        for g in ks
    ]
    t = terms[0]
    for x in terms[1:]:
        t = t + x
    h = (12.0 * t) / float(N * (N + 1)) - 3.0 * float(N + 1)
    corr = 1.0 - float(ties) / float(N**3 - N)
    assert r["k"] == 2 and r["n"] == N
    assert r["tie_term"] == float(ties), (r["tie_term"], ties)
    assert r["h"] == h, (r["h"], h)
    assert r["h_adj"] == h / corr
    print(f"kruskal_wallis 20M rows: {dt:.1f}s — H EXACT vs closed form")


def stress_auc():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import auc_by

    spark = _spark()
    G = 1000
    # score index via integer DIVISION by G so it is independent of
    # the group (i % 100 would be CONSTANT within a group — 100
    # divides G; the modulus trap this file's docstring warns about
    # bit the first cut of this very generator)
    sidx = (F.col("id") / G).cast("long") % 100
    rows = spark.range(0, N, 1, 64).select(
        (F.col("id") % G).cast("string").alias("g"),
        sidx.cast("double").alias("s"),
        (sidx % 2).cast("long").alias("y"),
    )
    t0 = time.time()
    out = auc_by(rows, "g", "y", "s")
    chk = out.agg(
        F.count(F.lit(1)).alias("ng"),
        F.min("auc").alias("a0"), F.max("auc").alias("a1"),
        F.min("n_pos").alias("p0"), F.max("n_pos").alias("p1"),
    ).collect()[0]
    dt = time.time() - t0
    # replica for one group (all identical): score v has n/(G*100)
    # rows, label v%2
    per = N // (G * 100)
    cum = 0
    ra2 = 0
    for v in range(100):
        if v % 2 == 1:
            ra2 += per * (2 * cum + per + 1)
        cum += per
    npos = 50 * per
    nneg = 50 * per
    auc = float(ra2 - npos * (npos + 1)) / float(2 * npos * nneg)
    assert chk["ng"] == G
    assert chk["p0"] == chk["p1"] == npos
    assert chk["a0"] == chk["a1"] == auc, (chk, auc)
    print(f"auc_by 20M rows / 1000 groups: {dt:.1f}s — every AUC EXACT")


def stress_kappa():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import cohen_kappa

    spark = _spark()
    y = (F.col("id") % 3).cast("string")
    p = F.when(
        F.col("id") % 5 == 0, ((F.col("id") + 1) % 3).cast("string")
    ).otherwise(y)
    rows = spark.range(0, N, 1, 64).select(y.alias("y"), p.alias("p"))
    t0 = time.time()
    r = cohen_kappa(rows, "y", "p").collect()[0]
    dt = time.time() - t0
    # replica by residues mod 15 (bigint); N is NOT divisible by
    # 15, so the first N mod 15 residues carry one extra row
    from collections import Counter

    cm = Counter()
    for i in range(15):
        yy = i % 3
        pp = (i + 1) % 3 if i % 5 == 0 else yy
        cm[(yy, pp)] += N // 15 + (1 if i < N % 15 else 0)
    n = sum(cm.values())
    agree = sum(c for (a, b), c in cm.items() if a == b)
    rowm = Counter()
    colm = Counter()
    for (a, b), c in cm.items():
        rowm[a] += c
        colm[b] += c
    s = sum(rowm[k] * colm[k] for k in rowm if k in colm)
    assert r["n"] == n and r["agree"] == agree
    assert r["po"] == agree / n
    assert r["pe"] == s / (n * n)
    assert r["kappa"] == float(n * agree - s) / float(n * n - s)
    print(f"cohen_kappa 20M rows: {dt:.1f}s — kappa EXACT vs CRT replica")


def stress_brier():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import brier_score

    spark = _spark()
    rows = spark.range(0, N, 1, 64).select(
        ((F.col("id") % 100) % 2).cast("long").alias("y"),
        ((F.col("id") % 100).cast("double") / 100.0).alias("p"),
    )
    t0 = time.time()
    r = brier_score(rows, "y", "p").collect()[0]
    dt = time.time() - t0
    per = N // 100
    q = 1 << 30
    want = 0
    for v in range(100):
        pp = v / 100.0
        yy = v % 2
        want += per * round((pp - yy) * (pp - yy) * float(q))
    assert r["n"] == N
    assert int(r["brier_q"]) == want, (r["brier_q"], want)
    assert r["brier"] == float(want) / (float(N) * float(q))
    print(f"brier_score 20M rows: {dt:.1f}s — brier_q EXACT vs closed form")


def stress_sil():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.similarity import silhouette_fixed

    spark = _spark()
    cents = [[0.0, 0.0, 0.0, 0.0], [10.0, 0.0, 0.0, 0.0]]
    templates = [
        [1.0, 0.0, 0.0, 0.0],
        [9.0, 1.0, 0.0, 0.0],
        [5.0, 0.0, 0.0, 0.0],   # equidistant -> cluster 0, s = 0
        [0.0, 2.0, 0.0, 0.0],
    ]
    tcol = F.col("id") % 4
    vec = F.when(
        tcol == 0, F.array(*[F.lit(x) for x in templates[0]])
    )
    for i in range(1, 4):
        vec = vec.when(
            tcol == i, F.array(*[F.lit(x) for x in templates[i]])
        )
    rows = spark.range(0, N, 1, 64).select(
        vec.cast("array<float>").alias("v")
    )
    t0 = time.time()
    out = {
        r["cluster"]: r
        for r in silhouette_fixed(rows, "v", cents).collect()
    }
    dt = time.time() - t0

    # replica with the SAME op sequence (left fold over dims, sqrt,
    # sort, quantize); float32 narrowing applied to the inputs
    import numpy as np

    def srep(tpl):
        x = [float(np.float32(t)) for t in tpl]
        ds = []
        for c in cents:
            acc = 0.0
            for a, b in zip(x, c):
                acc = acc + (a - b) * (a - b)
            ds.append(math.sqrt(acc))
        srt = sorted(ds)
        cl = ds.index(srt[0])
        s = (
            (srt[1] - srt[0]) / max(srt[0], srt[1])
            if max(srt[0], srt[1]) > 0
            else 0.0
        )
        return cl, round(s * float(1 << 20))
    per = N // 4
    want = {}
    for tpl in templates:
        cl, sq = srep(tpl)
        wn, ws = want.get(cl, (0, 0))
        want[cl] = (wn + per, ws + per * sq)
    for cl, (wn, ws) in want.items():
        assert out[cl]["n"] == wn, (cl, out[cl], wn)
        assert out[cl]["sil_q"] == ws, (cl, out[cl], ws)
        assert out[cl]["mean_sil"] == float(ws) / (
            float(wn) * float(1 << 20)
        )
    print(
        f"silhouette_fixed 20M rows: {dt:.1f}s — per-cluster sums EXACT"
    )


def stress_spearman_by():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import spearman_by

    spark = _spark()
    G, V = 10, 1000
    x = (F.col("id") / G).cast("long") % V
    rows = spark.range(0, N, 1, 64).select(
        (F.col("id") % G).cast("string").alias("g"),
        x.cast("double").alias("x"),
        ((x * 7 + 3) % V).cast("double").alias("y"),
    )
    t0 = time.time()
    out = spearman_by(rows, "g", "x", "y")
    chk = out.agg(
        F.count(F.lit(1)).alias("ng"),
        F.min("rho").alias("r0"), F.max("rho").alias("r1"),
        F.min("n").alias("n0"), F.max("n").alias("n1"),
    ).collect()[0]
    dt = time.time() - t0
    # replica: within every group each x value 0..V-1 occurs per
    # times with y = (7x+3) mod V — a permutation, so both rank
    # tables are the same multiset; moments via bigint loops, rho
    # via the operator's double expression
    per = N // (G * V)
    n = per * V
    r2 = {v: 2 * (v * per) + per + 1 for v in range(V)}  # doubled rank
    sx = sum(per * r2[v] for v in range(V))
    sxx = sum(per * r2[v] * r2[v] for v in range(V))
    sxy = sum(per * r2[v] * r2[(v * 7 + 3) % V] for v in range(V))
    nd = float(n)
    num = nd * float(sxy) - float(sx) * float(sx)
    den = math.sqrt(
        (nd * float(sxx) - float(sx) * float(sx))
        * (nd * float(sxx) - float(sx) * float(sx))
    )
    rho = num / den
    assert chk["ng"] == G and chk["n0"] == chk["n1"] == n
    assert chk["r0"] == chk["r1"] == rho, (chk, rho)
    print(
        f"spearman_by 20M rows / {G} groups: {dt:.1f}s — every rho"
        " EXACT vs the bigint rank replica"
    )


def stress_entropy_by():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import entropy_by

    spark = _spark()
    G, V = 100, 50
    rows = spark.range(0, N, 1, 64).select(
        (F.col("id") % G).cast("string").alias("g"),
        ((F.col("id") / G).cast("long") % V).cast("string").alias("v"),
    )
    t0 = time.time()
    out = entropy_by(rows, "g", "v")
    chk = out.agg(
        F.count(F.lit(1)).alias("ng"),
        F.min("entropy").alias("e0"), F.max("entropy").alias("e1"),
        F.min("n_distinct").alias("d0"), F.max("n_distinct").alias("d1"),
    ).collect()[0]
    dt = time.time() - t0
    per = N // (G * V)
    n = per * V
    q = 1 << 20
    e_num = n * round(math.log(n) * q) - V * (per * round(math.log(per) * q))
    want = float(e_num) / (float(n) * float(q))
    assert chk["ng"] == G and chk["d0"] == chk["d1"] == V
    assert chk["e0"] == chk["e1"] == want, (chk, want)
    print(
        f"entropy_by 20M rows / {G} groups: {dt:.1f}s — every entropy"
        " EXACT vs the quantized closed form"
    )


def stress_ece():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import calibration_bins

    spark = _spark()
    rows = spark.range(0, N, 1, 64).select(
        ((F.col("id") % 100) % 2).cast("long").alias("y"),
        ((F.col("id") % 100).cast("double") / 100.0).alias("p"),
    )
    t0 = time.time()
    out = {
        r["bin"]: r
        for r in calibration_bins(rows, "y", "p", n_bins=10).collect()
    }
    dt = time.time() - t0
    q = 1 << 20
    from collections import defaultdict

    want = defaultdict(lambda: [0, 0, 0])
    for v in range(100):
        pp = v / 100.0
        b = min(int(pp * 10), 9)
        cnt = N // 100
        want[b][0] += cnt
        want[b][1] += cnt * (v % 2)
        want[b][2] += cnt * round(pp * float(q))
    assert set(out) == set(want)
    for b, (wn, wp, wq) in want.items():
        r = out[b]
        assert r["n"] == wn and r["n_pos"] == wp, (b, r)
        conf = float(wq) / (float(wn) * float(q))
        acc = float(wp) / float(wn)
        assert r["conf"] == conf and r["acc"] == acc
        assert r["gap"] == abs(conf - acc)
    print(
        f"calibration_bins 20M rows: {dt:.1f}s — all 10 bins EXACT"
        " vs the quantized closed form"
    )


def stress_gini_by():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import gini_by

    spark = _spark()
    G, V = 100, 200
    # value index independent of the group via integer division
    vidx = (F.col("id") / G).cast("long") % V
    rows = spark.range(0, N, 1, 64).select(
        (F.col("id") % G).cast("string").alias("g"),
        vidx.cast("double").alias("x"),
    )
    t0 = time.time()
    out = gini_by(rows, "g", "x", scale=1.0)
    chk = out.agg(
        F.count(F.lit(1)).alias("ng"),
        F.min("gini").alias("g0"), F.max("gini").alias("g1"),
        F.min("n").alias("n0"), F.max("n").alias("n1"),
    ).collect()[0]
    dt = time.time() - t0
    per = N // (G * V)
    n = per * V
    cum = 0
    t2 = 0
    s = 0
    for v in range(V):
        t2 += v * per * (2 * cum + per + 1)
        s += v * per
        cum += per
    want = float(t2) / (float(n) * float(s)) - (float(n) + 1.0) / float(n)
    assert chk["ng"] == G and chk["n0"] == chk["n1"] == n
    assert chk["g0"] == chk["g1"] == want, (chk, want)
    print(
        f"gini_by 20M rows / {G} groups: {dt:.1f}s — every gini EXACT"
        " vs the tie-block closed form"
    )


def stress_mcnemar():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import mcnemar_test

    spark = _spark()
    rows = spark.range(0, N, 1, 64).select(
        (F.col("id") % 2).cast("long").alias("y"),
        ((F.col("id") % 4) < 2).cast("long").alias("pa"),
        ((F.col("id") % 8) < 4).cast("long").alias("pb"),
    )
    t0 = time.time()
    r = mcnemar_test(rows, "y", "pa", "pb").collect()[0]
    dt = time.time() - t0
    # joint replica over the 8 residues (N divisible by 8)
    per = N // 8
    b = c = 0
    for i in range(8):
        y, pa, pb = i % 2, 1 if i % 4 < 2 else 0, 1 if i % 8 < 4 else 0
        if pa == y and pb != y:
            b += per
        if pa != y and pb == y:
            c += per
    assert (r["n"], r["b"], r["c"]) == (N, b, c)
    assert r["chi2"] == float((b - c) * (b - c)) / float(b + c)
    print(
        f"mcnemar_test 20M rows: {dt:.1f}s — (b, c, chi2) EXACT vs"
        " the joint-residue replica"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in {
        "kruskal": stress_kruskal,
        "auc": stress_auc,
        "kappa": stress_kappa,
        "brier": stress_brier,
        "sil": stress_sil,
        "spearman": stress_spearman_by,
        "entropy": stress_entropy_by,
        "ece": stress_ece,
        "gini_by": stress_gini_by,
        "mcnemar": stress_mcnemar,
    }.items():
        if which in (name, "all"):
            fn()
