"""Round-11 pre-build stress: rank-1 ALS and the log-rank test at
20M rows vs exact bigint/IEEE replicas. Joint residue structure is
DERIVED in both replicas (the r10 modulus-correlation lessons).

1. `als_rank1`: 1M users x 20 ratings; ratings cycle mod 7 and
   10^6 = 1 (mod 7), so user u's rating multiset depends only on
   u mod 7 — the replica folds 7 residue classes x 20 items with
   exact class counts (1M not divisible by 7: derived).

2. `logrank_test`: t = i mod 1000, d = (i mod 3 == 0),
   g = parity(i) — ALL correlated through i; the replica loops the
   3000 joint residues (N mod 3000 != 0: the first residues carry
   one extra row) and replays the operator's exact fold.

Usage: python tools/stress_r11pre.py [als|logrank]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r11pre")


N = 20_000_000
U = 1_000_000


def stress_als():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import als_rank1

    spark = _spark()
    rows = spark.range(0, N, 1, 64).select(
        (F.col("id") % U).alias("u"),
        (F.col("id") / U).cast("long").alias("i"),
        (((F.col("id") % 7) + 1).cast("double") / 2.0).alias("r"),
    )
    t0 = time.time()
    got = {
        r["i"]: (r["n_ratings"], r["v"])
        for r in als_rank1(rows, "u", "i", "r").collect()
    }
    dt = time.time() - t0
    # replica: id = u + j*U, U % 7 == 1  =>  id % 7 == (u + j) % 7;
    # rq(u, j) = ((u + j) % 7 + 1) * 50. user u's 20 ratings sum
    # over j=0..19 depends only on c = u % 7.
    import math

    qs = float(1 << 20)
    n_items = N // U  # 20
    # exact count of u in [0, U) with u % 7 == c
    cnt = {c: U // 7 + (1 if c < U % 7 else 0) for c in range(7)}
    Uq = {}
    for c in range(7):
        s = sum(((c + j) % 7 + 1) * 50 for j in range(n_items))
        # floor(x + 0.5): Spark F.round is HALF_UP, Python round()
        # is banker's (review r10c)
        Uq[c] = math.floor(qs * float(s) / (100.0 * float(n_items)) + 0.5)
    want = {}
    for j in range(n_items):
        num = sum(
            cnt[c] * (((c + j) % 7 + 1) * 50) * Uq[c] for c in range(7)
        )
        den = sum(cnt[c] * Uq[c] * Uq[c] for c in range(7))
        v = float(num) * qs / (100.0 * float(den))
        want[j] = (U, v)
    assert got == want, {k: (got[k], want[k]) for k in list(got)[:2]}
    print(
        f"als_rank1 20M ratings / 1M users: {dt:.1f}s — every item's"
        " (n, v) EXACT vs the residue-class bigint replica"
    )


def stress_logrank():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import logrank_test

    spark = _spark()
    rows = spark.range(0, N, 1, 64).select(
        (F.col("id") % 1000).alias("t"),
        (F.col("id") % 3 == 0).cast("long").alias("d"),
        F.when(F.col("id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("g"),
    )
    t0 = time.time()
    r = logrank_test(rows, "t", "d", "g", "a", "b").collect()[0]
    dt = time.time() - t0
    # joint replica over the 3000 residues of lcm(1000, 3, 2)
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])
    for res in range(3000):
        c = N // 3000 + (1 if res < N % 3000 else 0)
        t = res % 1000
        d = 1 if res % 3 == 0 else 0
        if res % 2 == 0:
            cells[t][0] += c
            cells[t][2] += c * d
        else:
            cells[t][1] += c
            cells[t][3] += c * d
    n_a = sum(v[0] for v in cells.values())
    n_b = sum(v[1] for v in cells.values())
    o1, e1, v = 0, 0.0, 0.0
    seen_a = seen_b = 0
    for t in sorted(cells):
        ca, cb, da, db = cells[t]
        n1, n2 = n_a - seen_a, n_b - seen_b
        seen_a += ca
        seen_b += cb
        dt2 = da + db
        if dt2 == 0:
            continue
        nt = n1 + n2
        o1 += da
        e1 = e1 + float(dt2 * n1) / float(nt)
        if nt > 1:
            v = v + (
                float(dt2 * n1) / float(nt)
                * (float(n2) / float(nt))
                * (float(nt - dt2) / float(nt - 1))
            )
    chi2 = (float(o1) - e1) * (float(o1) - e1) / v
    assert (r["n_a"], r["n_b"], r["o1"]) == (n_a, n_b, o1)
    assert r["e1"] == e1 and r["v"] == v and r["chi2"] == chi2
    print(
        f"logrank_test 20M subjects / 1000 event times: {dt:.1f}s —"
        " (o1, e1, v, chi2) EXACT vs the joint-residue replica"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in {"als": stress_als, "logrank": stress_logrank}.items():
        if which in (name, "all"):
            fn()
