"""Round-9 stress: the four newly registered operators, each at
10-20M rows with an exact (or quantization-bounded) replica.

1. `transitions`: 20M events (1M users x 20 steps), state =
   (u + j*j) % 5 — every transition cell count is closed-form in
   u % 5, so all 25 cells are verified EXACTLY.

2. `logistic`: 20M rows, 7 distinct x levels, y drawn by a Knuth
   multiplicative hash against a per-level logistic threshold — the
   replica recomputes the group counts exactly from the same hash,
   then runs the IDENTICAL quantized-Newton recursion on grouped
   moments (numpy exp vs JVM exp can differ at a floor boundary,
   hence 1e-6 tolerance, far above last-ulp and far below the
   2^-16 quantum).

3. `itemcf`: 20M (basket, item) rows — 2M baskets each holding
   items (b + k*k) % 1000 for k in 0..9, so every pair count is a
   small closed-form sum over the 45 (k1, k2) offsets; a sampled
   item's full neighbor list (counts, cosines, ranks) is verified
   exactly.

4. `kcore`: a 1789x1789 4-regular torus (~3.2M nodes) with 3.2M
   2-chain pendants (~19.2M symmetrized edge rows): the k=3 core is
   EXACTLY the torus (pendants peel in 2 rounds), every core degree
   is exactly 4, and the converged flag must be true.

Usage: python tools/stress_r9.py [transitions|logistic|itemcf|kcore]
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r9")


def stress_transitions():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.sessions import event_transitions

    spark = _spark()
    n_users, steps = 1_000_000, 20
    ev = spark.range(0, n_users * steps, 1, 64).select(
        (F.col("id") / steps).cast("long").alias("u"),
        (F.col("id") % steps).alias("j"),
        (
            ((F.col("id") / steps).cast("long") + (F.col("id") % steps)
             * (F.col("id") % steps)) % 5
        ).cast("long").alias("s"),
    )
    t0 = time.time()
    out = event_transitions(ev, "u", "j", "s")
    got = {(int(r["src"]), int(r["dst"])): (int(r["n"]), int(r["n_src"]))
           for r in out.collect()}
    wall = time.time() - t0

    # closed form: users with u%5 == r each contribute transitions
    # ((r + j^2) % 5 -> (r + (j+1)^2) % 5) for j in 0..18
    per_res = [n_users // 5 + (1 if r < n_users % 5 else 0)
               for r in range(5)]
    exp: dict = {}
    for r in range(5):
        for j in range(steps - 1):
            key = ((r + j * j) % 5, (r + (j + 1) * (j + 1)) % 5)
            exp[key] = exp.get(key, 0) + per_res[r]
    margins: dict = {}
    for (src, _), n in exp.items():
        margins[src] = margins.get(src, 0) + n
    assert set(got) == set(exp), (len(got), len(exp))
    for key, n in exp.items():
        assert got[key] == (n, margins[key[0]]), (key, got[key], n)
    print(f"transitions: 20M events, {len(got)} cells exact, "
          f"{wall:.1f}s")


def stress_logistic():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import logistic2

    spark = _spark()
    n = 20_000_000
    # x level from id%7 in {-3..3}; y via Knuth hash vs logistic(x)
    knuth = 2654435761
    mod = 1 << 32
    levels = np.arange(7) - 3.0
    thr = (1.0 / (1.0 + np.exp(-(0.4 + 0.9 * levels))) * mod).astype(
        np.int64
    )
    df = spark.range(0, n, 1, 64).select(
        ((F.col("id") % 7) - 3).cast("double").alias("x"),
        (
            (F.col("id") * F.lit(knuth)) % F.lit(mod)
            < F.element_at(
                F.array(*[F.lit(int(t)) for t in thr]),
                (F.col("id") % 7 + 1).cast("int"),
            )
        ).cast("long").alias("y"),
    )
    t0 = time.time()
    r = logistic2(df, "x", "y", n_iter=4, scale=1e6, wbits=16).collect()[0]
    wall = time.time() - t0

    # exact group counts from the same hash, vectorized in chunks
    n_pos = np.zeros(7, dtype=np.int64)
    n_lvl = np.zeros(7, dtype=np.int64)
    for lo in range(0, n, 5_000_000):
        ids = np.arange(lo, min(lo + 5_000_000, n), dtype=np.uint64)
        lvl = (ids % 7).astype(np.int64)
        h = (ids * np.uint64(knuth)) % np.uint64(mod)
        y = h.astype(np.int64) < thr[lvl]
        np.add.at(n_lvl, lvl, 1)
        np.add.at(n_pos, lvl, y.astype(np.int64))
    # identical quantized recursion on grouped moments
    W = 1 << 16
    xu = np.round(levels * 1e6)  # exact integers
    b0 = b1p = 0.0
    for _ in range(4):
        t = b0 + b1p * xu
        p = 1.0 / (1.0 + np.exp(-t))
        wq = np.floor(p * (1.0 - p) * W)
        # gradient sums split by label: y=1 rows get floor((1-p)W+.5)
        g1 = np.floor((1.0 - p) * W + 0.5)
        g0 = np.floor((0.0 - p) * W + 0.5)
        sw = float((wq * n_lvl).sum())
        swx = float((wq * n_lvl * xu).sum())
        swxx = float((wq * n_lvl * xu * xu).sum())
        sg = float((g1 * n_pos + g0 * (n_lvl - n_pos)).sum())
        sgx = float(((g1 * n_pos + g0 * (n_lvl - n_pos)) * xu).sum())
        det = sw * swxx - swx * swx
        b0 += (swxx * sg - swx * sgx) / det
        b1p += (sw * sgx - swx * sg) / det
    b1 = b1p * 1e6
    assert r["n"] == n and r["n_pos"] == int(n_pos.sum()), (
        r["n"], r["n_pos"], int(n_pos.sum()),
    )
    assert abs(r["b0"] - b0) < 1e-6 and abs(r["b1"] - b1) < 1e-6, (
        r["b0"], b0, r["b1"], b1,
    )
    # and the fit recovered the planted coefficients to quantization
    assert abs(b0 - 0.4) < 2e-3 and abs(b1 - 0.9) < 2e-3, (b0, b1)
    print(f"logistic: 20M rows, 4 sweeps, b0={r['b0']:.6f} "
          f"b1={r['b1']:.6f} (planted 0.4/0.9), {wall:.1f}s")


def stress_itemcf():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.basket import item_cf

    spark = _spark()
    n_baskets, n_items, per = 2_000_000, 1000, 10
    bi = spark.range(0, n_baskets * per, 1, 64).select(
        (F.col("id") / per).cast("long").alias("b"),
        (
            ((F.col("id") / per).cast("long")
             + (F.col("id") % per) * (F.col("id") % per)) % n_items
        ).alias("i"),
    )
    t0 = time.time()
    out = item_cf(bi, "b", "i", min_count=1, k=15)
    sample = [r for r in out.filter(F.col("item") < 3).collect()]
    total = out.count()
    wall = time.time() - t0

    # closed form: basket b holds item set {(b + k^2) % 1000}; the
    # squares are distinct mod 1000, so 10 items per basket and each
    # item sits in 10 residue classes x 2000 baskets each. Enumerate
    # the 1000 residue item-sets directly for exact pair counts.
    n_b_per_res = n_baskets // n_items  # 2000 baskets per residue
    n_item = per * n_b_per_res
    squares = [k * k for k in range(per)]
    co: dict = {}
    for res in range(n_items):
        items = sorted({(res + q) % n_items for q in squares})
        for ai in range(len(items)):
            for bj in range(ai + 1, len(items)):
                key = (items[ai], items[bj])
                co[key] = co.get(key, 0) + 1
    for i in range(3):
        nbrs = {}
        for (a, b), cnt in co.items():
            if a == i:
                nbrs[b] = cnt * n_b_per_res
            elif b == i:
                nbrs[a] = cnt * n_b_per_res
        exp = sorted(
            ((c / math.sqrt(n_item * n_item), c, j)
             for j, c in nbrs.items()),
            key=lambda t: (-t[0], t[2]),
        )[:15]
        got = sorted(
            ((r["cosine"], r["n_ab"], r["neighbor"], r["rank"])
             for r in sample if r["item"] == i),
            key=lambda t: t[3],
        )
        assert len(got) == 15, len(got)
        for rank, ((ec, en, ej), (gc, gn, gj, _)) in enumerate(
            zip(exp, got), start=1
        ):
            assert (gj, gn) == (ej, en), (i, rank, got, exp)
            assert abs(gc - ec) < 1e-12, (i, rank, gc, ec)
    print(f"itemcf: 20M incidence rows, {total} top-k rows, 3 items "
          f"verified exact, {wall:.1f}s")


def stress_kcore():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.graph import kcore

    spark = _spark()
    side = 1789  # torus nodes = 3.2M, each degree exactly 4
    n_torus = side * side
    torus = spark.range(0, n_torus, 1, 64)
    right = torus.select(
        F.col("id").alias("s"),
        (
            (F.col("id") / side).cast("long") * side
            + (F.col("id") + 1) % side
        ).alias("t"),
    )
    down = torus.select(
        F.col("id").alias("s"),
        ((F.col("id") + side) % n_torus).alias("t"),
    )
    # each torus node also anchors a 2-chain pendant:
    # id -> P1=id+10M -> P2=id+20M  (peels in exactly 2 rounds)
    p1 = torus.select(
        F.col("id").alias("s"), (F.col("id") + 10_000_000).alias("t")
    )
    p2 = torus.select(
        (F.col("id") + 10_000_000).alias("s"),
        (F.col("id") + 20_000_000).alias("t"),
    )
    edges = right.unionByName(down).unionByName(p1).unionByName(p2)
    t0 = time.time()
    out = kcore(edges, "s", "t", k=3, n_rounds=4)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("degree").alias("dmin"),
        F.max("degree").alias("dmax"),
        F.min(F.col("converged").cast("int")).alias("conv"),
        F.max("node").alias("nmax"),
    ).collect()[0]
    wall = time.time() - t0
    assert int(agg["n"]) == n_torus, (agg["n"], n_torus)
    assert int(agg["dmin"]) == 4 and int(agg["dmax"]) == 4, agg
    assert int(agg["conv"]) == 1
    assert int(agg["nmax"]) < 10_000_000  # no pendant survived
    print(f"kcore: {4 * n_torus + 2 * n_torus} input edge rows "
          f"(~{2 * (4 * n_torus + 2 * n_torus) // 1_000_000}M "
          f"symmetrized), core = torus ({n_torus} nodes, degree 4), "
          f"converged, {wall:.1f}s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {
        "transitions": stress_transitions,
        "logistic": stress_logistic,
        "itemcf": stress_itemcf,
        "kcore": stress_kcore,
    }
    for name, fn in fns.items():
        if which in ("all", name):
            fn()
