"""Round-10 pre-build stress: adaboost_stumps, nb_train/nb_score,
rrf_fuse at 10-20M rows with exact replicas.

1. `adaboost_stumps`: 20M rows, 100 feature levels, hash-flipped
   noisy threshold labels — the per-row integer weights are constant
   within each (x, y) cell, so a 200-cell driver replica replays the
   IDENTICAL weight recursion and every round's (threshold,
   polarity, err_q, w_total_q, alpha) is verified EXACTLY.

2. `nb_train` + `nb_score`: 20M training token rows (5 classes x
   100k vocab) then 10M scoring token rows over 1M docs — sampled
   (class, token) counts exact vs a numpy bincount replica; 5
   sampled docs' argmax class and integer scores exact vs a python
   replica of the quantized-log sum.

3. `rrf_fuse`: 10M ranking rows (4 sources x 2.5M ranks) with
   closed-form overlap — the fused top-20 ids, integer scores, and
   source counts are verified exactly.

Usage: python tools/stress_r10.py [adaboost|nb|rrf]
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

    return get_spark(app_name="stress_r10")


def stress_adaboost():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import adaboost_stumps

    spark = _spark()
    n, n_vals = 20_000_000, 100
    knuth = 2654435761
    mod = 1 << 32
    flip_thr = int(0.05 * mod)  # 5% label noise
    df = spark.range(0, n, 1, 64).select(
        (F.col("id") % n_vals).alias("x"),
        (
            (F.col("id") % n_vals >= 50)
            != ((F.col("id") * F.lit(knuth)) % F.lit(mod) < flip_thr)
        ).cast("long").alias("y"),
    )
    t0 = time.time()
    got = adaboost_stumps(df, "x", "y", n_rounds=3).collect()
    wall = time.time() - t0

    # exact (x, y) cell counts from the same hash
    cnt = np.zeros((n_vals, 2), dtype=np.int64)
    for lo in range(0, n, 5_000_000):
        ids = np.arange(lo, min(lo + 5_000_000, n), dtype=np.uint64)
        x = (ids % n_vals).astype(np.int64)
        base_y = (x >= 50).astype(np.int64)
        flip = (
            ((ids * np.uint64(knuth)) % np.uint64(mod)).astype(np.int64)
            < flip_thr
        ).astype(np.int64)
        y = base_y ^ flip
        np.add.at(cnt, (x, y), 1)
    # cell-level replica: weights are identical within each (x, y)
    # cell, so track one integer weight per cell
    wbits = 16
    w = {(v, yy): 1 << wbits for v in range(n_vals) for yy in (0, 1)}
    exp = []
    for rnd in range(1, 4):
        W = sum(w[c] * int(cnt[c]) for c in w)
        best = None
        cp = cn = 0
        tot_p = sum(w[(v, 1)] * int(cnt[v, 1]) for v in range(n_vals))
        for v in range(n_vals):
            cp += w[(v, 1)] * int(cnt[v, 1])
            cn += w[(v, 0)] * int(cnt[v, 0])
            ep = cn + (tot_p - cp)
            em = W - ep
            for err, pol in ((ep, 1), (em, -1)):
                cand = (err, v, -pol)
                if best is None or cand < best:
                    best = cand
        err, t, negpol = best
        pol = -negpol
        alpha = 0.5 * math.log((W - err) / err)
        exp.append((rnd, t, pol, err, W, alpha))
        f_ok, f_bad = math.exp(-alpha), math.exp(alpha)
        for v in range(n_vals):
            for yy in (0, 1):
                pred_pos = (v <= t) if pol == 1 else (v > t)
                ok = pred_pos == (yy == 1)
                w[(v, yy)] = math.floor(
                    w[(v, yy)] * (f_ok if ok else f_bad) + 0.5
                )
    assert len(got) == 3
    for g, (rnd, t, pol, err, W, alpha) in zip(got, exp):
        assert (int(g["round"]), int(g["threshold"]), int(g["polarity"])) == (
            rnd, t, pol,
        ), (g, rnd, t, pol)
        assert (int(g["err_q"]), int(g["w_total_q"])) == (err, W), (g, err, W)
        assert g["alpha"] == alpha, (g["alpha"], alpha)
    print(
        f"adaboost: 20M rows, 3 rounds, thresholds "
        f"{[e[1] for e in exp]} polarity {[e[2] for e in exp]} — "
        f"every round's integer error/total and alpha EXACT vs the "
        f"cell replica, {wall:.1f}s"
    )


def stress_nb():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import nb_score, nb_train

    spark = _spark()
    n_train, n_cls, vocab = 20_000_000, 5, 100_000
    knuth = 2654435761
    mod = 1 << 32
    train = spark.range(0, n_train, 1, 64).select(
        (F.col("id") % n_cls).cast("string").alias("c"),
        (
            ((F.col("id") * F.lit(knuth)) % F.lit(mod)) % vocab
        ).cast("string").alias("t"),
    )
    t0 = time.time()
    model = nb_train(train, "c", "t").localCheckpoint(eager=True)
    n_model = model.count()
    wall_train = time.time() - t0

    # numpy replica of the (class, token) counts
    counts = np.zeros((n_cls, vocab), dtype=np.int64)
    for lo in range(0, n_train, 5_000_000):
        ids = np.arange(lo, min(lo + 5_000_000, n_train), dtype=np.uint64)
        c = (ids % n_cls).astype(np.int64)
        t = (((ids * np.uint64(knuth)) % np.uint64(mod)) % vocab).astype(
            np.int64
        )
        np.add.at(counts, (c, t), 1)
    n_class = counts.sum(axis=1)
    assert n_model == int((counts > 0).sum()), (n_model,)
    sample = {
        (r["class"], r["token"]): (int(r["n"]), int(r["n_class"]))
        for r in model.filter(F.col("token").isin("0", "1", "2")).collect()
    }
    for (c, t), (nn, nc) in sample.items():
        assert nn == int(counts[int(c), int(t)]), (c, t, nn)
        assert nc == int(n_class[int(c)]), (c, nc)

    # score 1M docs x 10 tokens; token = (doc*10 + j) hashed
    n_docs, per = 1_000_000, 10
    toks = spark.range(0, n_docs * per, 1, 64).select(
        (F.col("id") / per).cast("long").alias("d"),
        (
            ((F.col("id") * F.lit(knuth)) % F.lit(mod)) % vocab
        ).cast("string").alias("t"),
    )
    t1 = time.time()
    out = nb_score(toks, model, "d", "t", vocab_size=vocab)
    picked = {
        int(r["doc"]): r
        for r in out.filter(F.col("doc") < 5).collect()
    }
    n_out = out.count()
    wall_score = time.time() - t1
    assert n_out == n_docs, n_out

    Q = 1 << 20
    for d in range(5):
        tok = [
            int(((np.uint64(d * per + j) * np.uint64(knuth)) % np.uint64(mod))
                % np.uint64(vocab))
            for j in range(per)
        ]
        best = None
        for c in range(n_cls):
            s = 0
            for tv in tok:
                nn = int(counts[c, tv])
                s += math.floor(
                    math.log((nn + 1) / (int(n_class[c]) + vocab)) * Q
                )
            cand = (-s, str(c))
            if best is None or cand < best:
                best = (cand[0], cand[1], s)
        r = picked[d]
        assert r["pred_class"] == best[1], (d, r["pred_class"], best[1])
        assert int(r["score_q"]) == best[2], (d, r["score_q"], best[2])
        assert int(r["n_tokens"]) == per
    print(
        f"nb: 20M train rows -> {n_model} model rows "
        f"({wall_train:.1f}s), 10M scoring rows over {n_docs} docs "
        f"({wall_score:.1f}s), sampled counts and 5 docs' argmax + "
        f"integer scores EXACT vs the replica"
    )


def stress_rrf():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.text import rrf_fuse

    spark = _spark()
    n_per, n_src = 2_500_000, 4
    # source s ranks doc ids s*offset + rank - 1 ... overlapping so
    # low ids collect contributions from several sources:
    # doc id d gets rank d+1-s*3 from source s when 0 <= d-3s < n_per
    rows = spark.range(0, n_per * n_src, 1, 64).select(
        (F.col("id") % n_src).alias("src"),
        ((F.col("id") / n_src).cast("long") + 1).alias("rank"),
        (
            (F.col("id") / n_src).cast("long") + (F.col("id") % n_src) * 3
        ).alias("doc"),
    )
    t0 = time.time()
    out = rrf_fuse(rows, "doc", "src", "rank", k0=60, k=20).collect()
    wall = time.time() - t0
    two32 = 1 << 32

    # replica over the small id range that can reach the top
    best: dict = {}
    for d in range(0, 200):
        s_tot, n_s = 0, 0
        for s in range(n_src):
            r = d - 3 * s + 1
            if 1 <= r <= n_per:
                s_tot += two32 // (60 + r)
                n_s += 1
        if n_s:
            best[d] = (s_tot, n_s)
    exp = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert len(out) == 20
    for i, (r, (d, (sc, ns))) in enumerate(zip(out, exp), start=1):
        assert int(r["id"]) == d and int(r["rrf_q"]) == sc, (i, r, d, sc)
        assert int(r["n_sources"]) == ns and int(r["rank"]) == i, (i, r)
    print(
        f"rrf: {n_per * n_src} ranking rows, 4 sources, fused top-20 "
        f"ids/integer scores/source counts EXACT, {wall:.1f}s"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {
        "adaboost": stress_adaboost,
        "nb": stress_nb,
        "rrf": stress_rrf,
    }
    for name, fn in fns.items():
        if which in ("all", name):
            fn()
