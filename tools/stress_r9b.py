"""Round-9 stress, second batch: the eight operators built after the
first rotation, each at 4-20M rows with an exact (or quantization-
bounded) replica.

1. `labelprop`: 3M disjoint triangles (9M nodes, 18M symmetrized edge
   rows) — after >= 2 synchronous rounds every triangle converges to
   its minimum node id, so all 9M labels are verified EXACTLY by one
   aggregation (label == node - node % 3).

2. `logistic_by`: 20M rows in 5 groups x 7 x-levels, labels drawn by
   the Knuth-hash threshold trick with per-group planted
   coefficients — each group's two sweeps are replayed in numpy on
   exact grouped moments (1e-6, the logistic2 convention), and each
   group recovers its planted (b0, b1).

3. `holt`: 100k keys x 200 observations (20M rows) — the fold is an
   affine recursion in IEEE doubles with a pinned expression tree, so
   a vectorized numpy replay of the IDENTICAL operation sequence must
   match BIT-FOR-BIT on all 100k keys.

4. `hll`: 20M rows over 5M distinct keys — a hashlib replica of the
   md5 bucket/rho pipeline reproduces s33 EXACTLY and the estimate
   bit-for-bit (same IEEE expression), and n_exact == 5M.

5. `hits`: two complete bipartite blocks (4000x2500 + 2000x5000 =
   20M edges) — every 2-round authority/hub score is a closed-form
   integer (A^2*B and A^2*B^2), verified exactly for the top-k.

6. `poisson`: 20M rows, 7 x-levels, counts y = hash % (lvl+2) — the
   numpy replay runs the identical quantized recursion on EXACT
   integer moments per (level, y) cell (1e-6 on coefficients).

7. `tree2`: 20M rows, x = id % 101, y = [30 <= x < 70] — the
   depth-2 greedy fits are replayed exactly from closed-form
   per-value counts with the same gain expression and (gain DESC,
   threshold ASC) argmax; thresholds/counts exact, gains to 1e-12.

8. `streaming_transitions`: 4M events (200k users x 20 steps) split
   across 4 parquet files streamed one file per micro-batch — the
   summed deltas must reproduce the closed-form transition matrix
   EXACTLY (all 25 cells), exercising the cross-batch bridge at
   every file boundary.

Usage: python tools/stress_r9b.py [labelprop|logistic_by|holt|hll|
                                   hits|poisson|tree2|streaming]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r9b")


def stress_labelprop():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.graph import label_propagation

    spark = _spark()
    n_tri = 3_000_000
    tri = spark.range(0, n_tri, 1, 64)
    edges = (
        tri.select((3 * F.col("id")).alias("s"), (3 * F.col("id") + 1).alias("t"))
        .unionByName(
            tri.select(
                (3 * F.col("id") + 1).alias("s"), (3 * F.col("id") + 2).alias("t")
            )
        )
        .unionByName(
            tri.select(
                (3 * F.col("id")).alias("s"), (3 * F.col("id") + 2).alias("t")
            )
        )
    )
    t0 = time.time()
    out = label_propagation(edges, "s", "t", n_rounds=3)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("label") != F.col("node") - F.col("node") % 3).cast("long")
        ).alias("bad"),
    ).collect()[0]
    wall = time.time() - t0
    assert int(agg["n"]) == 3 * n_tri, agg["n"]
    assert int(agg["bad"]) == 0, agg["bad"]
    print(
        f"labelprop: {3 * n_tri} nodes / {6 * n_tri} symmetrized edge "
        f"rows, 3 rounds, all labels exact (triangle minima), "
        f"{wall:.1f}s"
    )


def _hash_label_counts(n, n_groups, n_levels, thr, knuth=2654435761):
    """Exact (group, level) -> (n, n_pos) counts for the Knuth-hash
    label draw y = [ (id*knuth) % 2^32 < thr[g, lvl] ]."""
    mod = 1 << 32
    n_cell = np.zeros((n_groups, n_levels), dtype=np.int64)
    n_pos = np.zeros((n_groups, n_levels), dtype=np.int64)
    for lo in range(0, n, 5_000_000):
        ids = np.arange(lo, min(lo + 5_000_000, n), dtype=np.uint64)
        g = (ids % n_groups).astype(np.int64)
        lvl = ((ids // n_groups) % n_levels).astype(np.int64)
        h = (ids * np.uint64(knuth)) % np.uint64(mod)
        y = h.astype(np.int64) < thr[g, lvl]
        np.add.at(n_cell, (g, lvl), 1)
        np.add.at(n_pos, (g, lvl), y.astype(np.int64))
    return n_cell, n_pos


def _newton_replay_logistic(levels, n_lvl, n_pos, n_iter, scale=1e6, wbits=16):
    """The identical quantized-Newton recursion on grouped moments
    (the stress_r9 logistic replica, shared here by two stresses)."""
    W = 1 << wbits
    xu = np.round(levels * scale)
    b0 = b1p = 0.0
    for _ in range(n_iter):
        t = b0 + b1p * xu
        p = 1.0 / (1.0 + np.exp(-t))
        wq = np.floor(p * (1.0 - p) * W)
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
    return b0, b1p * scale


def stress_logistic_by():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import logistic2_by

    spark = _spark()
    n, n_groups = 20_000_000, 5
    knuth = 2654435761
    mod = 1 << 32
    levels = np.arange(7) - 3.0
    # planted per-group coefficients (0.3 + 0.05g, 0.7 + 0.05g)
    b0s = 0.3 + 0.05 * np.arange(n_groups)
    b1s = 0.7 + 0.05 * np.arange(n_groups)
    thr = (
        1.0 / (1.0 + np.exp(-(b0s[:, None] + b1s[:, None] * levels[None, :])))
        * mod
    ).astype(np.int64)
    thr_flat = [int(thr[g, l]) for g in range(n_groups) for l in range(7)]
    df = spark.range(0, n, 1, 64).select(
        (F.col("id") % n_groups).alias("g"),
        (((F.col("id") / n_groups).cast("long") % 7) - 3)
        .cast("double")
        .alias("x"),
        (
            (F.col("id") * F.lit(knuth)) % F.lit(mod)
            < F.element_at(
                F.array(*[F.lit(t) for t in thr_flat]),
                (
                    (F.col("id") % n_groups) * 7
                    + (F.col("id") / n_groups).cast("long") % 7
                    + 1
                ).cast("int"),
            )
        ).cast("long").alias("y"),
    )
    t0 = time.time()
    rows = logistic2_by(df, "g", "x", "y", n_iter=2).collect()
    wall = time.time() - t0
    got = {int(r["g"]): r for r in rows}
    n_cell, n_pos = _hash_label_counts(n, n_groups, 7, thr)
    assert set(got) == set(range(n_groups))
    for g in range(n_groups):
        b0, b1 = _newton_replay_logistic(levels, n_cell[g], n_pos[g], 2)
        r = got[g]
        assert r["n"] == int(n_cell[g].sum()), (g, r["n"])
        assert r["n_pos"] == int(n_pos[g].sum()), (g, r["n_pos"])
        assert abs(r["b0"] - b0) < 1e-6 and abs(r["b1"] - b1) < 1e-6, (
            g, r["b0"], b0, r["b1"], b1,
        )
        # 2 Newton sweeps from beta=0 are mid-convergence (quadratic
        # but not yet landed): the certificate is the 1e-6 replay
        # match above; planted recovery is a sanity band only
        assert abs(r["b0"] - b0s[g]) < 0.15 and abs(r["b1"] - b1s[g]) < 0.15, (
            g, r["b0"], b0s[g], r["b1"], b1s[g],
        )
    print(
        f"logistic_by: 20M rows, 5 groups x 2 sweeps, all coefficients "
        f"match the numpy replay to 1e-6 (planted values within the "
        f"2-sweep convergence band 0.15), {wall:.1f}s"
    )


def stress_holt():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import holt

    spark = _spark()
    n_keys, per = 100_000, 200
    alpha, gamma = 0.3, 0.2
    df = spark.range(0, n_keys * per, 1, 64).select(
        (F.col("id") / per).cast("long").alias("k"),
        (F.col("id") % per).alias("t"),
        (
            (
                (F.col("id") / per).cast("long")
                + (F.col("id") % per) * (F.col("id") % per)
            )
            % 97
        ).cast("double").alias("v"),
    )
    t0 = time.time()
    rows = holt(df, "k", "t", "v", alpha=alpha, gamma=gamma).collect()
    wall = time.time() - t0
    assert len(rows) == n_keys, len(rows)
    # vectorized replay of the IDENTICAL IEEE expression tree
    ks = np.arange(n_keys, dtype=np.int64)
    A, nA, G, nG = alpha, 1.0 - alpha, gamma, 1.0 - gamma
    v = lambda t: ((ks + t * t) % 97).astype(np.float64)  # noqa: E731
    v1, v2 = v(0), v(1)
    l = A * v2 + nA * (v1 + (v2 - v1))
    b = G * ((A * v2 + nA * (v1 + (v2 - v1))) - v1) + nG * (v2 - v1)
    for t in range(2, per):
        x = v(t)
        l_new = A * x + nA * (l + b)
        b = G * ((A * x + nA * (l + b)) - l) + nG * b
        l = l_new
    got_l = np.empty(n_keys)
    got_b = np.empty(n_keys)
    for r in rows:
        got_l[int(r["k"])] = r["level"]
        got_b[int(r["k"])] = r["trend"]
    assert np.array_equal(got_l, l), "level diverged from IEEE replay"
    assert np.array_equal(got_b, b), "trend diverged from IEEE replay"
    print(
        f"holt: 20M rows ({n_keys} keys x {per}), level/trend "
        f"BIT-IDENTICAL to the vectorized IEEE replay on all keys, "
        f"{wall:.1f}s"
    )


def stress_hll():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.sketch import hll_distinct

    spark = _spark()
    n, n_distinct, b = 20_000_000, 5_000_000, 8
    m = 1 << b
    df = spark.range(0, n, 1, 64).select(
        (F.col("id") % n_distinct).alias("k")
    )
    t0 = time.time()
    r = hll_distinct(df, "k", b=b).collect()[0]
    wall = time.time() - t0
    assert int(r["n_exact"]) == n_distinct, r["n_exact"]
    # hashlib replica of the md5 bucket/rho pipeline (keys hash as
    # their string rendering, the operator's cross-engine contract)
    t1 = time.time()
    mx = np.zeros(m, dtype=np.int64)
    for k in range(n_distinct):
        hx = hashlib.md5(str(k).encode()).hexdigest()
        bkt = int(hx[: b // 4], 16)
        v32 = int(hx[b // 4 : b // 4 + 8], 16)
        rho = 33 if v32 == 0 else 33 - v32.bit_length()
        if rho > mx[bkt]:
            mx[bkt] = rho
    seen = int((mx > 0).sum())
    s33 = int(sum(1 << (33 - int(x)) for x in mx if x > 0)) + (
        m - seen
    ) * 8589934592
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    est = alpha * float(m) * float(m) * 8589934592.0 / float(s33)
    replica_wall = time.time() - t1
    assert int(r["s33"]) == s33, (r["s33"], s33)
    assert int(r["n_empty"]) == m - seen, (r["n_empty"], m - seen)
    assert r["est"] == est, (r["est"], est)
    assert abs(r["rel_err"]) < 5 * 1.04 / (m ** 0.5), r["rel_err"]
    print(
        f"hll: 20M rows / {n_distinct} distinct, s33 and estimate "
        f"BIT-IDENTICAL to the hashlib replica (est={r['est']:.0f}, "
        f"rel_err={r['rel_err']:+.4f}), {wall:.1f}s "
        f"(+{replica_wall:.0f}s replica)"
    )


def stress_hits():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.graph import hits

    spark = _spark()
    # two complete bipartite blocks: 4000x2500 and 2000x5000
    a1, b1, a2, b2 = 4000, 2500, 2000, 5000
    e1 = spark.range(0, a1 * b1, 1, 32).select(
        (F.col("id") % a1).alias("s"),
        (F.lit(1_000_000) + (F.col("id") / a1).cast("long")).alias("t"),
    )
    e2 = spark.range(0, a2 * b2, 1, 32).select(
        (F.lit(10_000) + F.col("id") % a2).alias("s"),
        (F.lit(1_100_000) + (F.col("id") / a2).cast("long")).alias("t"),
    )
    t0 = time.time()
    rows = hits(e1.unionByName(e2), "s", "t", n_iter=2, k=10).collect()
    wall = time.time() - t0
    # closed form after 2 rounds: authority a2 = A^2 * B per block;
    # block1 = 4000^2*2500 = 4e10 > block2 = 2000^2*5000 = 2e10, so
    # the top 10 are the 10 smallest block-1 authority ids; pure
    # sinks have hub 0
    exp_auth = a1 * a1 * b1
    assert len(rows) == 10
    for i, r in enumerate(rows):
        assert int(r["node"]) == 1_000_000 + i, (i, r["node"])
        assert int(r["authority"]) == exp_auth, (i, r["authority"])
        assert int(r["hub"]) == 0, (i, r["hub"])
    print(
        f"hits: {a1 * b1 + a2 * b2} edges, 2 rounds, top-10 "
        f"authorities exact (A^2*B = {exp_auth}), {wall:.1f}s"
    )


def stress_poisson():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import poisson2

    spark = _spark()
    n = 20_000_000
    knuth = 2654435761
    mod = 1 << 32
    levels = np.arange(7) - 3.0  # x in {-3..3}
    # y = hash % (lvl_index + 2): counts in 0..lvl_index+1
    df = spark.range(0, n, 1, 64).select(
        ((F.col("id") % 7) - 3).cast("double").alias("x"),
        (
            ((F.col("id") * F.lit(knuth)) % F.lit(mod))
            % (F.col("id") % 7 + 2)
        ).cast("long").alias("y"),
    )
    t0 = time.time()
    r = poisson2(df, "x", "y", n_iter=3, scale=1e6, wbits=16).collect()[0]
    wall = time.time() - t0
    # exact (level, y) cell counts from the same hash
    counts: dict = {}
    for lo in range(0, n, 5_000_000):
        ids = np.arange(lo, min(lo + 5_000_000, n), dtype=np.uint64)
        lvl = (ids % 7).astype(np.int64)
        y = ((ids * np.uint64(knuth)) % np.uint64(mod)).astype(
            np.int64
        ) % (lvl + 2)
        for li in range(7):
            for yi in range(li + 2):
                key = (li, yi)
                counts[key] = counts.get(key, 0) + int(
                    ((lvl == li) & (y == yi)).sum()
                )
    # identical quantized recursion on the exact cell grid; moments
    # accumulate as PYTHON INTS (the engine sums DECIMAL(38,0)) and
    # convert to float only at the solve, exactly like the operator
    W = 1 << 16
    xu = [int(x) * 1_000_000 for x in levels]
    import math as _math

    b0 = b1p = 0.0
    for _ in range(3):
        sw = swx = swxx = sg = sgx = 0
        for (li, yi), c in counts.items():
            mu = _math.exp(b0 + b1p * float(xu[li]))
            wq = int(_math.floor(mu * W))
            gq = int(_math.floor((float(yi) - mu) * W + 0.5))
            sw += wq * c
            swx += wq * xu[li] * c
            swxx += wq * xu[li] * xu[li] * c
            sg += gq * c
            sgx += gq * xu[li] * c
        swf, swxf, swxxf = float(sw), float(swx), float(swxx)
        sgf, sgxf = float(sg), float(sgx)
        det = swf * swxxf - swxf * swxf
        b0 += (swxxf * sgf - swxf * sgxf) / det
        b1p += (swf * sgxf - swxf * sgf) / det
    b1 = b1p * 1e6
    n_exp = sum(counts.values())
    sum_y = sum(yi * c for (_, yi), c in counts.items())
    assert r["n"] == n_exp and r["sum_y"] == sum_y, (r["n"], r["sum_y"])
    assert abs(r["b0"] - b0) < 1e-6 and abs(r["b1"] - b1) < 1e-6, (
        r["b0"], b0, r["b1"], b1,
    )
    print(
        f"poisson: 20M rows, 3 sweeps, b0={r['b0']:.6f} "
        f"b1={r['b1']:.6f} match the integer-moment replay to 1e-6, "
        f"{wall:.1f}s"
    )


def stress_tree2():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import tree_depth2

    spark = _spark()
    n, n_vals = 20_000_000, 101
    df = spark.range(0, n, 1, 64).select(
        (F.col("id") % n_vals).alias("x"),
        ((F.col("id") % n_vals >= 30) & (F.col("id") % n_vals < 70))
        .cast("long")
        .alias("y"),
    )
    t0 = time.time()
    rows = {r["node"]: r for r in tree_depth2(df, "x", "y").collect()}
    wall = time.time() - t0

    # exact per-value counts, then the identical gain expression and
    # (gain DESC, threshold ASC) argmax
    def counts(vals):
        return {
            v: (
                n // n_vals + (1 if v < n % n_vals else 0),
                (n // n_vals + (1 if v < n % n_vals else 0))
                * (1 if 30 <= v < 70 else 0),
            )
            for v in vals
        }

    def replay(cell):
        tot_n = sum(c for c, _ in cell.values())
        tot_p = sum(p for _, p in cell.values())
        if tot_n < 2:
            return None
        parent = 2.0 * (tot_p / tot_n) * (1.0 - tot_p / tot_n)
        best = None
        cc = cp = 0
        for v in sorted(cell):
            c, p = cell[v]
            cc += c
            cp += p
            if cc >= tot_n:
                continue
            nl, pl = float(cc), float(cp)
            nr, pr = float(tot_n) - nl, float(tot_p) - pl
            gini_l = 2.0 * (pl / nl) * (1.0 - pl / nl)
            gini_r = 2.0 * (pr / nr) * (1.0 - pr / nr)
            child = (nl / float(tot_n)) * gini_l + (
                nr / float(tot_n)
            ) * gini_r
            gain = parent - child
            if best is None or gain > best[1]:
                best = (v, gain, pl / nl, pr / nr, tot_n)
        return best

    cell = counts(range(n_vals))
    root = replay(cell)
    exp = {"root": root}
    t = root[0]
    left = replay({v: c for v, c in cell.items() if v <= t})
    right = replay({v: c for v, c in cell.items() if v > t})
    if left:
        exp["left"] = left
    if right:
        exp["right"] = right
    assert set(rows) == set(exp), (set(rows), set(exp))
    for node, (v, gain, p_l, p_r, tot_n) in exp.items():
        r = rows[node]
        assert int(r["threshold"]) == v and int(r["n"]) == tot_n, (node, r)
        assert abs(r["gain"] - gain) < 1e-12, (node, r["gain"], gain)
        assert abs(r["p_left"] - p_l) < 1e-12, (node, r["p_left"], p_l)
        assert abs(r["p_right"] - p_r) < 1e-12, (node, r["p_right"], p_r)
    print(
        f"tree2: 20M rows, 101 distinct values, root/left/right "
        f"splits at ({rows['root']['threshold']}, "
        f"{rows.get('left', {}) and rows['left']['threshold']}, "
        f"{rows.get('right', {}) and rows['right']['threshold']}) all "
        f"exact vs the closed-form replay, {wall:.1f}s"
    )


def stress_streaming_transitions():
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from hdfe_spark.streaming.ops import streaming_transitions

    spark = _spark()
    n_users, steps = 200_000, 20
    tmp = tempfile.mkdtemp(prefix="stress_r9b_stream_")
    try:
        # 4 files of 5 steps each: every file boundary forces the
        # cross-batch bridge transition for every user
        for part in range(4):
            lo, hi = part * 5, part * 5 + 5
            spark.range(0, n_users, 1, 8).select(
                F.col("id").alias("user_id"),
                F.explode(
                    F.array(*[F.lit(j) for j in range(lo, hi)])
                ).alias("j"),
            ).select(
                "user_id",
                F.col("j").cast("long").alias("event_id"),
                ((F.col("user_id") + F.col("j") * F.col("j")) % 5)
                .cast("string")
                .alias("event_type"),
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{tmp}/f{part}"
            )
            # move the single part file up so maxFilesPerTrigger=1
            # maps one written chunk to one micro-batch
            sub = f"{tmp}/f{part}"
            pq = [f for f in os.listdir(sub) if f.endswith(".parquet")]
            os.rename(f"{sub}/{pq[0]}", f"{tmp}/chunk{part}.parquet")
            shutil.rmtree(sub)
            # pin ascending mtimes: FileStreamSource orders batches
            # by timestamp, and the bridge guard RAISES on
            # out-of-order delivery — make the order deterministic
            ts = 1_700_000_000 + part * 60
            os.utime(f"{tmp}/chunk{part}.parquet", (ts, ts))
        schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        sm = streaming_transitions(stream, "user_id", "event_id", "event_type")
        t0 = time.time()
        q = (
            sm.writeStream.format("memory")
            .queryName("stress_r9b_trans")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (int(r["src"]), int(r["dst"])): int(r["n"])
            for r in spark.table("stress_r9b_trans")
            .groupBy("src", "dst")
            .agg(F.sum("n").alias("n"))
            .collect()
        }
        wall = time.time() - t0
        # closed form (the stress_r9 transitions design)
        per_res = [
            n_users // 5 + (1 if r < n_users % 5 else 0) for r in range(5)
        ]
        exp: dict = {}
        for r in range(5):
            for j in range(steps - 1):
                key = ((r + j * j) % 5, (r + (j + 1) * (j + 1)) % 5)
                exp[key] = exp.get(key, 0) + per_res[r]
        assert got == exp, (len(got), len(exp))
        assert not spark.streams.active
        print(
            f"streaming_transitions: {n_users * steps} events over 4 "
            f"micro-batches (bridged at every boundary), all "
            f"{len(got)} summed-delta cells exact, {wall:.1f}s"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {
        "labelprop": stress_labelprop,
        "logistic_by": stress_logistic_by,
        "holt": stress_holt,
        "hll": stress_hll,
        "hits": stress_hits,
        "poisson": stress_poisson,
        "tree2": stress_tree2,
        "streaming": stress_streaming_transitions,
    }
    for name, fn in fns.items():
        if which in ("all", name):
            fn()
