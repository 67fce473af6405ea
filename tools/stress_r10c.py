"""Round-10 stress: the model-eval family + text/graph batch at
4-24M rows, each against a CLOSED-FORM truth (never the operator's
own output).

1. `skipgram_pairs`: 2M docs x 10 tokens over a 100k-word cyclic
   vocabulary (20M tokens). Every doc's tokens are a consecutive
   vocab slice, so each cyclic pair (w_j, w_{j+1}) occurs exactly
   180 times and (w_j, w_{j+2}) exactly 160 — verified for ALL 200k
   pairs by one aggregation.

2. `gopher_rules`: 20M docs cycling over 4 fixed templates — every
   metric of every template group must equal the pure-Python
   replica of the rules on that template (min == max == expected,
   one aggregation).

3. `common_neighbors`: 2M disjoint 4-node paths (6M edges) + 10
   planted K_{2,m} gadgets (m = 91..100) whose (u, v) pair is NOT
   an edge — the top-10 must be exactly the gadgets with cn = m,
   ra_q = m * 2^29, in m-descending order.

4. `ndcg_by`: 1M queries x 20 items (20M rows), scores aligned with
   ids and a fixed rel pattern — every query's (dcg_q, idcg_q,
   ndcg) equals the one Python-replica value (min == max checked by
   aggregation, zero rows collected beyond the 1-row check).

5. `lift_table`: 20M rows, score = a permutation, labels = 1 on the
   top eighth of scores — per-bucket counts are closed form
   (buckets 1-2 all-positive, bucket 3 quarter-positive at the
   8-bucket split boundary... computed analytically below).

6. `cuped`: 20M rows, x = i mod 1000, y = 2x + (i mod 2), variant =
   i mod 2 — every moment is an arithmetic-series closed form, so
   theta and both adjusted means are computed EXACTLY in Python
   (bigints) and compared to the operator's output.

Usage: python tools/stress_r10c.py [skipgram|gopher|cn|ndcg|lift|cuped]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r10c")


def stress_skipgram():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.text import skipgram_pairs

    spark = _spark()
    n_docs, V, L = 2_000_000, 100_000, 10
    docs = spark.range(0, n_docs, 1, 64).select(
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    ((F.col("id") + F.lit(p)) % V).cast("string"),
                )
                for p in range(L)
            ],
        ).alias("text")
    )
    t0 = time.time()
    out = skipgram_pairs(docs, "text", window=2, min_count=1)
    # per start s (each occurring n_docs/V times): 9 d=1 pairs, 8 d=2
    per_start = n_docs // V
    chk = out.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("n") == 9 * per_start).cast("long")).alias("n_d1"),
        F.sum((F.col("n") == 8 * per_start).cast("long")).alias("n_d2"),
        F.sum("n").alias("total"),
    ).collect()[0]
    dt = time.time() - t0
    assert chk["n_pairs"] == 2 * V, chk
    assert chk["n_d1"] == V and chk["n_d2"] == V, chk
    assert chk["total"] == n_docs * (9 + 8), chk
    print(f"skipgram_pairs 20M tokens: {dt:.1f}s — all {2*V} pair counts EXACT")


def _gopher_replica(text: str, min_words: int = 3):
    toks = [t for t in text.lower().split() if t != ""]
    nw = len(toks)
    clen = sum(len(t) for t in toks)
    nhash = text.count("#")
    nell = (len(text) - len(text.replace("...", ""))) // 3
    lines = text.split("\n")
    nb = sum(1 for ln in lines if ln.lstrip(" ")[:1] in ("-", "*", "•"))
    nalpha = sum(1 for t in toks if any("a" <= c <= "z" for c in t))
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    nstop = sum(1 for w in stops if w in toks)
    mwl = clen / nw if nw else None
    sym = (nhash + nell) / nw if nw else None
    bul = nb / len(lines) if lines else None
    alp = nalpha / nw if nw else None
    passes = bool(
        nw >= min_words
        and nw <= 100_000
        and mwl is not None
        and 3.0 <= mwl <= 10.0
        and sym < 0.1
        and bul < 0.9
        and nstop >= 2
        and alp > 0.8
    )
    return (nw, mwl, sym, bul, nstop, alp, passes)


def stress_gopher():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.text import gopher_rules

    spark = _spark()
    templates = [
        "the quick brown fox jumps over and over with great zeal of it",
        "short",
        "- bullet one\n- bullet two\nthe rest of the text and more",
        "sym ### bols ... everywhere ### the and of it goes on fine",
    ]
    n = 20_000_000
    tcol = F.col("id") % len(templates)
    expr = F.when(tcol == 0, F.lit(templates[0]))
    for i in range(1, len(templates)):
        expr = expr.when(tcol == i, F.lit(templates[i]))
    docs = spark.range(0, n, 1, 64).select(
        F.col("id").alias("doc_id"),
        tcol.alias("tpl"),
        expr.alias("text"),
    )
    t0 = time.time()
    out = gopher_rules(docs, min_words=3)
    per = (
        out.join(docs.select("doc_id", "tpl"), "doc_id")
        .groupBy("tpl")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                f(c).alias(f"{tag}_{c}")
                for c in (
                    "n_words", "mean_word_len", "symbol_ratio",
                    "bullet_ratio", "n_stop_hits", "alpha_frac",
                )
                for tag, f in (("mn", F.min), ("mx", F.max))
            ],
            F.min(F.col("passes").cast("long")).alias("mn_p"),
            F.max(F.col("passes").cast("long")).alias("mx_p"),
        )
        .collect()
    )
    dt = time.time() - t0
    for r in per:
        tpl = templates[r["tpl"]]
        nw, mwl, sym, bul, nstop, alp, passes = _gopher_replica(tpl)
        assert r["cnt"] == n // len(templates), r
        for col, want in (
            ("n_words", nw), ("mean_word_len", mwl),
            ("symbol_ratio", sym), ("bullet_ratio", bul),
            ("n_stop_hits", nstop), ("alpha_frac", alp),
        ):
            assert r[f"mn_{col}"] == r[f"mx_{col}"] == want, (
                col, tpl, r[f"mn_{col}"], want
            )
        assert r["mn_p"] == r["mx_p"] == int(passes), (tpl, r)
    print(f"gopher_rules 20M docs: {dt:.1f}s — all 4 template groups EXACT")


def stress_cn():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.graph import common_neighbors

    spark = _spark()
    n_paths = 2_000_000
    # path gadget p: nodes 10p..10p+3, edges (0-1, 1-2, 2-3)
    base = spark.range(0, n_paths, 1, 64).select(
        (F.col("id") * 10).alias("b")
    )
    paths = base.select(
        F.explode(
            F.array(
                F.struct(F.col("b").alias("u"), (F.col("b") + 1).alias("v")),
                F.struct((F.col("b") + 1).alias("u"), (F.col("b") + 2).alias("v")),
                F.struct((F.col("b") + 2).alias("u"), (F.col("b") + 3).alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    # 10 planted K_{2,m} gadgets, m = 100..91, in a disjoint id space
    specials = []
    for g in range(10):
        m = 100 - g
        u, v = 100_000_000 + g * 1000, 100_000_000 + g * 1000 + 1
        for j in range(m):
            c = 100_000_000 + g * 1000 + 10 + j
            specials.append((u, c))
            specials.append((v, c))
    sp = spark.createDataFrame(specials, "u long, v long")
    edges = paths.unionByName(sp)
    t0 = time.time()
    got = common_neighbors(edges, "u", "v", k=10, min_cn=2).collect()
    dt = time.time() - t0
    assert len(got) == 10, got
    for g, r in enumerate(got):
        m = 100 - g
        u, v = 100_000_000 + g * 1000, 100_000_000 + g * 1000 + 1
        assert (r["u"], r["v"]) == (u, v), (g, r)
        assert r["cn"] == m, (g, r)
        assert r["ra_q"] == m * (1 << 29), (g, r)
    print(
        f"common_neighbors 6M+ edges (2M paths + 10 gadgets): {dt:.1f}s"
        " — top-10 EXACT (cn, ra_q, order)"
    )


def stress_ndcg():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import ndcg_by

    spark = _spark()
    n_q, L = 1_000_000, 20
    # item i of query q: id = i, score = L - i (descending with id),
    # rel = (i * 7) % 4 — identical for every query
    rows = spark.range(0, n_q * L, 1, 64).select(
        (F.col("id") / L).cast("long").alias("q"),
        (F.col("id") % L).alias("i"),
    ).select(
        "q",
        F.col("i").alias("item"),
        (F.lit(L) - F.col("i")).cast("double").alias("s"),
        ((F.col("i") * 7) % 4).cast("long").alias("rel"),
    )
    k, qbits = 10, 30
    wq = [round((1 << qbits) / math.log2(r + 1)) for r in range(1, k + 1)]
    items = [(i, float(L - i), (i * 7) % 4) for i in range(L)]
    pred = sorted(items, key=lambda t: (-t[1], t[0]))
    ideal = sorted(items, key=lambda t: (-t[2], t[0]))
    dcg = sum(t[2] * wq[i] for i, t in enumerate(pred[:k]))
    idcg = sum(t[2] * wq[i] for i, t in enumerate(ideal[:k]))
    nd = dcg / idcg
    t0 = time.time()
    out = ndcg_by(rows, "q", "item", "s", "rel", k=k)
    chk = out.agg(
        F.count(F.lit(1)).alias("nq"),
        F.min("dcg_q").alias("d0"), F.max("dcg_q").alias("d1"),
        F.min("idcg_q").alias("i0"), F.max("idcg_q").alias("i1"),
        F.min("ndcg").alias("n0"), F.max("ndcg").alias("n1"),
    ).collect()[0]
    dt = time.time() - t0
    assert chk["nq"] == n_q
    assert chk["d0"] == chk["d1"] == dcg, (chk, dcg)
    assert chk["i0"] == chk["i1"] == idcg, (chk, idcg)
    assert chk["n0"] == chk["n1"] == nd, (chk, nd)
    print(
        f"ndcg_by 20M rows / 1M queries: {dt:.1f}s — every query's"
        " (dcg_q, idcg_q, ndcg) EXACT vs the Python replica"
    )


def stress_lift():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.ml import lift_table

    spark = _spark()
    n, B = 20_000_000, 8
    # score = id (all distinct); label = 1 iff score in the top n/8
    rows = spark.range(0, n, 1, 64).select(
        F.col("id").alias("rid"),
        F.col("id").cast("double").alias("s"),
        (F.col("id") >= n - n // 8).cast("long").alias("y"),
    )
    t0 = time.time()
    out = lift_table(rows, "rid", "s", "y", n_buckets=B).collect()
    dt = time.time() - t0
    per = n // B
    pos_total = n // 8
    assert [r["bucket"] for r in out] == list(range(1, B + 1))
    for r in out:
        assert r["n"] == per
        want_pos = pos_total if r["bucket"] == 1 else 0
        assert r["n_pos"] == want_pos, r
        assert r["cum_n"] == per * r["bucket"]
        assert r["cum_pos"] == pos_total
        want_lift = (pos_total * n) / (per * r["bucket"] * pos_total)
        assert r["cum_lift"] == want_lift, (r, want_lift)
    print(f"lift_table 20M rows: {dt:.1f}s — all {B} buckets EXACT")


def stress_cuped():
    from pyspark.sql import functions as F

    from hdfe_spark.operators.stats import cuped as cuped_op

    spark = _spark()
    n, M = 20_000_000, 1000
    rows = spark.range(0, n, 1, 64).select(
        (F.col("id") % 2).cast("string").alias("v"),
        (
            F.lit(2.0) * (F.col("id") % M).cast("double")
            + (F.col("id") % 2).cast("double")
        ).alias("y"),
        (F.col("id") % M).cast("double").alias("x"),
    )
    t0 = time.time()
    out = {
        r["v"]: r for r in cuped_op(rows, "v", "y", "x", scale=1.0).collect()
    }
    dt = time.time() - t0
    # exact bigint replica from arithmetic series: x_i = i mod M,
    # y_i = 2 x_i + (i mod 2). M is EVEN, so parity and residue are
    # CORRELATED — residue r occurs only with parity r % 2 (the
    # first cut assumed independent cells and the 20M run caught
    # it): each residue occurs n/M times.
    per_r = n // M
    xs = list(range(M))
    sx = per_r * sum(xs)
    sy = per_r * sum(2 * r + r % 2 for r in xs)
    sxx = per_r * sum(r * r for r in xs)
    sxy = per_r * sum(r * (2 * r + r % 2) for r in xs)
    theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    mean_x = float(sx) / float(n)
    for par in (0, 1):
        rs = [r for r in xs if r % 2 == par]
        nv = per_r * len(rs)
        syv = per_r * sum(2 * r + par for r in rs)
        sxv = per_r * sum(rs)
        my = float(syv) / float(nv)
        mx = float(sxv) / float(nv)
        want_cuped = (my - theta * (mx - mean_x)) * 1.0
        r = out[str(par)]
        assert r["n"] == nv
        assert r["theta"] == theta
        assert r["mean"] == my * 1.0
        assert r["mean_cuped"] == want_cuped, (r, want_cuped)
    print(
        f"cuped 20M rows: {dt:.1f}s — theta and both adjusted means"
        " EXACT vs the bigint closed form"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {
        "skipgram": stress_skipgram,
        "gopher": stress_gopher,
        "cn": stress_cn,
        "ndcg": stress_ndcg,
        "lift": stress_lift,
        "cuped": stress_cuped,
    }
    for name, fn in cases.items():
        if which in (name, "all"):
            fn()
