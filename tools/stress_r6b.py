"""Round-6 late stress: the three operator families built in the
round-6 continuation session.

1. setsim_join at 100k docs: planted near-duplicate pairs must ALL be
   recovered (the op is exact, so recall must be 1.0 by construction)
   and the prefix-filter candidate volume must stay far below
   all-pairs.

2. heavy_hitters at 20M rows with a zipf-ish key universe: output
   must equal the exact groupBy truth; record candidate-set size (the
   shuffle-volume bound) vs the distinct-key universe.

3. triangle_count at ~1M edges with a 20k-degree hub: closed-form
   truth (disjoint 10-cliques + a hub over some of them). The
   degree orientation must keep the hub harmless: its edges all point
   AT it, so it contributes zero wedges.

Usage: python tools/stress_r6b.py [setsim|hh|triangle]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r6b")


def stress_setsim(n: int = 100_000, doc_len: int = 80, n_dups: int = 2_000):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.setjoin import setsim_join

    spark = _spark()
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(50_000)])
    base = vocab[rng.integers(0, len(vocab), size=(n - n_dups, doc_len))]
    texts = [" ".join(row) for row in base]
    # Planted near-dups: copy a doc and perturb 2 tokens (J stays
    # well above 0.8 at the shingle level? 2 edits kill up to 10 of 76
    # shingles -> J >= (76-10)/(76+10) ~ 0.77.. keep 1 edit: J >=
    # (76-5)/(76+5) ~ 0.88).
    dup_src = rng.integers(0, n - n_dups, size=n_dups)
    for s in dup_src:
        toks = texts[s].split()
        pos = rng.integers(5, doc_len - 5)
        toks[pos] = "zz" + toks[pos]
        texts.append(" ".join(toks))
    expected = {(int(s), int(n - n_dups + i)) for i, s in enumerate(dup_src)}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).repartition(32)
    t0 = time.time()
    pairs = setsim_join(df, "doc_id", "text", tau=0.8, shingle_k=5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    dt = time.time() - t0
    missed = expected - got
    extra = got - expected
    print(
        f"setsim: n={n} dups={n_dups} wall={dt:.1f}s found={len(got)} "
        f"missed={len(missed)} extra={len(extra)}"
    )
    assert not missed, f"exact op missed planted pairs: {sorted(missed)[:5]}"


def stress_hh(n: int = 20_000_000, s: int = 1000):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.sketch import heavy_hitters, misra_gries_candidates

    spark = _spark()
    # Zipf-ish keys in pure JVM codegen: key = floor(1/u) capped, so
    # frequency(k) ~ 1/k^2 tail with a handful of hot keys, ~4.5k
    # distinct under the cap; plus a uniform cold tail to widen the
    # universe to ~1M distinct.
    df = (
        spark.range(n)
        .withColumn("u", F.rand(seed=3))
        .withColumn(
            "k",
            F.when(
                F.col("u") < 0.7,
                F.concat(
                    F.lit("z"),
                    F.least(
                        F.floor(1.0 / F.greatest(F.rand(seed=5), F.lit(1e-9))),
                        F.lit(100_000),
                    ).cast("string"),
                ),
            ).otherwise(
                F.concat(F.lit("t"), (F.col("id") % 1_000_000).cast("string"))
            ),
        )
        .select("k")
    )
    df = df.persist()
    n_actual = df.count()
    t0 = time.time()
    got = {r.k: r.cnt for r in heavy_hitters(df, "k", s).collect()}
    dt = time.time() - t0
    n_cand = misra_gries_candidates(df, "k", k=s).count()
    t1 = time.time()
    truth = {
        r.k: r.cnt
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * s >= n_actual)
        .collect()
    }
    dt_exact = time.time() - t1
    n_distinct = df.select("k").distinct().count()
    df.unpersist()
    print(
        f"hh: n={n_actual} s={s} wall={dt:.1f}s exact_groupby={dt_exact:.1f}s "
        f"hitters={len(got)} candidates={n_cand} distinct_keys={n_distinct}"
    )
    assert got == truth, "heavy_hitters diverged from exact truth"


def stress_triangle(n_cliques: int = 20_000, clique: int = 10, hub_cliques: int = 8_000):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.graph import triangle_count

    spark = _spark()
    # Disjoint `clique`-cliques: vertex v = cid*clique + j. Edges per
    # clique C(10,2)=45 -> 900k edges; hub = vertex -1 joined to every
    # vertex of the first `hub_cliques` cliques (degree 80k).
    cid = F.floor(F.col("id") / (clique * (clique - 1) // 2))
    pair = F.col("id") % (clique * (clique - 1) // 2)
    # map pair index 0..44 -> (i<j) within the clique via precomputed arrays
    import itertools

    ij = list(itertools.combinations(range(clique), 2))
    i_arr = F.array(*[F.lit(a) for a, _ in ij])
    j_arr = F.array(*[F.lit(b) for _, b in ij])
    base = (
        spark.range(n_cliques * len(ij))
        .select(
            (cid * clique + i_arr[pair.cast("int")]).alias("u"),
            (cid * clique + j_arr[pair.cast("int")]).alias("v"),
        )
    )
    hub = (
        spark.range(hub_cliques * clique)
        .select(F.lit(-1).cast("bigint").alias("u"), F.col("id").alias("v"))
    )
    edges = base.unionAll(hub).repartition(64)
    expected = n_cliques * (clique * (clique - 1) * (clique - 2) // 6) + hub_cliques * (
        clique * (clique - 1) // 2
    )
    t0 = time.time()
    got = triangle_count(edges).collect()[0].n_triangles
    dt = time.time() - t0
    n_edges = n_cliques * len(ij) + hub_cliques * clique
    print(
        f"triangle: edges={n_edges} hub_degree={hub_cliques * clique} "
        f"wall={dt:.1f}s got={got} expected={expected}"
    )
    assert got == expected


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("setsim", "all"):
        stress_setsim()
    if which in ("hh", "all"):
        stress_hh()
    if which in ("triangle", "all"):
        stress_triangle()
