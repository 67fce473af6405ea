"""Alternating A/B measurement for round-16 optimization candidates.

Usage: python tools/ab_r16.py <experiment> [reps]

Same protocol as tools/ab_r15b.py (the OPTIMIZATION_r15.md decision
protocol): one Spark session, variants alternated per repetition via
operator-level env kill-switches so host drift cancels; timed action =
noop sink (guide §1.4); bench-identical cache clearing between reps so
query-scoped persists cannot leak across the timed region. Prints
per-rep times and medians.

Experiments:
  cluster2_gate  se_cluster2: exact four-pass (kill-switch) vs gated
                 default (gate declines on the fixture) vs forced
                 one-pass (ratio=1.1) — validates VERDICT r15 item 1
  within_var     within estimate + homoskedastic SE: window demean vs
                 moment fast path (HDFE_WITHIN_FAST)
  fit_stats      declared ols_fit_stats query: window vs moment pass
  pooled_se      declared se_pooled + se_robust: two-pass vs one-pass
                 (HDFE_POOLED_FAST)
  ngram          declared ngram_jaccard query: unfused (2 Arrow
                 passes) vs fused signature persist (HDFE_NGRAM_FUSED)
  minhash        declared minhash_dedup: regression check after the
                 persist-registry change (default vs default)
  tfidf          declared tfidf_topk: current plan vs n_d-via-join
                 variant vs df_t-via-window variant (inline rewrites,
                 measurement only)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _clear(spark):
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        jmap.get(rid).unpersist(False)


def run_variants(spark, name, variants, reps=5):
    """variants: list of (label, env_dict, build_fn)."""
    results = {lab: [] for lab, _, _ in variants}
    # Save every key any variant touches so the caller's environment
    # is restored afterwards (review r16: popping keys clobbered
    # pre-set kill-switches for subsequent experiments).
    saved = {
        k: os.environ.get(k) for _, env, _ in variants for k in env
    }

    def _apply(env):
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    for lab, env, build in variants:  # warmup one each
        _apply(env)
        _noop(build(spark))
        _clear(spark)
    for i in range(reps):
        for lab, env, build in variants:
            _apply(env)
            spark.sparkContext.setJobDescription(f"{name}:{lab}:{i}")
            t0 = time.perf_counter()
            _noop(build(spark))
            dt = time.perf_counter() - t0
            _clear(spark)
            results[lab].append(dt)
            print(f"  rep{i} {lab}: {dt:.3f}s", flush=True)
    for lab, _, _ in variants:
        v = results[lab]
        print(
            f"{name} {lab}: med={statistics.median(v):.3f} "
            f"min={min(v):.3f} all={[round(x, 3) for x in v]}",
            flush=True,
        )
    # restore the caller's environment for every key touched
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    return results


def _tfidf_variant(spark, sf_dir, mode):
    """Inline tf_idf rewrites for measurement (values must match the
    shipped operator — verified by the caller before adoption)."""
    from hdfe_spark.operators.text import tokens
    from hdfe_spark.sources.tables import load_table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = load_table(spark, "documents", sf_dir)
    id_col, text_col, top_k = "doc_id", "text", 3
    n_docs_df = df.select(
        (
            F.countDistinct(id_col)
            + F.max(F.col(id_col).isNull().cast("long"))
        ).alias("__n_docs")
    )
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tc = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("n_td"))
    if mode == "nd_join":
        nd = tc.groupBy(id_col).agg(F.sum("n_td").alias("n_d"))
        tc = tc.join(F.broadcast(nd), on=id_col)
    else:
        wdoc = Window.partitionBy(id_col)
        tc = tc.withColumn("n_d", F.sum("n_td").over(wdoc))
    if mode == "dft_window":
        wterm = Window.partitionBy("term")
        out = tc.withColumn("df_t", F.count(F.lit(1)).over(wterm))
    else:
        docfreq = tc.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
        out = tc.join(F.broadcast(docfreq), on="term")
    out = out.crossJoin(F.broadcast(n_docs_df)).select(
        F.col(id_col),
        "term",
        (
            (F.col("n_td") / F.col("n_d"))
            * (
                F.log(
                    (F.col("__n_docs") + F.lit(1.0))
                    / (F.col("df_t") + F.lit(1.0))
                )
                + F.lit(1.0)
            )
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    out = (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .drop("__rn")
    )
    return out.select(id_col, "term", F.round("tfidf", 6).alias("tfidf"))


def main():
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import __spark_entry__ as entrymod
    from hdfe_spark.session import get_spark
    from hdfe_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"ab_r16_{exp}")
    load_table(spark, "lineitem", SF_DIR).agg(F.count(F.lit(1))).collect()
    qs = entrymod.queries()

    def q(name):
        return lambda spark: qs[name](spark, SF_DIR)

    if exp == "cluster2_gate":
        run_variants(
            spark, exp,
            [
                ("exact", {"HDFE_CLUSTER2_FAST": "0"}, q("se_cluster2")),
                ("gated", {"HDFE_CLUSTER2_FAST": None,
                           "HDFE_CLUSTER2_PAIR_RATIO": None}, q("se_cluster2")),
                ("onepass", {"HDFE_CLUSTER2_FAST": None,
                             "HDFE_CLUSTER2_PAIR_RATIO": "1.1"},
                 q("se_cluster2")),
            ],
            reps,
        )
    elif exp == "within_var":
        def build(spark):
            import numpy as np

            from hdfe_spark.operators.estimate import estimate

            li = load_table(spark, "lineitem", SF_DIR)
            res = estimate(
                li, "l_extendedprice", ["l_quantity", "l_discount"],
                categorical_controls=["l_suppkey"], estimate_variance=True,
            )
            se = np.sqrt(np.maximum(np.diag(res.V[0]), 0.0))
            return spark.createDataFrame(
                [{"se_q": float(se[0]), "se_d": float(se[1])}],
                schema="se_q double, se_d double",
            )

        run_variants(
            spark, exp,
            [
                ("window", {"HDFE_WITHIN_FAST": "0"}, build),
                ("moments", {"HDFE_WITHIN_FAST": None}, build),
            ],
            reps,
        )
    elif exp == "fit_stats":
        run_variants(
            spark, exp,
            [
                ("window", {"HDFE_WITHIN_FAST": "0"}, q("ols_fit_stats")),
                ("moments", {"HDFE_WITHIN_FAST": None}, q("ols_fit_stats")),
            ],
            reps,
        )
    elif exp == "pooled_se":
        for qn in ("se_pooled", "se_robust"):
            run_variants(
                spark, f"{exp}:{qn}",
                [
                    ("twopass", {"HDFE_POOLED_FAST": "0"}, q(qn)),
                    ("onepass", {"HDFE_POOLED_FAST": None}, q(qn)),
                ],
                reps,
            )
    elif exp == "ngram":
        run_variants(
            spark, exp,
            [
                ("unfused", {"HDFE_NGRAM_FUSED": "0"}, q("ngram_jaccard")),
                ("fused", {"HDFE_NGRAM_FUSED": None}, q("ngram_jaccard")),
            ],
            reps,
        )
    elif exp == "setsim":
        run_variants(
            spark, exp,
            [
                ("unfused", {"HDFE_SETSIM_FUSED": "0"}, q("setsim_join")),
                ("fused", {"HDFE_SETSIM_FUSED": None}, q("setsim_join")),
            ],
            reps,
        )
    elif exp == "minhash":
        run_variants(
            spark, exp,
            [("default", {}, q("minhash_dedup"))],
            reps,
        )
    elif exp == "tfidf":
        run_variants(
            spark, exp,
            [
                ("current", {}, q("tfidf_topk")),
                ("nd_join", {},
                 lambda s: _tfidf_variant(s, SF_DIR, "nd_join")),
                ("dft_window", {},
                 lambda s: _tfidf_variant(s, SF_DIR, "dft_window")),
            ],
            reps,
        )
    else:
        raise SystemExit(f"unknown experiment {exp!r}")


if __name__ == "__main__":
    main()
