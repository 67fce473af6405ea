"""Exact old-path vs new-path equivalence check for the r15b
optimization candidates, Spark vs Spark in one session.

For each touched query: build with the kill-switch OFF (old plan) and
ON (new plan), collect both, sort rows, and compare EXACTLY (bitwise
on the collected Python values). This is the direct statement of the
round contract — "do not change what any declared query computes" —
and is stronger than the rounded DuckDB oracle for refactor drift.

Usage: python tools/equiv_r15b.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def collect_sorted(df):
    rows = [tuple(r) for r in df.collect()]
    rows.sort(key=lambda t: tuple((v is None, str(type(v)), v) for v in t))
    return df.columns, rows


def main():
    from pyspark.sql import functions as F

    from hdfe_spark.session import get_spark
    from hdfe_spark.sources.tables import load_table

    spark = get_spark(app_name="equiv_r15b")

    def q_transform(spark):
        from hdfe_spark.operators.groupby import grouped_transform

        ev = load_table(spark, "events", SF_DIR)
        out = grouped_transform(ev, "user_id", {"value": ["mean", "count"]})
        return out.select(
            "event_id",
            "user_id",
            F.round("mean_value", 5).alias("mean_value"),
            F.col("count_value").cast("bigint").alias("count_value"),
        )

    def q_demean(spark):
        from hdfe_spark.operators.groupby import demean

        ev = load_table(spark, "events", SF_DIR)
        out = demean(ev, "user_id", "value")
        return out.select(
            "event_id", "user_id", F.round("value_dm", 3).alias("value_dm")
        )

    def q_minhash(spark):
        from hdfe_spark.operators.dedup import minhash_dedup

        docs = load_table(spark, "documents", SF_DIR)
        out = minhash_dedup(docs, num_hashes=128, bands=16, jaccard_threshold=0.8)
        return out.select("doc_id", "lang", "source")

    def q_emb_lsh(spark):
        from hdfe_spark.operators.dedup import embedding_neardup_pairs

        emb = load_table(spark, "embeddings", SF_DIR)
        out = embedding_neardup_pairs(emb, threshold=0.4, n_tables=16)
        return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))

    def q_emb_lsh_unrounded(spark):
        from hdfe_spark.operators.dedup import embedding_neardup_pairs

        emb = load_table(spark, "embeddings", SF_DIR)
        return embedding_neardup_pairs(emb, threshold=0.4, n_tables=16)

    def q_emb_recall(spark):
        from hdfe_spark.operators.dedup import (
            embedding_neardup_exact,
            embedding_neardup_pairs,
        )

        emb = load_table(spark, "embeddings", SF_DIR)
        exact = embedding_neardup_exact(emb, threshold=0.4).select("id_a", "id_b")
        approx = embedding_neardup_pairs(emb, threshold=0.4, n_tables=16).select(
            "id_a", "id_b", F.lit(1).alias("__hit")
        )
        hit = F.coalesce(F.sum("__hit"), F.lit(0))
        return (
            exact.join(F.broadcast(approx), ["id_a", "id_b"], "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_exact"),
                hit.cast("bigint").alias("n_found"),
                F.round(hit / F.count(F.lit(1)), 6).alias("recall"),
            )
        )

    cases = [
        ("grouped_transform", "HDFE_TRANSFORM_JOIN", q_transform),
        ("demean", "HDFE_TRANSFORM_JOIN", q_demean),
        ("minhash_dedup", "HDFE_MINHASH_FUSED", q_minhash),
        ("embedding_neardup_lsh", "HDFE_EMB_LSH_PAIRS", q_emb_lsh),
        # The *unrounded* cosine differs between paths at the last-ULP
        # level (the pairs path reuses make_pair_cosine_udf — einsum
        # per pair — while the grouped-GEMM verifier sums in BLAS
        # block order), so it is checked as pair-set identity +
        # |Δcosine| ≤ 1e-12, not bitwise. The DECLARED query rounds to
        # 6 decimals and is checked bitwise above.
        ("emb_lsh_unrounded~1e-12", "HDFE_EMB_LSH_PAIRS", q_emb_lsh_unrounded),
        ("emb_lsh_recall_cert", "HDFE_EMB_LSH_PAIRS", q_emb_recall),
    ]
    n_bad = 0
    for name, flag, build in cases:
        os.environ[flag] = "0"
        cols_old, rows_old = collect_sorted(build(spark))
        os.environ[flag] = "1"
        cols_new, rows_new = collect_sorted(build(spark))
        os.environ.pop(flag, None)
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(False)
        if name.endswith("~1e-12"):
            keys_old = [r[:-1] for r in rows_old]
            keys_new = [r[:-1] for r in rows_new]
            if cols_old != cols_new or keys_old != keys_new:
                print(f"FAIL {name}: pair sets differ")
                n_bad += 1
            elif any(
                abs(a[-1] - b[-1]) > 1e-12
                for a, b in zip(rows_old, rows_new)
            ):
                print(f"FAIL {name}: cosine drift > 1e-12")
                n_bad += 1
            else:
                print(
                    f"ok    {name}: {len(rows_old)} pairs identical, "
                    "values within 1e-12"
                )
            continue
        if cols_old != cols_new:
            print(f"FAIL {name}: columns differ {cols_old} vs {cols_new}")
            n_bad += 1
        elif len(rows_old) != len(rows_new):
            print(f"FAIL {name}: {len(rows_old)} vs {len(rows_new)} rows")
            n_bad += 1
        elif rows_old != rows_new:
            diffs = [
                (a, b) for a, b in zip(rows_old, rows_new) if a != b
            ][:5]
            print(f"FAIL {name}: {len(diffs)}+ differing rows, first: {diffs}")
            n_bad += 1
        else:
            print(f"ok    {name}: {len(rows_old)} rows bit-identical")
    print(f"{len(cases) - n_bad} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
