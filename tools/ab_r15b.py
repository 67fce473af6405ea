"""Alternating A/B measurement for round-15b optimization candidates.

Usage: python tools/ab_r15b.py <experiment> [reps]

Experiments flip the operator-level env kill-switches between builds
inside ONE Spark session and alternate old/new per repetition, so host
drift cancels (the decision protocol of OPTIMIZATION_r15.md). Timed
action = noop sink (guide §1.4). Prints per-rep times and medians.
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


def run_ab(spark, name, flag, build, reps=5):
    """Alternate flag=0 (old) / flag=1-or-default (new) builds."""
    import __spark_entry__  # noqa: F401  (registers nothing; parity with bench imports)

    results = {"old": [], "new": []}
    # warmup one each
    for variant in ("old", "new"):
        os.environ[flag] = "0" if variant == "old" else "1"
        _noop(build(spark))
        _clear(spark)
    for i in range(reps):
        for variant in ("old", "new"):
            os.environ[flag] = "0" if variant == "old" else "1"
            spark.sparkContext.setJobDescription(f"{name}:{variant}:{i}")
            t0 = time.perf_counter()
            _noop(build(spark))
            dt = time.perf_counter() - t0
            _clear(spark)
            results[variant].append(dt)
            print(f"  rep{i} {variant}: {dt:.3f}s", flush=True)
    for variant in ("old", "new"):
        v = results[variant]
        print(
            f"{name} {variant}: med={statistics.median(v):.3f} "
            f"min={min(v):.3f} all={[round(x, 3) for x in v]}",
            flush=True,
        )
    os.environ.pop(flag, None)
    return results


def main():
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from hdfe_spark.session import get_spark
    from hdfe_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"ab_r15b_{exp}")
    # JIT/codegen warmup identical to bench.py
    load_table(spark, "lineitem", SF_DIR).agg(F.count(F.lit(1))).collect()

    if exp == "transform":
        def build(spark):
            from hdfe_spark.operators.groupby import grouped_transform

            ev = load_table(spark, "events", SF_DIR)
            out = grouped_transform(ev, "user_id", {"value": ["mean", "count"]})
            return out.select(
                "event_id",
                "user_id",
                F.round("mean_value", 5).alias("mean_value"),
                F.col("count_value").cast("bigint").alias("count_value"),
            )

        run_ab(spark, exp, "HDFE_TRANSFORM_JOIN", build, reps)
    elif exp == "demean":
        def build(spark):
            from hdfe_spark.operators.groupby import demean

            ev = load_table(spark, "events", SF_DIR)
            out = demean(ev, "user_id", "value")
            return out.select(
                "event_id", "user_id", F.round("value_dm", 3).alias("value_dm")
            )

        run_ab(spark, exp, "HDFE_TRANSFORM_JOIN", build, reps)
    elif exp == "minhash":
        def build(spark):
            from hdfe_spark.operators.dedup import minhash_dedup

            docs = load_table(spark, "documents", SF_DIR)
            out = minhash_dedup(docs, num_hashes=128, bands=16, jaccard_threshold=0.8)
            return out.select("doc_id", "lang", "source")

        run_ab(spark, exp, "HDFE_MINHASH_FUSED", build, reps)
    elif exp == "emb_lsh":
        def build(spark):
            from hdfe_spark.operators.dedup import embedding_neardup_pairs

            emb = load_table(spark, "embeddings", SF_DIR)
            out = embedding_neardup_pairs(emb, threshold=0.4, n_tables=16)
            return out.select(
                "id_a", "id_b", F.round("cosine", 6).alias("cosine")
            )

        run_ab(spark, exp, "HDFE_EMB_LSH_PAIRS", build, reps)
    else:
        raise SystemExit(f"unknown experiment {exp}")


if __name__ == "__main__":
    main()
