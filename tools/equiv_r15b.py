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

    cases = [
        ("grouped_transform", "HDFE_TRANSFORM_JOIN", q_transform),
        ("demean", "HDFE_TRANSFORM_JOIN", q_demean),
        ("minhash_dedup", "HDFE_MINHASH_FUSED", q_minhash),
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
