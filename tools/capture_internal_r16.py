"""Capture the estimate()-internal eager-aggregation plans for the
round-16 before/after evidence (plans/r16/).

The interesting aggregations collect eagerly inside estimate()/
fit_stats(), so their plans never appear in a declared query's output
plan; the HDFE_EXPLAIN_DIR hook (_maybe_dump_plan) writes them as they
run. "Before" variants are reproduced with the operator kill-switches
— the kill-switched code path is byte-identical to the pre-change
plan.

Usage: python tools/capture_internal_r16.py
Writes plans/r16/<name>_{before,after}.txt
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)


def run_case(spark, label, env, fn):
    """Run fn under HDFE_EXPLAIN_DIR=<tmp> with env overrides; copy
    every dumped plan to plans/r16/<name>_<label>.txt."""
    tmp = tempfile.mkdtemp(prefix=f"plans_{label}_")
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    os.environ["HDFE_EXPLAIN_DIR"] = tmp
    try:
        fn(spark)
    finally:
        os.environ.pop("HDFE_EXPLAIN_DIR", None)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    for f in sorted(os.listdir(tmp)):
        base = f[: -len(".txt")]
        dst = os.path.join(OUT, f"{base}_{label}.txt")
        shutil.copyfile(os.path.join(tmp, f), dst)
        print(f"wrote {dst}")
    shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        jmap.get(rid).unpersist(False)


def main():
    os.makedirs(OUT, exist_ok=True)
    import numpy as np  # noqa: F401

    import __spark_entry__ as entrymod
    from hdfe_spark.session import get_spark
    from hdfe_spark.sources.tables import load_table
    from hdfe_spark.operators.estimate import estimate, fit_stats

    spark = get_spark(app_name="capture_internal_r16")
    qs = entrymod.queries()

    def within_var(spark):
        li = load_table(spark, "lineitem", SF_DIR)
        estimate(
            li, "l_extendedprice", ["l_quantity", "l_discount"],
            categorical_controls=["l_suppkey"], estimate_variance=True,
        )

    def fitstats(spark):
        li = load_table(spark, "lineitem", SF_DIR)
        fit_stats(
            li, "l_extendedprice", ["l_quantity", "l_discount"],
            categorical_controls=["l_suppkey"],
        )

    def se_pooled(spark):
        li = load_table(spark, "lineitem", SF_DIR)
        estimate(
            li, "l_extendedprice", ["l_quantity", "l_discount"],
            estimate_variance=True,
        )

    def se_robust(spark):
        li = load_table(spark, "lineitem", SF_DIR)
        estimate(
            li, "l_extendedprice", ["l_quantity", "l_discount"],
            estimate_variance=True, robust=True,
        )

    def se_cluster2(spark):
        qs["se_cluster2"](spark, SF_DIR).collect()

    # Plan B variance: window (before, kill-switch) vs moments (after).
    # The window variant dumps nothing estimate-internal by itself
    # (gram_matrix has no hook) — its shape is the committed
    # plans/r15/planB_window_gram_before.txt; here we only need the
    # after (planB_within_moments for an SE-requesting call).
    run_case(spark, "after", {}, within_var)
    run_case(spark, "after", {}, fitstats)
    run_case(spark, "before", {"HDFE_POOLED_FAST": "0"}, se_pooled)
    run_case(spark, "after", {}, se_pooled)
    run_case(spark, "before", {"HDFE_POOLED_FAST": "0"}, se_robust)
    run_case(spark, "after", {}, se_robust)
    # se_cluster2: after = gate probe + exact-path scans (the gate
    # declines on the fixture); before(r15 default) = forced one-pass.
    run_case(
        spark, "before_r15onepass",
        {"HDFE_CLUSTER2_PAIR_RATIO": "1.1"}, se_cluster2,
    )
    run_case(spark, "after", {}, se_cluster2)


if __name__ == "__main__":
    main()
