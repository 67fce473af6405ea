"""Round-6 stress, third batch: the TPC-H suite completion and the
data-quality validation family.

1. `tpch`: run all 22 TPC-H queries back-to-back at sf0.1 and record
   per-query wall time plus the two plan facts that matter at scale
   (sort-merge-join count must be 0 everywhere except the deliberate
   fact-fact shuffles; Python stage count must be 0 everywhere).

2. `validate`: 20M-row synthetic stress of the validation family —
   - check_constraints: 6 rules over 20M rows must stay ONE scan
     (wall time ~ the scan time, not 6x it);
   - referential_integrity: 20M child rows against a 100k parent,
     with planted orphans — exact orphan-row count recovered;
   - mad_outliers: 20M rows over 5 groups, exact-percentile path vs
     percentile_approx path — identical flag sets on planted
     outliers, with the approx path's bounded memory.

Usage: python tools/stress_r6c.py [tpch|validate]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r6c")


def stress_tpch():
    import __spark_entry__ as em
    from hdfe_spark.plans.audit import plan_report

    spark = _spark()
    q = em.queries()
    # Q1 is registered as `sql_q1` (the SQL-string entry point)
    names = ["sql_q1"] + [f"tpch_q{i}" for i in range(2, 23)]
    total = 0.0
    print(f"TPC-H suite at {SF_DIR}")
    for name in names:
        df = q[name](spark, SF_DIR)
        rep = plan_report(df)
        t0 = time.perf_counter()
        n = df.count()
        dt = time.perf_counter() - t0
        total += dt
        print(
            f"  {name:10s} {dt:7.2f}s  rows={n:<8d} "
            f"smj={rep['n_sortmerge_joins']} py={rep['n_python_stages']} "
            f"ex={rep['n_exchanges']}"
        )
        assert rep["n_python_stages"] == 0, name
    print(f"  total      {total:7.2f}s")


def stress_validate(n: int = 20_000_000):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.validate import (
        check_constraints,
        mad_outliers,
        referential_integrity,
    )

    spark = _spark()

    # ---- synthetic 20M-row fact with known dirt --------------------
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 100_000).alias("fk"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("v"),
    )
    # dirt: nulls in fk for id%1000==0; orphan fk 999_999 for
    # id%500==0 (40k rows, 1 orphan key); planted outliers v=1e6 for
    # id%1_000_000==0 (20 rows)
    fact = base.select(
        "id",
        F.when(F.col("id") % 1000 == 0, None)
        .when(F.col("id") % 500 == 0, F.lit(999_999))
        .otherwise(F.col("fk"))
        .alias("fk"),
        "grp",
        F.when(F.col("id") % 1_000_000 == 0, 1e6).otherwise(F.col("v"))
        .alias("v"),
    )
    fact.cache().count()

    t0 = time.perf_counter()
    rules = [
        {"kind": "completeness", "column": "fk", "min_fraction": 1.0},
        {"kind": "uniqueness", "column": "id"},
        {"kind": "bounds", "column": "v", "lo": 0.0, "hi": 100.0,
         "min_fraction": 0.999},
        {"kind": "matches", "column": "grp", "pattern": "^[0-4]$"},
        {"kind": "in_set", "column": "grp",
         "values": ["0", "1", "2", "3", "4"]},
        {"kind": "min_rows", "n": n},
    ]
    rep = {r["constraint"]: r.asDict()
           for r in check_constraints(fact, rules).collect()}
    t_rules = time.perf_counter() - t0
    assert not rep["completeness(fk)"]["passed"]
    assert rep["uniqueness(id)"]["passed"]
    assert rep["matches(grp)"]["passed"]
    print(f"check_constraints: 6 rules over {n} rows in {t_rules:.2f}s "
          f"(one scan)")

    t0 = time.perf_counter()
    parent = spark.range(100_000).select(F.col("id").alias("pk"))
    ri = referential_integrity(fact, parent, "fk", "pk").collect()[0]
    t_ri = time.perf_counter() - t0
    # orphan rows: id%500==0 and id%1000!=0 -> every odd multiple of 500
    expect_orphans = n // 1000
    assert ri["n_orphan_keys"] == 1, ri
    assert ri["n_orphan_rows"] == expect_orphans, ri
    print(f"referential_integrity: {n} rows vs 100k parent in {t_ri:.2f}s "
          f"(orphan rows exact: {ri['n_orphan_rows']})")

    t0 = time.perf_counter()
    exact = mad_outliers(fact, "grp", "v", k=50.0)
    n_exact = exact.count()
    t_exact = time.perf_counter() - t0
    t0 = time.perf_counter()
    approx = mad_outliers(fact, "grp", "v", k=50.0, accuracy=10_000)
    n_approx = approx.count()
    t_approx = time.perf_counter() - t0
    assert n_exact == n // 1_000_000, n_exact  # the planted spikes
    assert n_approx == n_exact
    print(f"mad_outliers: exact {t_exact:.2f}s vs approx {t_approx:.2f}s "
          f"({n_exact} planted outliers recovered by both)")


def stress_dpp(n: int = 20_000_000, n_parts: int = 50, n_keep: int = 2):
    """Dynamic partition pruning at 20M rows × 50 directory
    partitions: the dim filter keeps 2, so the DPP scan should touch
    ~4% of the data. Measured as the same join with the optimizer
    flag on vs off (identical data, identical plan shape otherwise)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    spark = _spark()
    d = tempfile.mkdtemp(prefix="hdfe_dpp_stress_")
    try:
        (
            spark.range(n)
            .select(
                F.col("id"),
                (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("v"),
                (F.col("id") % n_parts).alias("pk"),
            )
            .write.mode("overwrite")
            .partitionBy("pk")
            .parquet(d)
        )
        fact = spark.read.parquet(d)
        dim = spark.createDataFrame(
            [(i, "keep" if i < n_keep else "drop") for i in range(n_parts)],
            "dk long, tag string",
        ).filter(F.col("tag") == "keep")

        def run():
            t0 = time.perf_counter()
            out = (
                fact.join(F.broadcast(dim), fact.pk == dim.dk)
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
                .collect()[0]
            )
            return time.perf_counter() - t0, out["c"]

        # warm both paths once (file listing, JIT, page cache), then
        # measure the second runs
        for flag in ("true", "false"):
            spark.conf.set(
                "spark.sql.optimizer.dynamicPartitionPruning.enabled", flag
            )
            run()
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )
        t_on, c_on = run()
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false"
        )
        t_off, c_off = run()
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )
        assert c_on == c_off == n // n_parts * n_keep
        print(
            f"dpp: {n} rows x {n_parts} partitions, keep {n_keep}: "
            f"pruned {t_on:.2f}s vs unpruned {t_off:.2f}s "
            f"({t_off / t_on:.1f}x)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def stress_bpe(n_docs: int = 1_000_000, n_merges: int = 20):
    """BPE training at 1M synthetic docs: the corpus-scale cost is
    ONE histogram aggregation; every merge iteration then works on
    the ~50k-word vocabulary regardless of corpus size. Reports the
    split so the histogram-bounded design is visible in numbers."""
    from pyspark.sql import functions as F

    from hdfe_spark.operators.bpe import train_bpe

    spark = _spark()
    rng = np.random.default_rng(7)
    words = [
        "".join(rng.choice(list("abcdefghij"), size=rng.integers(3, 10)))
        for _ in range(50_000)
    ]
    vocab_df = spark.createDataFrame(
        list(enumerate(words)), "wid long, w string"
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc"),
            F.explode(F.sequence(F.lit(1), F.lit(12))).alias("slot"),
        )
        .withColumn(
            "wid", F.pmod(F.xxhash64(F.col("doc") * 13 + F.col("slot")),
                          F.lit(50_000))
        )
        .join(F.broadcast(vocab_df), "wid")
        .groupBy("doc")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )
    t0 = time.perf_counter()
    merges = train_bpe(docs, "text", n_merges=n_merges)
    dt = time.perf_counter() - t0
    print(
        f"bpe: {n_docs} docs, {n_merges} merges in {dt:.1f}s "
        f"(first 5: {merges[:5]})"
    )
    assert len(merges) == n_merges


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("tpch", "all"):
        stress_tpch()
    if which in ("validate", "all"):
        stress_validate()
    if which in ("dpp", "all"):
        stress_dpp()
    if which in ("bpe",):
        stress_bpe()
