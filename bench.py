"""Benchmark harness — runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is timed end-to-end (plan + execute + materialize counts);
a warmup pass on sf's lineitem primes the JVM/Arrow paths so the
numbers measure the operators, not JIT warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from hdfe_spark.session import get_spark
    from hdfe_spark.sources.tables import load_table

    spark = get_spark(app_name="hdfe_spark_bench")

    # Warmup: touch the parquet + a tiny agg to JIT the scan paths,
    # and pre-fork the Python/Arrow worker pool so the first
    # pandas-UDF stage doesn't pay the spawn cost.
    from pyspark.sql import types as T

    from hdfe_spark.session import py_stage_partitions

    load_table(spark, "lineitem", SF_DIR).agg(F.count(F.lit(1))).collect()

    _noop = F.pandas_udf(lambda s: s, T.LongType())

    spark.range(0, 1000, 1, py_stage_partitions(spark)).select(
        _noop(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    # JIT-warm the Arrow driver-collect path (ArrowConverters): the
    # first couple of large toPandas() calls run interpreted and cost
    # 5-10 s regardless of query; three medium collects compile it.
    for _ in range(3):
        spark.range(0, 500_000, 1, 32).select(
            F.col("id"),
            (F.col("id") % 997).alias("k"),
            F.rand(7).alias("v"),
        ).toPandas()

    headline = [
        "grouped_agg",
        "grouped_transform",
        "grouped_apply",
        "demean",
        "lags",
        "factorize",
        "dummies",
        "gram",
        "ols_pooled",
        "ols_within_fe",
        "ols_2fe",
        "se_cluster",
        "residuals",
        "all_dummies",
        "fe_effects",
        "exact_dedup",
        "token_stats",
        "quality",
        "lang_id",
        "tfidf_topk",
        "sessionize",
        "asof_join",
        "pipeline_curate",
        "minhash_dedup",
        "simhash_dedup",
        "cosine_topk",
        "knn_join",
        "ngram_jaccard",
        "embedding_neardup_lsh",
    ]
    qs = entrymod.queries()

    def run_pass() -> dict[str, float]:
        t: dict[str, float] = {}
        for name in headline:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # noop sink: computes every column of every row, writes
            # nothing (a bare .count() would let Catalyst prune the
            # projections away)
            df.write.format("noop").mode("overwrite").save()
            t[name] = round(time.perf_counter() - t0, 4)
            print(f"# {name}: {t[name]}s", file=sys.stderr, flush=True)
            # Queries are independent jobs: drop whatever blocks the
            # query left persisted (iterative solvers localCheckpoint
            # per sweep) so one query's leftovers can't evict the next
            # one's memory.
            spark.catalog.clearCache()
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                jmap.get(rid).unpersist(False)
        return t

    def single_core_probe() -> float:
        """Fixed pure-numpy workload, one core: separates host-speed
        drift from code/plan drift (the round-4 lesson: identical code
        spanned 28.7-39.1 s on this multi-tenant host while this probe
        held stable)."""
        import numpy as np

        a = np.random.default_rng(7).standard_normal((700, 700))
        t0 = time.perf_counter()
        for _ in range(12):
            a = np.tanh(a @ a.T / 700.0)
        return round(time.perf_counter() - t0, 4)

    def parallel_capacity_probe() -> dict:
        """Fixed 32-thread CPU-bound workload: 32 identical
        elementwise-numpy tasks through a 32-worker thread pool
        (numpy releases the GIL). The single-task time tracks per-core speed like
        `single_core_probe`; the 32-way wall time tracks how much
        parallel CPU this multi-tenant host actually grants THIS
        run, so a bench regression is attributable from the JSON
        alone instead of requiring a worktree A/B (the round-7
        host-drift investigation, SCALE.md). The task is ELEMENTWISE
        numpy (tanh — single-threaded, GIL-released), not matmul:
        multithreaded BLAS would understate the single-task
        baseline. READ par32_sec, not the ratio, as the drift
        signal: it is a FIXED amount of total work, so its wall
        time moves directly with granted capacity (idle band on
        this host: ~0.33-0.36 s; it rises under noisy neighbors).
        effective_parallelism is reported but load-confounded —
        ambient load slows the single-task baseline MORE than the
        saturated pool, so the ratio paradoxically RISES on a busy
        host (measured: ~5x idle, ~12x while a full gate run owned
        the machine)."""
        from concurrent.futures import ThreadPoolExecutor

        import numpy as np

        def task(seed: int) -> float:
            a = np.random.default_rng(seed).standard_normal(400_000)
            for _ in range(40):
                a = np.tanh(a) + 0.1 * a
            return float(a[0])

        t0 = time.perf_counter()
        task(0)
        t_single = time.perf_counter() - t0
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=32) as ex:
            list(ex.map(task, range(32)))
        t_par = time.perf_counter() - t0
        return {
            "single_task_sec": round(t_single, 4),
            "par32_sec": round(t_par, 4),
            "effective_parallelism": (
                round(32.0 * t_single / t_par, 2) if t_par else None
            ),
        }

    probe_before = single_core_probe()
    capacity_before = parallel_capacity_probe()
    timings = run_pass()
    # A/A evidence IN the artifact: an immediate same-session second
    # pass over the identical frozen list. aa_ratio far from 1.0 (or a
    # moved probe) says host noise; both ≈ stable says any cross-round
    # delta is real code/plan drift.
    rerun = run_pass()
    probe_after = single_core_probe()
    capacity_after = parallel_capacity_probe()

    total = round(sum(timings.values()), 4)
    total2 = round(sum(rerun.values()), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "aa_rerun_total": total2,
                "aa_ratio": round(total2 / total, 4) if total else None,
                "queries_rerun": rerun,
                "single_core_probe_sec": [probe_before, probe_after],
                "capacity_probe": [capacity_before, capacity_after],
            }
        )
    )


if __name__ == "__main__":
    main()
