"""Round-13 envelope measurement (VERDICT r12 item 8): the per-key
ARRAY-COLLECTING operators' hot-key capacity at the standard 16 GiB /
16-slot config contract the blocked folds established.

The blocked-fold memory recipe (ewma/cusum/holt/holt_winters) applies
to LEFT FOLDS, which decompose into per-block partials. The remaining
per-key array ops (`funnel`'s per-step sorted event arrays,
`sessions.attribution`-style walks) have join-like semantics across
the key's whole history, so they cannot block-decompose the same way;
their contract is instead a MEASURED hot-key envelope: how many
events can land on ONE key before the single task that owns it dies.
This tool measures funnel at one entity with 10M/20M/40M events and
records pass/fail + wall — the SCALE.md row is the config contract.

Usage: SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=16 \
          python tools/stress_r13b.py [n_events ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [10_000_000, 20_000_000,
                                               40_000_000]
    from pyspark.sql import functions as F

    from hdfe_spark.operators.sessions import funnel
    from hdfe_spark.session import get_spark

    spark = get_spark(app_name="stress_r13b")
    for n in sizes:
        # ONE entity, n events cycling view->click->purchase with
        # strictly increasing integer times: worst case for the
        # per-step sorted arrays (every event lands in one task).
        df = spark.range(0, n, 1, 64).select(
            F.lit(1).alias("u"),
            F.col("id").alias("t_us"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("etype"),
        )
        t0 = time.perf_counter()
        try:
            row = funnel(
                df, "u", "t_us", "etype", ["view", "click", "purchase"]
            ).collect()[0]
            wall = time.perf_counter() - t0
            assert row["steps_completed"] == 3
            # greedy-earliest: t1=0 (view@0), t2=1 (click@1),
            # t3=2 (purchase@2)
            assert (row["t_1"], row["t_2"], row["t_3"]) == (0, 1, 2)
            print(f"funnel ONE key x {n:,} events: {wall:.1f} s OK "
                  f"(exact greedy walk verified)", flush=True)
        except Exception as exc:  # noqa: BLE001 - record the envelope
            wall = time.perf_counter() - t0
            print(f"funnel ONE key x {n:,} events: FAILED after "
                  f"{wall:.1f} s — {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
            break


if __name__ == "__main__":
    main()
