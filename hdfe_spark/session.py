"""SparkSession construction tuned for this engine.

Local-mode defaults follow the public Spark tuning guidance: shuffle
partitions ~ cores (not the 200 default), AQE on for runtime
re-planning (skew joins, partition coalescing), Arrow on for the
pandas-UDF boundary, UTC session timezone so timestamp semantics match
the DuckDB oracle.

At cluster scale the same builder works — only ``master`` and the
memory knobs change; ``spark.sql.shuffle.partitions`` should then be
sized to ~2-3× total cores and AQE left on to coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def py_stage_partitions(spark: "SparkSession | None" = None) -> int:
    """Partition width for Arrow/pandas-UDF stages over small-to-mid
    tables.

    Resolution order: explicit ``HDFE_PY_STAGE_PARTITIONS`` env →
    scale with the session's ``defaultParallelism`` (one Python-stage
    task per ~4 cores: measured on local[32], >8 simultaneous Python
    workers per stage cost 3-10× in worker spawn/attach overhead, so
    32 cores → 8 tasks; a 1000-executor × 4-core cluster → 1000
    tasks) → conservative 8. Never a fixed width independent of the
    cluster."""
    env = os.environ.get("HDFE_PY_STAGE_PARTITIONS")
    if env:
        return int(env)
    if spark is not None:
        return max(8, spark.sparkContext.defaultParallelism // 4)
    return 8


def get_spark(
    app_name: str = "hdfe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    32). Explicit arguments override environment.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The events fixture carries TIMESTAMP(NANOS) parquet columns,
        # which Spark only reads as LongType (ns since epoch) behind
        # this flag. Ordering semantics are identical; convert with
        # timestamp_micros(ns div 1000) where a real timestamp is
        # needed (see streaming/ops.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
