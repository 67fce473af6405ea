"""Small-file compaction: bin-pack a fragmented dataset directory
into ~target-size files.

Beyond-reference surface (the reference does no I/O at all): at
100 TB the small-files problem is operational reality — a streaming
sink or over-parallel writer leaves thousands of KB-sized parquet
files, and every downstream scan pays per-file open/footer/scheduling
cost. Compaction is the standard maintenance op (cf. Delta OPTIMIZE /
Iceberg rewriteDataFiles); this is the dependency-free form.

Plan shape: one file listing (driver-side metadata only — file
*statuses*, never data), then a single ``coalesce`` write. ``coalesce``
merges partitions WITHOUT a shuffle — each output task reads a few
input files sequentially — so compacting N small files into M big
ones moves every byte exactly once, no exchange. ``repartition`` is
used only when *splitting* oversized files (rare), which genuinely
needs the shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(name, bytes) for each data file under ``path`` (driver-side
    Hadoop FS metadata listing; skips _SUCCESS/hidden files)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append((name, st.getLen()))
    return out


def compact_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``in_path`` (parquet dir) into ``out_path`` with
    ``ceil(total_bytes / target_bytes)`` output files.

    Returns a stats dict: input/output file counts and bytes. Content
    is preserved exactly (same rows, no ordering contract — parquet
    has none).
    """
    files = list_data_files(spark, in_path)
    total = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(in_path)
    n_in_parts = df.rdd.getNumPartitions()
    writer = df.coalesce(n_out) if n_out <= n_in_parts else df.repartition(n_out)
    writer.write.mode("overwrite").parquet(out_path)
    out_files = list_data_files(spark, out_path)
    return {
        "n_files_in": len(files),
        "bytes_in": total,
        "n_files_out": len(out_files),
        "bytes_out": sum(sz for _, sz in out_files),
        "n_out_planned": n_out,
    }
