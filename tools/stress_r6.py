"""Round-6 stress: the two round-5 operator families that had no
SCALE.md row yet.

1. SemDeDup at 100k x 64d embeddings with a SKEWED clustering
   (half the corpus in one dense blob): wall time, cluster-size
   distribution, and planted-duplicate recovery. The thing to verify
   is that the within-cluster GEMM stays bounded by the largest
   cluster rather than blowing up to O(n^2) pair emission.

2. Snapshot layer under CONCURRENT publish: two writer threads race
   `publish_snapshot` with retry-on-version-collision; a reader
   polls `_LATEST` throughout. Invariant: every pointer read names a
   COMPLETE, readable version (the pointer flip is the commit), and
   after the dust settles the version chain is dense and every
   version's content is intact.

Usage: python tools/stress_r6.py [semdedup|snapshots]
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from hdfe_spark.session import get_spark

    return get_spark(app_name="stress_r6")


def stress_semdedup(n: int = 100_000, dim: int = 64, n_dups: int = 2_000):
    from hdfe_spark.operators.dedup import semdedup_pairs

    spark = _spark()
    rng = np.random.default_rng(7)
    # Skewed corpus: 50% in one blob (one hot cluster), the rest
    # spread over 15 modes. Center norm ~ noise norm so same-blob
    # cosines sit around 0.5 — far below the 0.95 near-dup threshold
    # — and only the PLANTED duplicates qualify; the skew stresses
    # the per-cluster GEMM, not the pair-output volume.
    centers = rng.normal(size=(16, dim)) * 1.0
    sizes = [n // 2] + [n // 30] * 15
    sizes[-1] += n - sum(sizes)
    parts, ids = [], []
    base = 0
    for ci, sz in enumerate(sizes):
        pts = centers[ci] + rng.normal(size=(sz, dim))
        parts.append(pts)
        ids.append(np.arange(base, base + sz))
        base += sz
    X = np.vstack(parts).astype(np.float32)
    # Plant near-duplicates: copy n_dups rows with tiny noise.
    src = rng.choice(n, size=n_dups, replace=False)
    dup = X[src] + rng.normal(scale=1e-3, size=(n_dups, dim)).astype(
        np.float32
    )
    X = np.vstack([X, dup])
    all_ids = np.concatenate([np.concatenate(ids), np.arange(n, n + n_dups)])

    # Ship the corpus through parquet, not a 100k-row driver
    # createDataFrame (list-of-lists serialization is minutes).
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="semstress_")
    path = os.path.join(tmp, "emb.parquet")
    tab = pa.table(
        {
            "vec_id": pa.array(all_ids.astype(np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.reshape(-1)), dim
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(tab, path)
    df = spark.read.parquet(path).repartition(32).cache()
    df.count()

    t0 = time.time()
    pairs = semdedup_pairs(
        df, vec_col="embedding", id_col="vec_id",
        n_centroids=64, threshold=0.95, seed=42,
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    print(f"  semdedup_pairs end-to-end: {wall:.1f} s, {n_pairs} pairs")

    # Planted recovery: how many (src, dup) pairs surface?
    planted = {(int(min(a, b)), int(max(a, b)))
               for a, b in zip(src, np.arange(n, n + n_dups))}
    got = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in pairs.select("id_a", "id_b").collect()
    }
    recovered = len(planted & got)

    # Cluster-size distribution from the same IVF assignment.
    from hdfe_spark.operators.similarity import ivf_index

    assigned, _ = ivf_index(
        df, vec_col="embedding", id_col="vec_id", n_centroids=64, seed=42
    )
    from pyspark.sql import functions as F

    csizes = sorted(
        (r["n"] for r in assigned.groupBy("__centroid")
         .agg(F.count(F.lit(1)).alias("n")).collect()),
        reverse=True,
    )
    print(
        f"SEMDEDUP n={n + n_dups} dim={dim} centroids=64: {wall:.1f} s, "
        f"{n_pairs} pairs, planted recovered {recovered}/{n_dups}, "
        f"largest cluster {csizes[0]} ({100 * csizes[0] / (n + n_dups):.0f}%), "
        f"top5 clusters {csizes[:5]}"
    )


def stress_snapshots(n_per_writer: int = 12):
    from hdfe_spark.sources.snapshots import (
        current_version,
        publish_snapshot,
        read_snapshot,
        snapshot_versions,
    )

    spark = _spark()
    root = tempfile.mkdtemp(prefix="snapstress_")
    table = os.path.join(root, "t")
    errors: list[str] = []
    published: dict[int, int] = {}  # version -> writer marker
    lock = threading.Lock()
    stop = threading.Event()

    def writer(marker: int):
        done = 0
        while done < n_per_writer:
            df = spark.range(0, 1000).selectExpr(
                "id", f"{marker} AS writer", "id * 2 AS payload"
            )
            try:
                v = publish_snapshot(df, table)
            except Exception:
                # version collision with the racing writer: the
                # mode('error') write refused to touch the existing
                # dir — retry with a fresh version number.
                continue
            with lock:
                published[v] = marker
            done += 1

    def reader():
        seen = 0
        while not stop.is_set():
            v = current_version(table)
            if v is None:
                continue
            try:
                n = read_snapshot(spark, table, v).count()
            except Exception as e:
                errors.append(f"version {v} pointed-at but unreadable: {e}")
                continue
            if n != 1000:
                errors.append(f"version {v} incomplete: {n} rows")
            seen += 1
        print(f"  reader completed {seen} pointer-follow reads, 0 partial")

    t0 = time.time()
    threads = [threading.Thread(target=writer, args=(m,)) for m in (1, 2)]
    rd = threading.Thread(target=reader)
    rd.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    rd.join()
    wall = time.time() - t0

    versions = snapshot_versions(table)
    final = current_version(table)
    # Every published version intact and attributable to its writer.
    for v, marker in sorted(published.items()):
        rows = read_snapshot(spark, table, v).select("writer").distinct().collect()
        if [r[0] for r in rows] != [marker]:
            errors.append(f"version {v}: wrong content {rows}")
    print(
        f"SNAPSHOTS 2 writers x {n_per_writer} publishes: {wall:.1f} s, "
        f"{len(published)} committed versions of {len(versions)} dirs on disk, "
        f"final pointer v{final}, errors={errors or 'none'}"
    )
    assert not errors, errors
    assert len(published) == 2 * n_per_writer




def stress_interval_join(n_left: int = 20_000_000, n_right: int = 200_000):
    """Interval-overlap join at the round-4 join-family scale: 20M
    bounded intervals x 200k bounded intervals over 10k keys,
    bucket = max interval length. The naive plan is a
    BroadcastNestedLoopJoin over 4e12 comparisons."""
    from pyspark.sql import functions as F

    from hdfe_spark.operators.rangejoin import interval_overlap_join

    spark = _spark()
    w = 1000
    left = spark.range(0, n_left).selectExpr(
        "id % 10000 AS k",
        "id AS id_a",
        "(id * 2654435761) % 100000000 AS s_a",
        f"(id * 2654435761) % 100000000 + 1 + (id % {w}) AS e_a",
    )
    right = spark.range(0, n_right).selectExpr(
        "id % 10000 AS k",
        "id AS id_b",
        "(id * 40503) % 100000000 AS s_b",
        f"(id * 40503) % 100000000 + 1 + (id % {w}) AS e_b",
    )
    t0 = time.time()
    n = interval_overlap_join(
        left, right, "k", "s_a", "e_a", "s_b", "e_b", bucket_width=w
    ).count()
    wall = time.time() - t0
    print(
        f"INTERVAL_JOIN {n_left} x {n_right} intervals, 10k keys, "
        f"len<={w}, bucket={w}: {n} pairs in {wall:.1f} s"
    )


def stress_pagerank(n_edges: int = 10_000_000, n_nodes: int = 1_000_000):
    """PageRank at graph-family scale: 10M directed edges over 1M
    nodes, 6 fixed iterations. Per-iteration cost is two shuffles
    over edges + a one-row dangling aggregate — the same round shape
    as connected_components, so this pins the iterative family's
    scaling alongside the CC stress."""
    from pyspark.sql import functions as F

    from hdfe_spark.operators.graph import pagerank

    spark = _spark()
    edges = spark.range(0, n_edges).selectExpr(
        f"id % {n_nodes} AS src",
        f"(id * 2654435761) % {n_nodes} AS dst",
    )
    t0 = time.time()
    pr = pagerank(edges, "src", "dst", n_iter=6)
    total = pr.agg(F.sum("pr")).collect()[0][0]
    n = pr.count()
    wall = time.time() - t0
    print(
        f"PAGERANK {n_edges} edges, {n} nodes, 6 iters: {wall:.1f} s, "
        f"rank mass {total:.9f}"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("semdedup", "all"):
        stress_semdedup()
    if which in ("snapshots", "all"):
        stress_snapshots()
    if which in ("interval", "all"):
        stress_interval_join()
    if which in ("pagerank", "all"):
        stress_pagerank()
