"""Distributed clustering: fixed-iteration Lloyd's k-means with a
deterministic, engine-portable contract.

Beyond-reference surface (the reference's only "grouping" is by
observed categorical keys, `hdfe/groupby.py`): corpus curation needs
DISCOVERED groups — topic buckets for rebalancing, embedding
partitions for SemDeDup (`operators/dedup.py::semdedup` trains its
coarse quantizer with exactly this loop) — and an auditable
certificate that the distributed implementation computes the textbook
iteration, not an approximation of it.

Determinism contract (what makes a DuckDB oracle able to unroll the
SAME iterations as CTE layers, the `graph.py::pagerank` pattern):

- init: the k rows with the smallest ``order_cols`` values (a total
  order), NOT a random sample;
- assignment: argmin of squared Euclidean distance in IEEE double,
  ties broken by centroid index;
- update: per-cluster mean = exact fixed-point decimal sum of
  ``round(value*1e6)`` integers (order-independent, unlike a float
  sum) cast to double, divided by the count — identical last-ulp
  result in any engine;
- duplicate init seeds RAISE (two identical centroids make the
  lower index win every tie — its twin starts empty, which the
  SQL unroll cannot express);
- an empty cluster keeps its previous centroid under
  ``on_empty="keep"`` — but a SQL unroll drops the empty group, so
  certificate callers pass ``on_empty="raise"`` to make any
  divergence loud instead of silent.

Scale design: each iteration is ONE map-side-combined groupBy over
the points (k*(d+1) partial scalars per task) plus a driver-side
k x d centroid update — no shuffle of the points themselves, ever.
The assignment expression is a broadcast-literal codegen projection
(k and d are small; the point table never moves). Iterations are a
Python loop over Spark jobs, the same shape as
`estimate.py::_ap_sweeps_distributed` — at 100 TB each sweep is one
scan, and AQE-coalesced partials keep the reduce tiny.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1e6


def _assign_expr(feature_cols: list[str], centroids: list[tuple]):
    """Column expr: index of the nearest centroid (squared Euclidean,
    double), ties to the lowest index. Pure codegen — centroids ride
    as literals."""
    dists = []
    for cx in centroids:
        d = F.lit(0.0)
        for col, c in zip(feature_cols, cx):
            diff = F.col(col).cast("double") - F.lit(float(c))
            d = d + diff * diff
        dists.append(d)
    best_d = F.least(*dists) if len(dists) > 1 else dists[0]
    expr = F.lit(None).cast("int")
    # first index attaining the min wins: scan from the back so the
    # earliest when() in the final expression is the lowest index
    for idx in range(len(centroids) - 1, -1, -1):
        expr = F.when(dists[idx] == best_d, F.lit(idx)).otherwise(expr)
    return expr


def kmeans_fixed(
    df: DataFrame,
    feature_cols: Sequence[str],
    k: int,
    n_iter: int,
    order_cols: Sequence[str],
    on_empty: str = "keep",
) -> tuple[DataFrame, list[tuple]]:
    """Run exactly ``n_iter`` Lloyd iterations; returns
    ``(assigned_df, centroids)`` where ``assigned_df`` is ``df`` plus
    a ``cluster`` column (the FINAL assignment against the last
    centroid update) and ``centroids`` the final k x d list.

    ``order_cols`` must totally order the rows (init takes the first
    k). NULL feature rows are excluded up front.
    """
    if on_empty not in ("keep", "raise"):
        raise ValueError(
            f"kmeans_fixed: on_empty must be 'keep' or 'raise', "
            f"got {on_empty!r}"
        )
    feature_cols = list(feature_cols)
    cond = F.lit(True)
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    pts = df.filter(cond)

    init_cols = list(dict.fromkeys([*order_cols, *feature_cols]))
    init_rows = (
        pts.select(*init_cols)
        .orderBy(*order_cols)
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} but only {len(init_rows)} rows")
    centroids = [
        tuple(float(r[c]) for c in feature_cols) for r in init_rows
    ]
    if len(set(centroids)) < k:
        raise ValueError(
            "kmeans_fixed: duplicate init seeds (two of the first k "
            "rows share identical features) — the duplicate's "
            "cluster would start empty; extend order_cols or dedupe "
            "the input"
        )

    sums = [
        F.sum(
            F.round(F.col(c) * _SCALE).cast("decimal(38,0)")
        ).alias(f"_s{i}")
        for i, c in enumerate(feature_cols)
    ]
    for _ in range(n_iter):
        assigned = pts.withColumn(
            "cluster", _assign_expr(feature_cols, centroids)
        )
        stats = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("_n"), *sums)
            .collect()
        )
        by_idx = {int(r["cluster"]): r for r in stats}
        new = []
        for idx in range(k):
            r = by_idx.get(idx)
            if r is None or r["_n"] == 0:
                if on_empty == "raise":
                    raise ValueError(
                        f"kmeans_fixed: cluster {idx} emptied during "
                        "iteration (on_empty='raise' — the SQL-unroll "
                        "certificate cannot express the keep-previous "
                        "fallback)"
                    )
                new.append(centroids[idx])  # empty cluster: keep
                continue
            n = float(r["_n"])
            new.append(
                tuple(
                    float(r[f"_s{i}"]) / n / _SCALE
                    for i in range(len(feature_cols))
                )
            )
        centroids = new

    out = pts.withColumn("cluster", _assign_expr(feature_cols, centroids))
    return out, centroids


def dbscan_grid(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: int,
    min_pts: int,
) -> DataFrame:
    """Exact planar DBSCAN over INTEGER coordinates — density
    clustering with noise, composed entirely from this repo's
    already-certified primitives: the grid-bucketed `radius_join`
    (every eps-neighbor pair exactly once, integer squared
    distances) and `graph.connected_components` (exact single-link
    over the core graph). Deterministic BY CONSTRUCTION, unlike
    textbook DBSCAN whose border-point assignment depends on visit
    order: borders attach to the MINIMUM core cluster label among
    their core neighbors, a total-order rule any SQL oracle can
    replay.

    Standard DBSCAN semantics otherwise: a point is CORE when its
    eps-ball (incl. itself) holds >= min_pts points; core points in
    the same density-connected region share a cluster; non-core
    points with a core neighbor are border points of that cluster;
    everything else is noise (dropped — callers anti-join for it).

    Scale: one self radius_join (3x3 cell probes, never all-pairs),
    one degree aggregation, one core-core component pass bounded by
    |core-pair| edges, one border attach join. The materialized pair
    count is sum over points of |eps-ball| — LINEAR when eps is
    sized to the density (each ball ~ min_pts, the regime DBSCAN is
    for), but a ball holding k points costs k² pairs, so an eps
    spanning whole dense regions degrades quadratically (measured:
    60-point balls fine at 2M points, 1,900-point balls are not —
    SCALE.md round-7 note); shrink eps or pre-aggregate duplicate
    coordinates first. Returns (id, x, y, cluster, is_core) with
    cluster = min core id in the region.

    Pre-built in round 7 for the round-8 registry (net-new query cap
    discipline); unit-tested against a brute-force reference."""
    from hdfe_spark.operators.graph import connected_components
    from hdfe_spark.operators.rangejoin import radius_join

    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    # materialize once: the pair table feeds FOUR plan branches
    # (degree, core-core edges twice, border attach) — without this
    # the dominant 9x-explode radius join recomputes per branch
    pairs = (
        radius_join(
            pts, pts, "x", "y", radius=eps, suffixes=("_a", "_b")
        )
        .select(F.col("id_a"), F.col("id_b"))
        .localCheckpoint(eager=True)
    )
    # degree INCLUDING self (the self-pair survives the radius join
    # at distance 0), so the eps-ball count is exactly sum of pairs
    deg = pairs.groupBy("id_a").agg(F.count(F.lit(1)).alias("__deg"))
    core = (
        deg.filter(F.col("__deg") >= min_pts)
        .select(F.col("id_a").alias("id"))
        .localCheckpoint(eager=True)
    )
    # core-core edges (exclude self loops; CC treats them as noise)
    cc_edges = (
        pairs.join(core.withColumnRenamed("id", "id_a"), "id_a")
        .join(core.withColumnRenamed("id", "id_b"), "id_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    comp = connected_components(cc_edges, "id_a", "id_b")
    # isolated core points (no core neighbor) are their own cluster
    core_lab = (
        core.join(comp.withColumnRenamed("node", "id"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("cluster"),
        )
    )
    # border points: non-core with >= 1 core neighbor; attach to the
    # MINIMUM core cluster (deterministic, visit-order-free)
    border = (
        pairs.filter(F.col("id_a") != F.col("id_b"))
        .join(core_lab.withColumnRenamed("id", "id_b"), "id_b")
        .join(core.withColumnRenamed("id", "id_a"), "id_a", "left_anti")
        .groupBy("id_a")
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col("id_a").alias("id"), "cluster")
    )
    labeled = core_lab.withColumn("is_core", F.lit(True)).unionByName(
        border.withColumn("is_core", F.lit(False))
    )
    return pts.join(labeled, "id").select(
        "id", "x", "y", "cluster", "is_core"
    )
