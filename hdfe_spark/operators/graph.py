"""Connected components over candidate-pair graphs.

The dedup operators emit *pair* evidence (MinHash/SimHash/embedding
candidates). Collapsing pairs into duplicate CLUSTERS is a connected-
components problem; the one-pass min-id rule used by the ``*_dedup``
operators is a documented approximation (a star with a high-id center
keeps several leaves). This module computes exact components by
min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixed point — O(diameter) rounds, and near-dup graphs have
tiny diameters (duplicate clusters are dense). Each round is two
shuffles over the EDGE list (≪ corpus: only candidate pairs), with a
driver-side convergence check on a one-row aggregate. Plans are
bounded with ``localCheckpoint`` per round like the Plan C sweep loop.

At 1000-executor scale this is the standard formulation (the
large-star/small-star optimization of Kiveris et al. only matters for
web-scale skewed graphs; candidate-pair graphs from banded LSH are
bounded-degree by construction — the band join already capped bucket
sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected_edges(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Shared edge prep for the undirected-graph operators (`kcore`,
    `label_propagation`): project to (s, t), drop self-loops (the
    s != t comparison also drops NULL endpoints — three-valued
    logic, relied upon), symmetrize, dedup, and localCheckpoint
    eagerly so every per-round reuse reads one materialized table
    instead of re-running the union+distinct."""
    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("t")
    ).filter(F.col("s") != F.col("t"))
    return (
        e.unionByName(
            e.select(F.col("t").alias("s"), F.col("s").alias("t"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Exact connected components of the undirected graph given by
    ``edges``. Returns (node, component) where ``component`` is the
    minimum node id in the component.

    Nodes not present in ``edges`` are absent from the output (they
    are singleton components — callers union them back if needed).
    """
    from hdfe_spark.operators.estimate import _unpersist_checkpoint

    und = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    und = und.distinct().localCheckpoint(eager=False)

    labels = und.groupBy("u").agg(F.min("v").alias("nbr_min")).select(
        F.col("u").alias("node"),
        F.least(F.col("u"), F.col("nbr_min")).alias("component"),
    )

    live = [und]
    for _ in range(max_iter):
        # neighbor-min pass: candidate label for v = min over
        # neighbors u of label(u)
        cand = (
            und.join(labels, und["u"] == labels["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("cand"))
        )
        new_labels = (
            labels.join(cand, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("cand"), F.col("component"))
                ).alias("component"),
                (
                    F.col("cand").isNotNull()
                    & (F.col("cand") < F.col("component"))
                ).cast("long").alias("__changed"),
            )
        ).localCheckpoint(eager=False)
        changed = new_labels.agg(F.sum("__changed").alias("c")).collect()[0]["c"]
        live.append(new_labels)
        while len(live) > 3:
            _unpersist_checkpoint(live.pop(1))
        labels = new_labels.drop("__changed")
        if not changed:
            break
    else:
        # Exhausted max_iter with the final round still applying
        # changes. Those changes DID land, so the labels may already
        # be the fixed point — run one read-only confirmation pass
        # before deciding (a graph converging in exactly max_iter
        # rounds must not raise). Only a genuine non-fixed-point is an
        # error: returning it would silently split components and a
        # dedup caller would keep extra representatives.
        still = (
            und.join(labels, und["u"] == labels["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("cand"))
            .join(labels, on="node")
            .filter(F.col("cand") < F.col("component"))
            .limit(1)
            .count()
        )
        if still:
            for ck in live:  # release before raising — callers may retry
                _unpersist_checkpoint(ck)
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "rounds; the candidate-pair graph has a longer diameter "
                "than expected — raise max_iter"
            )
    out = labels
    # keep the final checkpoint alive for the caller; drop the rest
    for ck in live[:-1]:
        _unpersist_checkpoint(ck)
    return out


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Exact single-link dedup: given verified near-dup ``pairs``,
    keep ONE representative (the min id) per connected component, plus
    every document that appears in no pair. The exact counterpart of
    the one-pass min-id rule in ``dedup.minhash_dedup``."""
    comp = connected_components(pairs, src=src, dst=dst)
    keep_in_graph = comp.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias(id_col)
    )
    in_graph = comp.select(F.col("node").alias(id_col)).distinct()
    not_in_graph = df.select(id_col).join(in_graph, on=id_col, how="left_anti")
    keep = keep_in_graph.union(not_in_graph)
    return df.join(keep, on=id_col, how="left_semi")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 6,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list: returns
    (node, pr) for every node appearing as source or target.

    FIXED iterations, not run-to-convergence: the iteration count is
    part of the contract so any engine unrolling the same recurrence
    reproduces the result (the ``pagerank`` driver query's DuckDB
    oracle is exactly that — ``n_iter`` unrolled CTE layers, same
    trick as the alternating-projections oracle). Per iteration:

        PR'(v) = (1-d)/N + d * (Σ_{u→v} PR(u)/outdeg(u) + dangling/N)

    with dangling = Σ PR over zero-outdegree nodes (their mass is
    redistributed uniformly — without this the ranks of a bipartite
    buyer→supplier graph leak to zero).

    Scale shape: each iteration is one join of the edge list against
    the rank vector + one groupBy(dst) — two shuffles over EDGES, the
    same per-round cost as ``connected_components``; the dangling
    mass is a one-row driver aggregate per iteration (a scalar, never
    data), and ``localCheckpoint`` bounds lineage exactly like the
    Plan-C sweep loop. GraphX/Pregel does the same dataflow with
    message-passing syntax.
    """
    from hdfe_spark.operators.estimate import _unpersist_checkpoint

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("__deg"))
    ew = e.join(outdeg, "s").localCheckpoint(eager=False)  # (s, t, __deg)

    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    live = []
    for _ in range(n_iter):
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["s"], "left_anti")
            .agg(F.sum("pr"))
            .collect()[0][0]
            or 0.0
        )
        contribs = (
            ew.join(ranks, ew["s"] == ranks["node"])
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("__deg")).alias("__c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__c"), F.lit(0.0))
                       + F.lit(dangling / n))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
        live.append(ranks)
        while len(live) > 2:
            _unpersist_checkpoint(live.pop(0))
    return ranks


def triangle_count(edges: DataFrame, u_col: str = "u", v_col: str = "v") -> DataFrame:
    """Exact global triangle count via degree-ordered orientation
    (the node-iterator++ / "forward" algorithm: Schank & Wagner 2005,
    the same orientation trick behind GraphX's TriangleCount).

    ``edges`` is an undirected simple graph: one row per unordered
    pair, no self-loops (u < v canonical form recommended; any
    orientation is accepted and canonicalized here).

    Why orientation matters at 100 TB: joining the raw edge list with
    itself on shared endpoints enumerates every WEDGE — for a skewed
    degree distribution (the norm: social graphs, co-occurrence
    graphs) that is Σ d(v)² with the hub dominating. Re-orienting
    every edge from the (degree, id)-smaller endpoint to the larger
    caps every vertex's out-degree at O(sqrt(|E|)), so the wedge join
    is Σ d_out(v)² = O(|E|^1.5) regardless of hubs — the classical
    arboricity bound. Both joins are hash equi-joins Catalyst/AQE can
    skew-split further.

    Returns a 1-row DataFrame: ``n_triangles`` (bigint).
    """
    e = (
        edges.select(
            F.least(F.col(u_col), F.col(v_col)).alias("a"),
            F.greatest(F.col(u_col), F.col(v_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n")).unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # Orient each edge from the (degree, id)-smaller endpoint to the
    # larger; broadcast the degree table when it's dimension-sized,
    # else it's a pair of hash joins on the node key.
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        e.join(da, F.col("a") == F.col("da.n"))
        .join(db, F.col("b") == F.col("db.n"))
        .select(
            F.when(
                (F.col("da.d") < F.col("db.d"))
                | ((F.col("da.d") == F.col("db.d")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(F.struct(F.col("b").alias("src"), F.col("a").alias("dst")))
            .alias("o")
        )
        .select("o.src", "o.dst")
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = w1.join(w2, F.col("w1.src") == F.col("w2.src")).filter(
        F.col("w1.dst") < F.col("w2.dst")
    )
    closing = oriented.select(
        F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y")
    )
    tri = wedges.join(
        closing,
        (F.least("w1.dst", "w2.dst") == F.col("x"))
        & (F.greatest("w1.dst", "w2.dst") == F.col("y")),
    )
    return tri.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def bfs_levels(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    source,
    max_depth: int = 3,
    directed: bool = False,
) -> DataFrame:
    """Fixed-depth breadth-first search from one source node: every
    node within ``max_depth`` hops, labeled with its hop distance —
    the reachability/radius primitive complementing
    `connected_components` (which answers "same component?" but not
    "how far?").

    FIXED iterations (the pagerank/kmeans certificate convention):
    each level d is one equi-join of the previous frontier against
    the edge list plus one anti-join against the visited set — no
    data-dependent stopping, so a SQL oracle unrolls the identical
    ``max_depth`` layers. Set semantics throughout (distinct nodes);
    no floats anywhere, so cross-engine exactness is trivial. At
    scale each iteration shuffles |frontier ⋈ edges| keyed rows;
    the visited set stays keyed by node for the anti-join.

    Returns (node, level) with level 0 = the source."""
    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("t")
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("t").alias("s"), F.col("s").alias("t"))
        )
    # materialize once: every level re-joins the edge list, and
    # without this the full upstream derivation (joins, distinct)
    # would re-execute max_depth times
    e = e.distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    node_type = e.schema["s"].dataType.simpleString()
    visited = spark.createDataFrame(
        [(source, 0)], f"node {node_type}, level int"
    )
    frontier = visited.select("node")
    for d in range(1, max_depth + 1):
        nxt = (
            e.join(
                frontier.withColumnRenamed("node", "s"), "s"
            )
            .select(F.col("t").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(d))
        )
        nxt = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return visited


def shortest_paths(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    source,
    n_iter: int = 6,
    directed: bool = True,
) -> DataFrame:
    """Single-source shortest path distances by ``n_iter``
    Bellman-Ford relaxation rounds — the weighted generalization of
    `bfs_levels` (which counts hops): after round d every node whose
    OPTIMAL path uses <= d edges carries its exact distance. A node
    one hop away can still be overestimated if its best route is a
    longer-but-cheaper chain of more than ``n_iter`` edges — size
    ``n_iter`` to the graph's weighted-path hop diameter, or treat
    the result as the standard "<= n_iter-edge-constrained shortest
    path" semantics (exact under that reading for EVERY node, which
    is what a fixed-round SQL oracle certifies — the pagerank/kmeans
    fixed-iteration convention; no data-dependent convergence
    test).

    Weights must be NON-NEGATIVE INTEGERS (integral type enforced;
    min/+ over integers is engine-exact in any order — float
    distances would be path-order-dependent). Each round is one
    equi-join of the current distance table against the edge list +
    one min-aggregation; the edge list is localCheckpointed once
    (the bfs_levels lesson). Returns (node, dist) for every reached
    node; unreached nodes are absent."""
    from pyspark.sql import types as T

    wtype = edges.schema[weight_col].dataType
    if not isinstance(
        wtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"shortest_paths: weight_col {weight_col!r} is "
            f"{wtype.simpleString()}; exact min-plus relaxation "
            "needs integral weights (quantize upstream)"
        )
    e = edges.select(
        F.col(src_col).alias("s"),
        F.col(dst_col).alias("t"),
        F.col(weight_col).cast("long").alias("w"),
    )
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("t").alias("s"), F.col("s").alias("t"), "w"
            )
        )
    # checkpoint FIRST, validate against the materialized edges —
    # guarding the raw plan would execute the upstream derivation
    # twice (the bfs_levels lesson)
    e = e.localCheckpoint(eager=True)
    neg = e.filter(F.col("w") < 0).limit(1).count()
    if neg:
        raise ValueError(
            "shortest_paths: negative weights — fixed-round "
            "Bellman-Ford would silently under-relax"
        )
    spark = edges.sparkSession
    node_type = e.schema["s"].dataType.simpleString()
    dist = spark.createDataFrame(
        [(source, 0)], f"node {node_type}, dist long"
    )
    for _ in range(n_iter):
        relaxed = (
            e.join(dist.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("t").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def kcore(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    n_rounds: int = 8,
) -> DataFrame:
    """k-core decomposition by ``n_rounds`` peeling rounds: drop
    every node of degree < k, recompute degrees on the induced
    subgraph, repeat — the dense-subgraph extractor behind spam-ring
    and community-nucleus detection (the k-core is the maximal
    subgraph where every member has >= k surviving neighbors).

    FIXED rounds (the pagerank/bfs certificate convention): after
    round r the survivor set is the r-step peel, which EQUALS the
    true k-core iff the peel has converged. The result carries an
    explicit ``converged`` flag (no node dropped in the final
    round); when true the output IS the exact k-core — the
    honest-contract form `shortest_paths` uses for its
    <=n_iter-edge semantics. A SQL oracle unrolls exactly
    ``n_rounds`` layers; the implementation exits early once a
    round drops nothing, which is OUTPUT-IDENTICAL because peeling
    is idempotent after convergence (every later unrolled layer is
    a no-op on both engines) — an execution shortcut, not a
    semantic branch. Size ``n_rounds`` to the peel depth
    (degeneracy ordering peels shallow graphs in a handful of
    rounds; a path graph needs O(n) — state the contract, don't
    guess).

    Graph semantics: undirected simple graph — edges are
    symmetrized and dedup'd, self-loops dropped (a self-loop would
    let an isolated node count itself toward k). All-integer
    degrees; no floats anywhere. Each round is one degree
    aggregation + two semi-joins of the edge list against the
    survivor set; the live edge set is localCheckpointed per round
    (the bfs_levels lesson — otherwise round r re-executes rounds
    1..r-1).

    Returns (node, degree, converged): surviving nodes with their
    final induced degree."""
    if k < 1:
        raise ValueError("kcore: k must be >= 1")
    if n_rounds < 1:
        raise ValueError("kcore: n_rounds must be >= 1")
    e = _undirected_edges(edges, src_col, dst_col)
    dropped_last = 0
    for _ in range(n_rounds):
        deg = e.groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        ).localCheckpoint(eager=True)
        keep = deg.filter(F.col("deg") >= F.lit(int(k))).select("s")
        # one aggregation returns both counts (one job per round,
        # not two, over the checkpointed degree table)
        row = deg.agg(
            F.count(F.lit(1)).alias("nb"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("deg") >= F.lit(int(k)), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("na"),
        ).collect()[0]
        dropped_last = int(row["nb"]) - int(row["na"])
        if dropped_last == 0:
            break
        e = (
            e.join(keep, "s")
            .join(keep.withColumnRenamed("s", "t"), "t")
            .select("s", "t")
            .localCheckpoint(eager=True)
        )
    out = e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return out.withColumn("converged", F.lit(dropped_last == 0))


def label_propagation(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    n_rounds: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection over an
    undirected graph: every node starts as its own label; each round
    every node adopts the most frequent label among its neighbors
    (ties -> smallest label) — the cheap community detector that
    groups densely linked near-duplicate clusters or co-citation
    neighborhoods without any modularity machinery.

    DETERMINISTIC by construction, unlike classic LPA: updates are
    synchronous (no visit order) and the argmax tiebreak is total
    (count DESC, label ASC), so a SQL oracle unrolls the identical
    ``n_rounds`` layers — the pagerank/bfs fixed-iteration
    convention. The honest caveat of the synchronous variant:
    bipartite-ish regions can oscillate with period 2 instead of
    converging (the classic LPA result), which fixed rounds render
    deterministic rather than hide — communities are "labels after
    exactly n_rounds". Concretely (ADVICE r9): an isolated 2-node
    component {10,11} ends every ODD round with its labels SWAPPED
    (10→11, 11→10), so the returned labels are NOT guaranteed to be
    a partition consistent with connectivity — two nodes sharing a
    label may sit in different oscillation phases, and callers that
    need a connectivity-consistent partition should use
    `connected_components` (exact) or group on (label, round-parity
    insensitive) post-processing of their own. Changing the update
    to include the node's own label would fix 2-cycles but is a
    different operator contract — the registered `labelprop` oracle
    pins the pure-neighbor synchronous vote.

    Node labels need only be ORDERABLE (any id type — int, string,
    date): the argmax is min(struct(-count, label)), which negates
    the always-numeric count rather than the label. Self-loops are
    dropped; edges are symmetrized and dedup'd. Per round: one join
    of the edge list against the label table + one (node, label)
    count + one per-node argmax — two shuffles over edges, same as
    `connected_components`' per-round cost; the label table is
    localCheckpointed per round (lineage bound).

    Returns (node, label) after ``n_rounds``.
    """
    if n_rounds < 1:
        raise ValueError("label_propagation: n_rounds must be >= 1")
    e = _undirected_edges(edges, src_col, dst_col)
    labels = (
        e.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_rounds):
        counts = (
            e.join(labels, e["s"] == labels["node"])
            .groupBy(F.col("t").alias("v"), F.col("lab"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        # argmax via min(struct(-cnt, lab)): negate the always-numeric
        # count, never the label, so string/any-orderable node ids work
        labels = (
            counts.groupBy(F.col("v").alias("node"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"), F.col("lab")
                    )
                ).alias("m")
            )
            .select("node", F.col("m.lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lab").alias("label"))


def hits(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    n_iter: int = 2,
    k: int = 10,
) -> DataFrame:
    """Kleinberg's HITS (hubs and authorities), UNNORMALIZED so every
    score is an exact integer: with h_0 = 1 on all source nodes,
    round t computes a_t(v) = sum of h_{t-1} over in-edges, then
    h_t(u) = sum of a_t over out-edges. Skipping the usual L2
    normalization changes nothing about the RANKING (normalization
    is a positive scalar per round) but turns every score into a sum
    of path counts — DECIMAL(38,0) arithmetic with no float
    divergence, the `pagerank`-certificate convention taken all the
    way to exactness. Rankings after n_iter rounds are the power-
    iteration approximation of the principal eigenvector of A^T A;
    scores grow like (d_max^2)^n_iter, so DECIMAL(38,0) holds
    through n_iter <= 4 even at billion-edge degree skew.

    FIXED ``n_iter`` rounds (no data-dependent stop): a SQL oracle
    unrolls the identical join layers. Set semantics on edges
    (distinct), edge list localCheckpointed ONCE and re-joined every
    round — 2 shuffles per round keyed by node. Returns the top
    ``k`` authorities: (node, authority, hub), authority DESC with
    the node id breaking boundary ties; hub is the node's final hub
    score (0 for pure sinks)."""
    if n_iter < 1:
        raise ValueError("hits: n_iter >= 1")
    if k < 1:
        raise ValueError("hits: k must be >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("v")
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    one = F.lit(1).cast("decimal(38,0)")
    h = e.select("u").distinct().select("u", one.alias("h"))
    a = None
    for _ in range(n_iter):
        a = (
            e.join(h, "u")
            .groupBy("v")
            .agg(F.sum("h").cast("decimal(38,0)").alias("a"))
            .localCheckpoint(eager=True)
        )
        h = (
            e.join(a, "v")
            .groupBy("u")
            .agg(F.sum("a").cast("decimal(38,0)").alias("h"))
            .localCheckpoint(eager=True)
        )
    top = (
        a.orderBy(F.col("a").desc(), F.col("v").asc())
        .limit(k)
        .join(h.withColumnRenamed("u", "v"), "v", "left")
        .select(
            F.col("v").alias("node"),
            F.col("a").alias("authority"),
            F.coalesce(F.col("h"), F.lit(0).cast("decimal(38,0)")).alias(
                "hub"
            ),
        )
        .orderBy(F.col("authority").desc(), F.col("node").asc())
    )
    return top


def mst_boruvka(
    edges: DataFrame,
    src_col: str = "u",
    dst_col: str = "v",
    weight_col: str = "w",
    n_rounds: int = 3,
) -> DataFrame:
    """Minimum-spanning-forest edges by ``n_rounds`` Boruvka phases
    — the graph family's weighted completion (CC finds the
    components; this finds the cheapest skeleton that connects
    them). Each phase picks, for every current component, its
    minimum outgoing edge under the STRICT total order
    (w, min(u,v), max(u,v)) — a deterministic tie-break, which makes
    the MST unique and every selected edge cut-property-safe — then
    contracts the picked edges with the exact min-label
    `connected_components`.

    Fixed-round contract (the pagerank/kmeans/`shortest_paths`
    convention, no data-dependent convergence test): after r phases
    the selected set is EXACTLY the unique MST's edges restricted to
    components of Boruvka depth <= r. Components at least halve
    each phase, so ``n_rounds`` = ceil(log2(max component size))
    completes the forest; smaller values return the documented
    partial forest (still a SUBSET of the unique MST — never a
    wrong edge). Returns one row per selected edge: (u, v, w) with
    u < v.

    Weights must be INTEGRAL (enforced): the argmin over exact
    integers is engine-exact in any grouping order, which is what
    lets a SQL oracle unroll the phases. Self-loops and duplicate
    (u, v) edges are dropped up front (the cheapest parallel edge
    survives via the min-struct). Scale: per phase, 2 edge-keyed
    joins against the label table + one component-keyed argmin +
    one contraction CC over the PICKED edges only (<= #components
    rows, not the edge list); the symmetrized edge table is
    localCheckpointed once.
    """
    from pyspark.sql import types as T

    if n_rounds < 1:
        raise ValueError("mst_boruvka: n_rounds must be >= 1")
    wtype = edges.schema[weight_col].dataType
    if not isinstance(
        wtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"mst_boruvka: weight_col {weight_col!r} is "
            f"{wtype.simpleString()}; exact argmin needs integral "
            "weights (quantize upstream)"
        )
    # canonical undirected edges (u < v), cheapest parallel edge.
    # NULL weights are dropped up front: Spark struct-min orders a
    # NULL field BEFORE every value, so a NULL-weight edge would win
    # every argmin (review finding) — and a weightless edge has no
    # defined place in an MST anyway.
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .filter(
            (F.col("a") != F.col("b")) & F.col("w").isNotNull()
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    # symmetrized view for per-endpoint argmin
    sym = canon.unionByName(
        canon.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "w"
        )
    ).localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    )
    from hdfe_spark.operators.estimate import _unpersist_checkpoint

    picked = None
    for _ in range(n_rounds):
        la = labels.select(
            F.col("node").alias("__na"), F.col("comp").alias("__ca")
        )
        lb = labels.select(
            F.col("node").alias("__nb"), F.col("comp").alias("__cb")
        )
        # materialize ONCE per phase: the argmin, the parent table,
        # and the emptiness decision all read this double join
        # (review finding: un-checkpointed it executed 3x per phase)
        cross = (
            sym.join(la, sym["a"] == la["__na"])
            .join(lb, sym["b"] == lb["__nb"])
            .filter(F.col("__ca") != F.col("__cb"))
            .localCheckpoint(eager=True)
        )
        # min outgoing edge per component under (w, min, max); the
        # struct also carries the edge's FAR component so the
        # contraction needs no join back against cross
        chosen = cross.groupBy("__ca").agg(
            F.min(
                F.struct(
                    F.col("w"),
                    F.least(F.col("a"), F.col("b")).alias("u"),
                    F.greatest(F.col("a"), F.col("b")).alias("v"),
                    F.col("__cb").alias("cb"),
                )
            ).alias("m")
        ).localCheckpoint(eager=True)
        _unpersist_checkpoint(cross)
        if chosen.limit(1).count() == 0:
            break
        new_edges = chosen.select(
            F.col("m.u").alias("u"),
            F.col("m.v").alias("v"),
            F.col("m.w").alias("w"),
        ).distinct().localCheckpoint(eager=True)
        picked = (
            new_edges
            if picked is None
            else picked.unionByName(new_edges).distinct()
        ).localCheckpoint(eager=True)
        # contract by POINTER DOUBLING over the chosen-edge pseudo-
        # forest, not min-label CC: each component points at the far
        # component of its pick; the functional graph is trees
        # hanging off 2-cycles (mutual picks). Break each 2-cycle at
        # its min endpoint, then square the pointer until fixpoint —
        # O(log diameter) rounds, where one-hop min-label CC needs
        # O(diameter) rounds and its max_iter raises on chain-shaped
        # merge graphs (review finding: a monotone-weight path is
        # exactly that shape).
        par = chosen.select(
            F.col("__ca").alias("c"), F.col("m.cb").alias("p")
        )
        pp = par.select(
            F.col("c").alias("__c2"), F.col("p").alias("__p2")
        )
        par = (
            par.join(pp, par["p"] == pp["__c2"], "left")
            .select(
                "c",
                F.when(
                    F.col("__p2") == F.col("c"),  # 2-cycle
                    F.least(F.col("c"), F.col("p")),
                )
                .otherwise(F.col("p"))
                .alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        while True:
            hop = par.select(
                F.col("c").alias("__c2"), F.col("p").alias("__p2")
            )
            nxt = (
                par.join(hop, par["p"] == hop["__c2"], "left")
                .select(
                    "c",
                    F.coalesce(F.col("__p2"), F.col("p")).alias("p"),
                    (
                        F.coalesce(F.col("__p2"), F.col("p"))
                        != F.col("p")
                    ).cast("long").alias("__chg"),
                )
                .localCheckpoint(eager=True)
            )
            changed = nxt.agg(F.sum("__chg")).collect()[0][0]
            _unpersist_checkpoint(par)
            par = nxt.drop("__chg")
            if not changed:
                break
        labels = (
            labels.join(par, labels["comp"] == par["c"], "left")
            .select(
                labels["node"],
                F.coalesce(par["p"], labels["comp"]).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        _unpersist_checkpoint(par)
    if picked is None:
        return canon.filter(F.lit(False)).select(
            F.col("a").alias("u"), F.col("b").alias("v"), "w"
        )
    return picked


def common_neighbors(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int = 20,
    min_cn: int = 2,
) -> DataFrame:
    """Link prediction by neighborhood overlap: for every NON-edge
    node pair sharing >= ``min_cn`` neighbors, the common-neighbor
    count and the resource-allocation index — the classic "which
    links are missing" scores (Liben-Nowell & Kleinberg 2003; RA:
    Zhou, Lu, Zhang 2009 — both public). RA down-weights hub
    wedges: RA(u,v) = Σ_{z in CN} 1/deg(z).

    Engine-exactness: RA is QUANTIZED to integer arithmetic —
    ra_q = Σ (2^30 div deg(z)), true integer division in BOTH
    engines, so the sum is order-free and a SQL oracle replays it
    verbatim (no float sum over a variable-size set, no libm).
    Top-``k`` under the total order (cn DESC, ra_q DESC, u, v).

    Plan: symmetrize+dedup once (shared `_undirected_edges`), one
    node-keyed degree aggregation broadcast back, ONE wedge
    self-join keyed on the center node emitting (u < v) pairs, one
    pair-keyed aggregation, an anti-join against the existing edge
    set, then TakeOrderedAndProject. Cost is the triangle-count
    shape — Σ_z deg(z)^2 wedges; on power-law graphs cap the hubs
    upstream (drop deg > d_max centers) exactly as `triangle_count`
    documents. Never materializes all node pairs.
    """
    if k < 1:
        raise ValueError("common_neighbors: k must be >= 1")
    if min_cn < 1:
        raise ValueError("common_neighbors: min_cn must be >= 1")
    sym = _undirected_edges(edges, src_col, dst_col)
    deg = sym.groupBy(F.col("s").alias("__z")).agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    )
    # wedge u - z - v with u < v; each side carries the center's
    # degree share (2^30 div deg) so the pair agg needs no re-join.
    # NO broadcast hint: deg is node-sized and unbounded (review
    # r10) — AQE auto-broadcasts small graphs and shuffles big ones
    wz = sym.join(deg, sym["s"] == deg["__z"]).select(
        F.col("s").alias("__c"),
        F.col("t").alias("__n"),
        # true integer division (SQL `div`) — a float divide +
        # cast can truncate across an integer boundary when the
        # quotient rounds up to the next representable double (the
        # `rrf_fuse` lesson)
        F.expr(f"{1 << 30} div __deg").cast("long").alias("__ra"),
    )
    a = wz.select(
        F.col("__c"), F.col("__n").alias("u"), F.col("__ra")
    )
    b = wz.select(F.col("__c").alias("__c2"), F.col("__n").alias("v"))
    pairs = (
        a.join(b, (a["__c"] == b["__c2"]) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum("__ra").cast("long").alias("ra_q"),
        )
        .filter(F.col("cn") >= min_cn)
    )
    existing = sym.filter(F.col("s") < F.col("t")).select(
        F.col("s").alias("u"), F.col("t").alias("v")
    )
    return (
        pairs.join(existing, ["u", "v"], "left_anti")
        .orderBy(
            F.col("cn").desc(), F.col("ra_q").desc(), "u", "v"
        )
        .limit(k)
    )
