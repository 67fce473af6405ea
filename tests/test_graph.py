"""Connected-components tests: random graphs against a local
union-find ground truth, and the exact-dedup contract."""

import numpy as np
import pytest

from hdfe_spark.operators.graph import connected_components, dedup_by_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_random_graphs(spark, seed):
    rng = np.random.RandomState(seed)
    n, m = 60, 45
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, n, size=(m, 2))
        if a != b
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    uf = _union_find(n, edges)
    in_graph = {a for e in edges for a in e}
    for v in in_graph:
        assert got[v] == uf[v], f"node {v}"
    assert set(got) == in_graph


def test_dedup_by_components_star_vs_minid(spark):
    """The case the one-pass min-id rule gets wrong: a star with a
    high-id center (5-1, 5-2). Exact single-link keeps ONE doc."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 5, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 5), (2, 5)], "id_a long, id_b long"
    )
    out = sorted(
        r["doc_id"] for r in dedup_by_components(docs, pairs).collect()
    )
    # component {1,2,5} -> keep 1; isolated 9 survives
    assert out == [1, 9]


def test_chain_converges_past_direct_neighbors(spark):
    """A long path needs label propagation past direct neighbors —
    exercises the iteration, not just the init."""
    n = 20
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = connected_components(pairs).collect()
    assert all(r["component"] == 0 for r in comp)
    out = sorted(r["doc_id"] for r in dedup_by_components(docs, pairs).collect())
    assert out == [0]


def test_nonconvergence_raises_not_silent(spark):
    """Exhausting max_iter with labels still moving must raise — a
    silently split component would dedup wrongly."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_pagerank_mass_conserved_and_dangling(spark):
    """Sum of ranks must stay 1 every iteration (dangling mass is
    redistributed, not lost) — a bipartite buyer->supplier graph is
    ALL dangling on the supplier side, the case that leaks to zero
    without redistribution."""
    from hdfe_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (1, 11)], "src long, dst long"
    )
    pr = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=8).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    # 10 has two in-edges from out-degree-2 and out-degree-1 sources;
    # 11 likewise -- both sinks must outrank every source.
    assert min(pr[10], pr[11]) > max(pr[1], pr[2], pr[3])


def test_pagerank_symmetric_cycle_is_uniform(spark):
    """A directed cycle is perfectly symmetric: every node must get
    exactly 1/N at every iteration."""
    from hdfe_spark.operators.graph import pagerank

    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    pr = [r["pr"] for r in pagerank(edges, n_iter=5).collect()]
    assert all(abs(p - 1.0 / n) < 1e-12 for p in pr)


# ------------------------------------------------- hits


def test_hits_matches_python_replica(spark):
    import collections
    import random

    from hdfe_spark.operators.graph import hits

    random.seed(5)
    edges = list(
        {(random.randrange(25), random.randrange(25)) for _ in range(160)}
    )
    df = spark.createDataFrame(edges, "s long, t long")
    out = hits(df, "s", "t", n_iter=2, k=8).collect()

    h = {u: 1 for u, _ in edges}
    a = {}
    for _ in range(2):
        a = collections.defaultdict(int)
        for u, v in edges:
            if u in h:
                a[v] += h[u]
        h2 = collections.defaultdict(int)
        for u, v in edges:
            if v in a:
                h2[u] += a[v]
        h = h2
    top = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    exp = [(n, av, h.get(n, 0)) for n, av in top]
    got = [(r["node"], int(r["authority"]), int(r["hub"])) for r in out]
    assert got == exp


def test_hits_pure_sink_has_zero_hub(spark):
    from hdfe_spark.operators.graph import hits

    # star into node 9 (a pure sink), plus 9 -> nothing
    df = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (1, 2)], "s long, t long"
    )
    out = {r["node"]: r for r in hits(df, "s", "t", n_iter=2, k=4).collect()}
    assert int(out[9]["hub"]) == 0
    # a1: 9->3, 2->1; h1: 1->4, 2->3, 3->3; a2(9)=h1(1)+h1(2)+h1(3)=10
    assert int(out[9]["authority"]) == 10


def test_hits_dedups_edges_and_rejects_bad_iter(spark):
    import pytest as _pytest

    from hdfe_spark.operators.graph import hits

    df = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2)], "s long, t long"
    )
    out = hits(df, "s", "t", n_iter=1, k=5).collect()
    assert len(out) == 1 and int(out[0]["authority"]) == 1
    with _pytest.raises(ValueError):
        hits(df, "s", "t", n_iter=0)
