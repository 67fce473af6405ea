"""Round-9 operator tests: event_transitions, logistic2, item_cf,
kcore."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.basket import item_cf
from hdfe_spark.operators.graph import kcore
from hdfe_spark.operators.sessions import event_transitions
from hdfe_spark.operators.stats import logistic2


# ------------------------------------------------- event_transitions


def _ev(spark, rows):
    return spark.createDataFrame(rows, "e long, o long, s string, i long")


def test_transitions_counts_and_probs(spark):
    df = _ev(spark, [
        (1, 1, "a", 0), (1, 2, "b", 1), (1, 3, "a", 2), (1, 4, "b", 3),
        (2, 1, "a", 4), (2, 2, "a", 5),
    ])
    out = {(r["src"], r["dst"]): r for r in
           event_transitions(df, "e", "o", "s").collect()}
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "a")]["n"] == 1
    assert out[("b", "a")]["n"] == 1
    # margins: a emits 3 transitions, b emits 1
    assert out[("a", "b")]["n_src"] == 3
    assert out[("a", "b")]["p"] == pytest.approx(2 / 3)
    assert out[("b", "a")]["p"] == 1.0


def test_transitions_no_cross_entity_pairing(spark):
    df = _ev(spark, [(1, 1, "a", 0), (2, 2, "b", 1)])
    assert event_transitions(df, "e", "o", "s").count() == 0


def test_transitions_null_rows_excluded(spark):
    df = _ev(spark, [
        (1, 1, "a", 0), (1, 2, None, 1), (1, 3, "b", 2),
        (None, 4, "a", 3), (1, None, "c", 4),
    ])
    out = event_transitions(df, "e", "o", "s").collect()
    # the NULL-state row is excluded up front -> a(1) pairs with b(3)
    assert len(out) == 1
    assert (out[0]["src"], out[0]["dst"]) == ("a", "b")


def test_transitions_duplicate_order_raises(spark):
    df = _ev(spark, [(1, 1, "a", 0), (1, 1, "b", 1)])
    with pytest.raises(Exception, match="duplicate order"):
        event_transitions(df, "e", "o", "s").collect()
    # a tiebreak making the key total fixes it
    assert event_transitions(df, "e", "o", "s", ["i"]).count() == 1


def test_transitions_duplicate_full_key_raises(spark):
    df = _ev(spark, [(1, 1, "a", 7), (1, 1, "b", 7)])
    with pytest.raises(Exception, match="duplicate order"):
        event_transitions(df, "e", "o", "s", ["i"]).collect()


# --------------------------------------------------------- logistic2


def test_logistic_recovers_coefficients(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(0.0, 2.0, 4000)
    p = 1 / (1 + np.exp(-(0.5 + 1.2 * x)))
    y = (rng.random(4000) < p).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "x double, y long"
    )
    r = logistic2(df, "x", "y", n_iter=6).collect()[0]
    # full-precision Newton reference
    b = np.zeros(2)
    X = np.column_stack([np.ones_like(x), x])
    for _ in range(12):
        pp = 1 / (1 + np.exp(-X @ b))
        w = pp * (1 - pp)
        b = b + np.linalg.solve(X.T @ (X * w[:, None]), X.T @ (y - pp))
    assert r["n"] == 4000 and r["n_pos"] == int(y.sum())
    # wbits=16 quantization bounds the gap well inside 1e-3
    assert abs(r["b0"] - b[0]) < 1e-3
    assert abs(r["b1"] - b[1]) < 1e-3


def test_logistic_iteration0_balanced_gradient(spark):
    # at beta=0, p=1/2 exactly: one sweep = one weighted-OLS step
    # whose slope sign must match the class separation
    df = spark.createDataFrame(
        [(-1.0, 0), (-2.0, 0), (1.0, 1), (2.0, 1)], "x double, y long"
    )
    r = logistic2(df, "x", "y", n_iter=1).collect()[0]
    assert r["b1"] > 0 and abs(r["b0"]) < 1e-9


def test_logistic_guards(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 0)], "x double, y long")
    with pytest.raises(ValueError, match="integral"):
        logistic2(df.withColumn("y", F.col("y").cast("double")), "x", "y")
    with pytest.raises(ValueError, match="outside"):
        logistic2(df.withColumn("y", F.col("y") + 1), "x", "y")
    with pytest.raises(ValueError, match="singular"):
        logistic2(df.withColumn("x", F.lit(3.0)), "x", "y")
    with pytest.raises(ValueError, match="no rows"):
        logistic2(df.filter("x > 99"), "x", "y")


def test_logistic_boolean_y_accepted(spark):
    df = spark.createDataFrame(
        [(-1.0, False), (-2.0, False), (1.0, True), (2.0, True)],
        "x double, y boolean",
    )
    r = logistic2(df, "x", "y", n_iter=2).collect()[0]
    assert r["n_pos"] == 2 and r["b1"] > 0


# ----------------------------------------------------------- item_cf


def test_item_cf_cosine_and_rank(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
            (3, "a"), (3, "c"), (4, "b"), (4, "c"), (5, "a"), (5, "b")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["item"], r["neighbor"]): r for r in
           item_cf(df, "b", "i", min_count=1, k=10).collect()}
    # margins: a=4 b=4 c=3; co-occurrence ab=3 ac=2 bc=2
    assert out[("a", "b")]["cosine"] == 3 / math.sqrt(16)
    assert out[("a", "c")]["cosine"] == 2 / math.sqrt(12)
    assert out[("a", "b")]["rank"] == 1
    assert out[("a", "c")]["rank"] == 2
    # symmetric cosine, per-side ranks
    assert out[("c", "a")]["cosine"] == out[("a", "c")]["cosine"]
    # c's neighbors tie at 2/sqrt(12) -> tiebreak on neighbor key
    assert out[("c", "a")]["rank"] == 1
    assert out[("c", "b")]["rank"] == 2


def test_item_cf_k_and_min_count(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "b long, i string")
    top1 = item_cf(df, "b", "i", min_count=1, k=1)
    assert top1.filter("item = 'a'").count() == 1
    # min_count=2 keeps only the ab pair
    out = item_cf(df, "b", "i", min_count=2, k=10).collect()
    assert {(r["item"], r["neighbor"]) for r in out} == {
        ("a", "b"), ("b", "a")
    }


def test_item_cf_duplicate_basket_items_count_once(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "b long, i string"
    )
    r = item_cf(df, "b", "i", min_count=1, k=5).collect()[0]
    assert r["n_ab"] == 1 and r["n_item"] == 1 and r["cosine"] == 1.0


# ------------------------------------------------------------- kcore


def _g(spark, edges):
    return spark.createDataFrame(edges, "s long, t long")


def test_kcore_triangle_with_pendants(spark):
    df = _g(spark, [(1, 2), (2, 3), (1, 3), (1, 4), (5, 6)])
    out = {r["node"]: r for r in
           kcore(df, "s", "t", k=2, n_rounds=5).collect()}
    assert set(out) == {1, 2, 3}
    assert all(r["degree"] == 2 and r["converged"] for r in out.values())


def test_kcore_cascade_needs_multiple_rounds(spark):
    # path 4-5 hangs off a triangle: removing 5 (deg 1) drops 4 to
    # deg 1 -> second round removes it too
    df = _g(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    out = kcore(df, "s", "t", k=2, n_rounds=5).collect()
    assert {r["node"] for r in out} == {1, 2, 3}
    assert all(r["converged"] for r in out)
    # one round is NOT enough: node 4 still present, flagged honest
    partial = kcore(df, "s", "t", k=2, n_rounds=1).collect()
    assert {r["node"] for r in partial} == {1, 2, 3, 4}
    assert not any(r["converged"] for r in partial)


def test_kcore_self_loops_and_direction_ignored(spark):
    df = _g(spark, [(1, 1), (1, 2), (2, 1), (2, 3), (1, 3)])
    out = kcore(df, "s", "t", k=2, n_rounds=4).collect()
    assert {r["node"] for r in out} == {1, 2, 3}
    assert all(r["degree"] == 2 for r in out)


def test_kcore_empty_core(spark):
    df = _g(spark, [(1, 2), (2, 3)])
    assert kcore(df, "s", "t", k=3, n_rounds=4).count() == 0


def test_kcore_guards(spark):
    df = _g(spark, [(1, 2)])
    with pytest.raises(ValueError, match="k must"):
        kcore(df, "s", "t", k=0)
    with pytest.raises(ValueError, match="n_rounds"):
        kcore(df, "s", "t", k=1, n_rounds=0)


# ------------------------------------------- streaming_transitions


def test_streaming_transitions_equals_batch(spark, sf_dir):
    """Sixteenth streaming form: summed per-batch transition deltas
    after an availableNow replay equal the batch operator's counts
    exactly (integer dict equality)."""
    from hdfe_spark.sources.tables import load_table, ts_micros
    from hdfe_spark.streaming.ops import (
        read_events_stream,
        streaming_transitions,
    )

    ev = load_table(spark, "events", sf_dir)
    stream = read_events_stream(spark, sf_dir)
    sm = streaming_transitions(stream, "user_id", "event_id", "event_type")
    name = "transitions_stream_sink"
    q = (
        sm.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in spark.table(name)
        .groupBy("src", "dst")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    batch = {
        (r["src"], r["dst"]): r["n"]
        for r in event_transitions(
            ev, "user_id", "event_id", "event_type"
        ).collect()
    }
    assert got == batch


def test_streaming_transitions_bridges_batches(spark, tmp_path):
    """The cross-batch BRIDGE transition (stored last state -> first
    event of the next batch) must be emitted: two single-file
    micro-batches whose junction pair appears nowhere within either
    batch."""
    src = str(tmp_path / "trans_batches")
    b1 = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "u long, o long, s string"
    )
    b2 = spark.createDataFrame(
        [(1, 3, "c"), (1, 4, "a")], "u long, o long, s string"
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    from hdfe_spark.streaming.ops import streaming_transitions

    stream = (
        spark.readStream.schema("u long, o long, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    sm = streaming_transitions(stream, "u", "o", "s")
    name = "trans_bridge_sink"
    q = (
        sm.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in spark.table(name)
        .groupBy("src", "dst")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    # the full ordered walk a->b->c->a regardless of how the files
    # were split into micro-batches
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1}


def test_streaming_transitions_multichunk_order(spark, tmp_path):
    """The streaming_ewma chunk lesson: a key spanning multiple
    Arrow chunks must pair in ONE global order sort."""
    src = str(tmp_path / "trans_chunks")
    # 8 rows, one key, written in REVERSE order: sorted walk is
    # a b a b a b a b -> (a,b):4, (b,a):3
    rows = [(1, 8 - i, "a" if (8 - i) % 2 == 1 else "b")
            for i in range(8)]
    spark.createDataFrame(
        rows, "u long, o long, s string"
    ).coalesce(1).write.parquet(src)
    from hdfe_spark.streaming.ops import streaming_transitions

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema("u long, o long, s string").parquet(
            src
        )
        sm = streaming_transitions(stream, "u", "o", "s")
        name = "trans_chunk_sink"
        q = (
            sm.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in spark.table(name).groupBy("src", "dst")
        .agg(F.sum("n").alias("n")).collect()
    }
    assert got == {("a", "b"): 4, ("b", "a"): 3}


# ------------------------------------------------- label_propagation


def test_label_prop_two_triangles(spark):
    from hdfe_spark.operators.graph import label_propagation

    df = _g(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)])
    out = {r["node"]: r["label"] for r in
           label_propagation(df, "s", "t", n_rounds=3).collect()}
    # each triangle collapses to its min label
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == out[5] == out[6] == 4


def test_label_prop_deterministic_tiebreak(spark):
    from hdfe_spark.operators.graph import label_propagation

    # node 3's neighbors {1, 2} tie at count 1 -> smallest label
    df = _g(spark, [(1, 3), (2, 3)])
    out = {r["node"]: r["label"] for r in
           label_propagation(df, "s", "t", n_rounds=1).collect()}
    assert out[3] == 1
    # 1 and 2 each have only neighbor 3
    assert out[1] == 3 and out[2] == 3


def test_label_prop_fixed_rounds_deterministic(spark):
    from hdfe_spark.operators.graph import label_propagation

    # bipartite 2-cycle oscillates: after 1 round labels swap; after
    # 2 rounds they swap back — both answers deterministic
    df = _g(spark, [(1, 2)])
    r1 = {r["node"]: r["label"] for r in
          label_propagation(df, "s", "t", n_rounds=1).collect()}
    r2 = {r["node"]: r["label"] for r in
          label_propagation(df, "s", "t", n_rounds=2).collect()}
    assert r1 == {1: 2, 2: 1}
    assert r2 == {1: 1, 2: 2}


# ------------------------------------------------------ logistic2_by


def test_logistic_by_matches_solo_fits(spark):
    from hdfe_spark.operators.stats import logistic2, logistic2_by

    rng = np.random.default_rng(11)
    rows = []
    for g, (a, b) in enumerate([(0.2, 1.0), (-0.5, 2.0)]):
        x = rng.normal(0, 1.5, 1500)
        y = (rng.random(1500) < 1 / (1 + np.exp(-(a + b * x)))).astype(int)
        rows += [(f"g{g}", float(xx), int(yy)) for xx, yy in zip(x, y)]
    df = spark.createDataFrame(rows, "g string, x double, y long")
    out = {r["g"]: r for r in
           logistic2_by(df, "g", "x", "y", n_iter=3).collect()}
    for g in ("g0", "g1"):
        solo = logistic2(
            df.filter(F.col("g") == g), "x", "y", n_iter=3
        ).collect()[0]
        r = out[g]
        assert (r["n"], r["n_pos"]) == (solo["n"], solo["n_pos"])
        # bit-exact: identical moments, identical driver algebra
        assert r["b0"] == solo["b0"] and r["b1"] == solo["b1"]


def test_logistic_by_guards(spark):
    from hdfe_spark.operators.stats import logistic2_by

    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 0), ("b", 3.0, 1), ("b", 3.0, 0)],
        "g string, x double, y long",
    )
    # group b has constant x -> singular, named loudly
    with pytest.raises(ValueError, match="group 'b'"):
        logistic2_by(df, "g", "x", "y")
    with pytest.raises(ValueError, match="max_groups"):
        logistic2_by(df, "g", "x", "y", max_groups=1)
    with pytest.raises(ValueError, match="outside"):
        logistic2_by(df.withColumn("y", F.col("y") * 2), "g", "x", "y")


# ------------------------------------------------- holt


def test_holt_matches_reference_fold(spark):
    from hdfe_spark.operators.stats import holt
    import random

    random.seed(11)
    rows = []
    for k in range(6):
        n = random.choice([2, 3, 9, 50])
        for t in range(n):
            rows.append((k, t, round(random.uniform(-4, 4), 3)))
    df = spark.createDataFrame(rows, "k int, o int, v double")
    out = {r["k"]: r for r in holt(df, "k", "o", "v", 0.3, 0.2).collect()}

    def ref(vs, a, g):
        l, b = vs[0], vs[1] - vs[0]
        for x in vs[1:]:
            ln = a * x + (1 - a) * (l + b)
            b = g * (ln - l) + (1 - g) * b
            l = ln
        return l, b

    import collections

    series = collections.defaultdict(list)
    for k, t, v in rows:
        series[k].append((t, v))
    for k, s in series.items():
        vs = [v for _, v in sorted(s)]
        l, b = ref(vs, 0.3, 0.2)
        r = out[k]
        # bit-exact: the fold replays the identical IEEE sequence
        assert r["level"] == l and r["trend"] == b
        assert r["forecast"] == l + b and r["n"] == len(vs)


def test_holt_drops_single_observation_keys(spark):
    from hdfe_spark.operators.stats import holt

    df = spark.createDataFrame(
        [(1, 1, 5.0), (2, 1, 1.0), (2, 2, 3.0)], "k int, o int, v double"
    )
    out = holt(df, "k", "o", "v", 0.5, 0.5).collect()
    assert [r["k"] for r in out] == [2]
    # n=2: state is exactly the init (l_2, b_2)
    r = out[0]
    l2 = 0.5 * 3.0 + 0.5 * (1.0 + (3.0 - 1.0))
    b2 = 0.5 * (l2 - 1.0) + 0.5 * (3.0 - 1.0)
    assert r["level"] == l2 and r["trend"] == b2


def test_holt_guards(spark):
    from hdfe_spark.operators.stats import holt

    df = spark.createDataFrame(
        [(1, 1, 5.0), (1, 1, 6.0), (1, 2, 7.0)], "k int, o int, v double"
    )
    with pytest.raises(ValueError):
        holt(df, "k", "o", "v", 1.5, 0.5)
    with pytest.raises(ValueError):
        holt(df, "k", "o", "v", 0.5, 0.0)
    with pytest.raises(Exception, match="duplicate order"):
        holt(df, "k", "o", "v", 0.5, 0.5).collect()


# ------------------------------------------------- poisson2


def test_poisson_recovers_rate_params(spark):
    import numpy as np

    from hdfe_spark.operators.stats import poisson2

    rng = np.random.default_rng(9)
    x = rng.normal(0, 1.0, 4000)
    y = rng.poisson(np.exp(0.4 + 0.7 * x))
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "x double, y long"
    )
    r = poisson2(df, "x", "y", n_iter=4).collect()[0]
    assert abs(r["b0"] - 0.4) < 0.1 and abs(r["b1"] - 0.7) < 0.1
    assert r["n"] == 4000 and r["sum_y"] == int(y.sum())


def test_poisson_guards(spark):
    from hdfe_spark.operators.stats import poisson2

    df = spark.createDataFrame(
        [(1.0, 2), (2.0, 0), (3.0, 1)], "x double, y long"
    )
    with pytest.raises(ValueError, match="integral"):
        poisson2(df.withColumn("y", F.col("y").cast("double")), "x", "y")
    with pytest.raises(ValueError, match="negative"):
        poisson2(df.withColumn("y", F.col("y") - 5), "x", "y")
    with pytest.raises(ValueError, match="singular"):
        poisson2(df.withColumn("x", F.lit(1.0)), "x", "y")
    with pytest.raises(ValueError):
        poisson2(df, "x", "y", n_iter=0)


def test_poisson_first_sweep_is_weighted_ols_identity(spark):
    # beta=0 -> mu=1: the first Newton step solves the EXACT integer
    # normal equations; verify against a numpy solve on the same
    # quantized moments
    import numpy as np

    from hdfe_spark.operators.stats import poisson2

    xs = [0.5, 1.5, -2.0, 3.25]
    ys = [1, 3, 0, 2]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y long")
    r = poisson2(df, "x", "y", n_iter=1).collect()[0]
    xu = np.array([round(v * 1e6) for v in xs], dtype=object)
    W = 65536
    sw = float(W * len(xs))
    swx = float(sum(W * u for u in xu))
    swxx = float(sum(W * u * u for u in xu))
    sg = float(sum((y - 1) * W for y in ys))
    sgx = float(sum((y - 1) * W * u for y, u in zip(ys, xu)))
    det = sw * swxx - swx * swx
    b0 = (swxx * sg - swx * sgx) / det
    b1 = (sw * sgx - swx * sg) / det
    assert r["b0"] == b0 and r["b1"] == b1 * 1e6


# ------------------------------------------------- tree_depth2


def test_tree_depth2_matches_brute_force(spark):
    import random

    from hdfe_spark.operators.stats import tree_depth2

    random.seed(2)
    rows = [
        (
            float(v),
            bool(random.random() < (0.8 if v > 10 else 0.2)),
        )
        for v in (random.randrange(20) for _ in range(500))
    ]
    df = spark.createDataFrame(rows, "x double, y boolean")
    out = {r["node"]: r for r in tree_depth2(df, "x", "y").collect()}

    def bs(data):
        n = len(data)
        p = sum(1 for _, l in data if l)
        if n < 2:
            return None
        parent = 2 * (p / n) * (1 - p / n)
        best = None
        for t in sorted(set(v for v, _ in data))[:-1]:
            L = [(v, l) for v, l in data if v <= t]
            R = [(v, l) for v, l in data if v > t]
            nl, pl = len(L), sum(1 for _, l in L if l)
            nr, pr = len(R), sum(1 for _, l in R if l)
            g = parent - (
                (nl / n) * 2 * (pl / nl) * (1 - pl / nl)
                + (nr / n) * 2 * (pr / nr) * (1 - pr / nr)
            )
            if best is None or g > best[1] + 1e-15:
                best = (t, g, n)
        return best

    root = bs(rows)
    assert out["root"]["threshold"] == root[0]
    assert abs(out["root"]["gain"] - root[1]) < 1e-12
    t = root[0]
    for node, data in (
        ("left", [r for r in rows if r[0] <= t]),
        ("right", [r for r in rows if r[0] > t]),
    ):
        b = bs(data)
        if b is None:
            assert node not in out
        else:
            r = out[node]
            assert r["threshold"] == b[0] and r["n"] == b[2]
            assert abs(r["gain"] - b[1]) < 1e-12


def test_tree_depth2_unsplittable_child_absent(spark):
    from hdfe_spark.operators.stats import tree_depth2

    # left side of the root split ends up single-valued -> no row
    df = spark.createDataFrame(
        [(1.0, True), (1.0, True), (2.0, False), (3.0, True),
         (3.0, False)],
        "x double, y boolean",
    )
    out = {r["node"]: r for r in tree_depth2(df, "x", "y").collect()}
    assert "root" in out
    t = out["root"]["threshold"]
    if t == 1.0:
        assert "left" not in out


def test_tree_depth2_constant_feature_raises(spark):
    from hdfe_spark.operators.stats import tree_depth2

    df = spark.createDataFrame(
        [(1.0, True), (1.0, False)], "x double, y boolean"
    )
    with pytest.raises(ValueError, match="no valid split"):
        tree_depth2(df, "x", "y")
