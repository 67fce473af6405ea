"""Round-10 operators: the model-evaluation family (confusion,
P@k/R@k, quantized NDCG, lift/gains), CUPED variance reduction,
common-neighbor link prediction, skip-gram co-occurrence, Gopher
quality rules, and the nineteenth streaming form. Every expectation
below is hand-computed or an independent Python replica — never the
operator's own output."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------- confusion_stats ----------------


def test_confusion_stats_hand_computed(spark):
    from hdfe_spark.operators.ml import confusion_stats

    rows = [(1, 1), (1, 1), (1, 0), (0, 1), (0, 0), (0, 0), (None, 1), (1, None)]
    df = spark.createDataFrame(rows, "y long, p long")
    r = confusion_stats(df, "y", "p").collect()[0]
    assert (r["n"], r["tp"], r["fp"], r["fn"], r["tn"]) == (6, 2, 1, 1, 2)
    assert r["accuracy"] == 4 / 6
    assert r["precision"] == 2 / 3
    assert r["recall"] == 2 / 3
    assert r["f1"] == 4 / (4 + 1 + 1)


def test_confusion_stats_zero_denominators_are_null(spark):
    from hdfe_spark.operators.ml import confusion_stats

    df = spark.createDataFrame([(0, 0), (0, 0)], "y long, p long")
    r = confusion_stats(df, "y", "p").collect()[0]
    assert r["precision"] is None and r["recall"] is None
    assert r["f1"] is None
    assert r["accuracy"] == 1.0


def test_confusion_stats_rejects_float_labels(spark):
    from hdfe_spark.operators.ml import confusion_stats

    df = spark.createDataFrame([(1.0, 1)], "y double, p long")
    with pytest.raises(ValueError):
        confusion_stats(df, "y", "p")


# ---------------- precision_at_k ----------------


def test_precision_at_k_hand_computed(spark):
    from hdfe_spark.operators.ml import precision_at_k

    # ranking by (score desc, id asc): ids 1..6 scores 6..1,
    # relevant = {1, 3, 4, 6}  (4 relevant total)
    rows = [(1, 6.0, 1), (2, 5.0, 0), (3, 4.0, 1),
            (4, 3.0, 1), (5, 2.0, 0), (6, 1.0, 1)]
    df = spark.createDataFrame(rows, "id long, s double, y long")
    out = {
        r["k"]: r
        for r in precision_at_k(df, "id", "s", "y", ks=[1, 3, 5]).collect()
    }
    assert out[1]["n_rel_at_k"] == 1 and out[1]["precision"] == 1.0
    assert out[3]["n_rel_at_k"] == 2 and out[3]["precision"] == 2 / 3
    assert out[5]["n_rel_at_k"] == 3 and out[5]["precision"] == 3 / 5
    assert out[5]["recall"] == 3 / 4


def test_precision_at_k_score_tie_breaks_by_id(spark):
    from hdfe_spark.operators.ml import precision_at_k

    rows = [(2, 1.0, 0), (1, 1.0, 1)]
    df = spark.createDataFrame(rows, "id long, s double, y long")
    out = precision_at_k(df, "id", "s", "y", ks=[1]).collect()[0]
    assert out["n_rel_at_k"] == 1  # id 1 wins the tie


# ---------------- ndcg_by ----------------


def _ndcg_replica(items, k, qbits=30):
    # items: list of (id, score, rel)
    wq = {r: round((1 << qbits) / math.log2(r + 1)) for r in range(1, k + 1)}
    pred = sorted(items, key=lambda t: (-t[1], t[0]))
    ideal = sorted(items, key=lambda t: (-t[2], t[0]))
    dcg = sum(t[2] * wq[i + 1] for i, t in enumerate(pred[:k]))
    idcg = sum(t[2] * wq[i + 1] for i, t in enumerate(ideal[:k]))
    return dcg, idcg, (dcg / idcg if idcg else None)


def test_ndcg_by_matches_replica(spark):
    from hdfe_spark.operators.ml import ndcg_by

    items_a = [(1, 9.0, 3), (2, 8.0, 0), (3, 7.0, 2), (4, 6.0, 3), (5, 1.0, 1)]
    items_b = [(1, 3.0, 1), (2, 2.0, 0)]
    rows = [("a", *t) for t in items_a] + [("b", *t) for t in items_b]
    df = spark.createDataFrame(rows, "q string, id long, s double, rel long")
    out = {r["q"]: r for r in ndcg_by(df, "q", "id", "s", "rel", k=3).collect()}
    for q, items in (("a", items_a), ("b", items_b)):
        dcg, idcg, nd = _ndcg_replica(items, 3)
        assert out[q]["dcg_q"] == dcg
        assert out[q]["idcg_q"] == idcg
        assert out[q]["ndcg"] == nd
    # perfect ranking -> ndcg exactly 1.0
    assert out["b"]["ndcg"] == 1.0


def test_ndcg_by_all_zero_relevance_is_null(spark):
    from hdfe_spark.operators.ml import ndcg_by

    df = spark.createDataFrame(
        [("a", 1, 2.0, 0), ("a", 2, 1.0, 0)],
        "q string, id long, s double, rel long",
    )
    r = ndcg_by(df, "q", "id", "s", "rel", k=2).collect()[0]
    assert r["dcg_q"] == 0 and r["idcg_q"] == 0 and r["ndcg"] is None


# ---------------- lift_table ----------------


def test_lift_table_hand_computed(spark):
    from hdfe_spark.operators.ml import lift_table

    # 10 rows, scores = id desc ranking; positives at top 3 + one at rank 8
    rows = [(i, float(20 - i), 1 if i in (1, 2, 3, 8) else 0)
            for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, s double, y long")
    out = lift_table(df, "id", "s", "y", n_buckets=5).collect()
    assert [r["bucket"] for r in out] == [1, 2, 3, 4, 5]
    assert [r["n"] for r in out] == [2] * 5
    assert [r["n_pos"] for r in out] == [2, 1, 0, 1, 0]
    # bucket 1: cum_lift = (2 * 10) / (2 * 4) = 2.5
    assert out[0]["cum_lift"] == 2.5
    # last bucket: cum covers everything -> lift exactly 1
    assert out[-1]["cum_lift"] == 1.0
    assert out[0]["rate"] == 1.0 and out[2]["rate"] == 0.0


# ---------------- cuped ----------------


def test_cuped_matches_replica(spark):
    from hdfe_spark.operators.stats import cuped

    import random

    rng = random.Random(7)
    rows = []
    for i in range(400):
        x = rng.uniform(0, 10)
        v = "t" if i % 2 else "c"
        lift = 0.5 if v == "t" else 0.0
        y = 2.0 * x + lift + rng.uniform(-1, 1)
        rows.append((v, round(y, 4), round(x, 4)))
    df = spark.createDataFrame(rows, "v string, y double, x double")
    out = {r["v"]: r for r in cuped(df, "v", "y", "x").collect()}
    # replica with the identical quantization
    q = lambda t: int(round(t * 1e6))  # noqa: E731
    xs = [q(x) for _, _, x in rows]
    ys = [q(y) for _, y, _ in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(a * a for a in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    mean_x = float(sx) / float(n)
    for v in ("t", "c"):
        grp = [(q(y), q(x)) for vv, y, x in rows if vv == v]
        nv = len(grp)
        my = float(sum(a for a, _ in grp)) / float(nv)
        mx = float(sum(b for _, b in grp)) / float(nv)
        assert out[v]["n"] == nv
        assert out[v]["theta"] == theta
        assert out[v]["mean"] == my * 1e-6
        assert out[v]["mean_cuped"] == (my - theta * (mx - mean_x)) * 1e-6
    # CUPED must shrink the treatment/control gap noise but keep
    # the true lift visible: both adjusted means exist and differ
    assert abs(
        (out["t"]["mean_cuped"] - out["c"]["mean_cuped"]) - 0.5
    ) < 0.25


def test_cuped_zero_variance_covariate_raises(spark):
    from hdfe_spark.operators.stats import cuped

    df = spark.createDataFrame(
        [("a", 1.0, 5.0), ("b", 2.0, 5.0)], "v string, y double, x double"
    )
    with pytest.raises(ValueError, match="zero variance"):
        cuped(df, "v", "y", "x")


# ---------------- common_neighbors ----------------


def test_common_neighbors_hand_computed(spark):
    from hdfe_spark.operators.graph import common_neighbors

    # star 1-2, 1-3, 1-4 plus edge 2-3: candidate non-edges sharing
    # >= 1 neighbor: (2,4) cn={1}, (3,4) cn={1}, (2,3) IS an edge.
    # deg: 1 -> 3, 2 -> 2, 3 -> 2, 4 -> 1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "u long, v long"
    )
    out = {
        (r["u"], r["v"]): r
        for r in common_neighbors(edges, "u", "v", k=10, min_cn=1).collect()
    }
    assert set(out) == {(2, 4), (3, 4)}
    ra1 = (1 << 30) // 3  # center 1 has degree 3
    assert out[(2, 4)]["cn"] == 1 and out[(2, 4)]["ra_q"] == ra1
    assert out[(3, 4)]["cn"] == 1 and out[(3, 4)]["ra_q"] == ra1


def test_common_neighbors_excludes_existing_edges_and_orders(spark):
    from hdfe_spark.operators.graph import common_neighbors

    # triangle + pendant: 1-2, 2-3, 1-3, 3-4. Non-edges: (1,4) via 3,
    # (2,4) via 3. Pair (1,2),(1,3),(2,3) are edges -> excluded.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long"
    )
    rows = common_neighbors(edges, "u", "v", k=10, min_cn=1).collect()
    got = [(r["u"], r["v"]) for r in rows]
    assert got == [(1, 4), (2, 4)]  # tie on (cn, ra_q) -> (u, v) order


def test_common_neighbors_min_cn_prunes(spark):
    from hdfe_spark.operators.graph import common_neighbors

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "u long, v long"
    )
    assert common_neighbors(edges, "u", "v", k=10, min_cn=2).count() == 0


# ---------------- skipgram_pairs ----------------


def test_skipgram_pairs_hand_computed(spark):
    from hdfe_spark.operators.text import skipgram_pairs

    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {
        (r["w1"], r["w2"]): r["n"]
        for r in skipgram_pairs(df, "text", window=2, min_count=1).collect()
    }
    # doc1 d=1: ab bc ca ab ; d=2: ac ba cb ; doc2 d=1: ab
    expect = {
        ("a", "b"): 3, ("b", "c"): 1, ("c", "a"): 1,
        ("a", "c"): 1, ("b", "a"): 1, ("c", "b"): 1,
    }
    assert out == expect


def test_skipgram_min_count_and_short_docs(spark):
    from hdfe_spark.operators.text import skipgram_pairs

    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a"), (3, "")], "doc_id long, text string"
    )
    out = {
        (r["w1"], r["w2"]): r["n"]
        for r in skipgram_pairs(df, "text", window=3, min_count=2).collect()
    }
    assert out == {("a", "b"): 2}


# ---------------- gopher_rules ----------------


def test_gopher_rules_metrics_hand_computed(spark):
    from hdfe_spark.operators.text import gopher_rules

    text = "The cat and dog have fun\n- bullet line\nplain ### tail..."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_rules(df, min_words=3).collect()[0]
    toks = text.lower().split()
    assert r["n_words"] == len(toks)
    assert r["mean_word_len"] == sum(len(t) for t in toks) / len(toks)
    assert r["symbol_ratio"] == (3 + 1) / len(toks)
    assert r["bullet_ratio"] == 1 / 3
    # stop hits among the gopher eight: the, and, have, with? ->
    # the, and, have = 3
    assert r["n_stop_hits"] == 3
    # alpha words: all except "###" and "-"?  "-" and "###" lack
    # letters; "tail..." has letters
    n_alpha = sum(1 for t in toks if any(c.isalpha() for c in t))
    assert r["alpha_frac"] == n_alpha / len(toks)
    assert r["passes"] is False  # symbol_ratio 4/12 > 0.1


def test_gopher_rules_pass_and_empty(spark):
    from hdfe_spark.operators.text import gopher_rules

    good = " ".join(
        ["the quick brown fox jumps over and over with great zeal of it"]
        * 5
    )
    df = spark.createDataFrame(
        [(1, good), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, min_words=50).collect()}
    assert out[1]["passes"] is True
    assert out[2]["n_words"] == 0
    assert out[2]["passes"] is False
    assert out[2]["mean_word_len"] is None


# ---------------- streaming_confusion ----------------


def test_streaming_confusion_equals_batch(spark, sf_dir, tmp_path):
    from hdfe_spark.operators.ml import confusion_stats
    from hdfe_spark.streaming.ops import (
        read_table_stream,
        streaming_confusion,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lab = lambda d: d.select(  # noqa: E731
        (F.col("event_id") % 2).cast("long").alias("y"),
        (F.col("value") > 0.5).cast("long").alias("p"),
    )
    batch = lab(ev).collect()
    stream = read_table_stream(spark, sf_dir, "events")
    out = streaming_confusion(
        lab(stream).withColumnRenamed("y", "y"), "y", "p"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_r10_conf")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_r10_conf").collect()[0]
    want = confusion_stats(
        spark.createDataFrame(batch, "y long, p long"), "y", "p"
    ).collect()[0]
    assert got.asDict() == want.asDict()


# ---------------- kruskal_wallis ----------------


def _kruskal_replica(groups):
    # groups: dict g -> list of values; average-tie ranks
    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)
    # average rank per distinct value
    from collections import Counter

    cnt = Counter(pooled)
    rank = {}
    cum = 0
    for v in sorted(cnt):
        c = cnt[v]
        rank[v] = cum + (c + 1) / 2
        cum += c
    ties = sum(c * c * c - c for c in cnt.values())
    ks = sorted(groups)
    terms = [
        (2 * sum(rank[v] for v in groups[g])) ** 2
        / (4.0 * len(groups[g]))
        for g in ks
    ]
    t = terms[0]
    for x in terms[1:]:
        t = t + x
    h = (12.0 * t) / float(n * (n + 1)) - 3.0 * float(n + 1)
    corr = 1.0 - float(ties) / float(n**3 - n)
    return h, h / corr, float(ties)


def test_kruskal_wallis_matches_replica(spark):
    from hdfe_spark.operators.stats import kruskal_wallis

    groups = {
        "a": [1.0, 2.0, 2.0, 5.0, 7.0],
        "b": [2.0, 4.0, 4.0, 9.0],
        "c": [3.0, 3.0, 6.0, 8.0, 8.0, 10.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x double")
    r = kruskal_wallis(df, "g", "x").collect()[0]
    h, h_adj, ties = _kruskal_replica(groups)
    assert r["k"] == 3 and r["n"] == 15
    assert r["tie_term"] == ties
    assert r["h"] == h
    assert r["h_adj"] == h_adj


def test_kruskal_wallis_all_tied_raises(spark):
    from hdfe_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0)], "g string, x double"
    )
    with pytest.raises(ValueError, match="tied"):
        kruskal_wallis(df, "g", "x")


# ---------------- auc_by ----------------


def test_auc_by_matches_global_auc_per_group(spark):
    from hdfe_spark.operators.stats import auc_by, auc_score

    import random

    rng = random.Random(3)
    rows = []
    for g in ("q1", "q2", "q3"):
        for _ in range(60):
            y = rng.randint(0, 1)
            # informative score with ties
            s = round(y * 0.4 + rng.uniform(0, 1), 1)
            rows.append((g, y, s))
    df = spark.createDataFrame(rows, "g string, y long, s double")
    got = {r["g"]: r for r in auc_by(df, "g", "y", "s").collect()}
    for g in ("q1", "q2", "q3"):
        sub = df.filter(F.col("g") == g).withColumn(
            "yy", F.col("y") == 1
        )
        want = auc_score(sub, "yy", "s").collect()[0]
        assert got[g]["n_pos"] == want["n_pos"]
        assert got[g]["n_neg"] == want["n_neg"]
        assert got[g]["auc"] == want["auc"], g


def test_auc_by_degenerate_group_is_null(spark):
    from hdfe_spark.operators.stats import auc_by

    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 1, 2.0), ("h", 1, 1.0), ("h", 0, 0.5)],
        "g string, y long, s double",
    )
    out = {r["g"]: r for r in auc_by(df, "g", "y", "s").collect()}
    assert out["g"]["auc"] is None  # no negatives
    assert out["h"]["auc"] == 1.0


# ---------------- cohen_kappa ----------------


def test_cohen_kappa_hand_computed(spark):
    from hdfe_spark.operators.ml import cohen_kappa

    # classic 2x2: 20 a/a, 5 a/b, 10 b/a, 15 b/b
    rows = (
        [("a", "a")] * 20 + [("a", "b")] * 5
        + [("b", "a")] * 10 + [("b", "b")] * 15
    )
    df = spark.createDataFrame(rows, "y string, p string")
    r = cohen_kappa(df, "y", "p").collect()[0]
    n, agree = 50, 35
    s = 25 * 30 + 25 * 20  # row_a*col_a + row_b*col_b
    assert (r["n"], r["agree"]) == (n, agree)
    assert r["po"] == agree / n
    assert r["pe"] == s / (n * n)
    assert r["kappa"] == (n * agree - s) / (n * n - s)


def test_cohen_kappa_single_class_is_null(spark):
    from hdfe_spark.operators.ml import cohen_kappa

    df = spark.createDataFrame([("a", "a")] * 5, "y string, p string")
    assert cohen_kappa(df, "y", "p").collect()[0]["kappa"] is None


def test_cohen_kappa_multiclass_and_disjoint_classes(spark):
    from hdfe_spark.operators.ml import cohen_kappa

    # pred class 'c' never appears as label: its margin product is 0
    df = spark.createDataFrame(
        [("a", "a"), ("b", "c"), ("b", "b"), ("a", "c")],
        "y string, p string",
    )
    r = cohen_kappa(df, "y", "p").collect()[0]
    s = 2 * 1 + 2 * 1  # row_a*col_a + row_b*col_b ; col_c unmatched
    assert r["agree"] == 2
    assert r["kappa"] == (4 * 2 - s) / (16 - s)


# ---------------- brier_score ----------------


def test_brier_score_hand_computed(spark):
    from hdfe_spark.operators.ml import brier_score

    rows = [(1, 0.9), (0, 0.2), (1, 0.5), (0, 0.0)]
    df = spark.createDataFrame(rows, "y long, p double")
    r = brier_score(df, "y", "p").collect()[0]
    q = 1 << 30
    want_q = sum(round((p - y) ** 2 * q) for y, p in rows)
    assert r["n"] == 4
    assert int(r["brier_q"]) == want_q
    assert r["brier"] == want_q / (4.0 * q)


def test_brier_score_rejects_out_of_range(spark):
    from hdfe_spark.operators.ml import brier_score

    df = spark.createDataFrame([(1, 1.5)], "y long, p double")
    with pytest.raises(Exception, match="out of"):
        brier_score(df, "y", "p").collect()


# ---------------- silhouette_fixed ----------------


def test_silhouette_fixed_hand_computed(spark):
    from hdfe_spark.operators.similarity import silhouette_fixed

    cents = [[0.0, 0.0], [10.0, 0.0]]
    rows = [
        (1, [1.0, 0.0]),   # a=1, b=9  -> s = 8/9, cluster 0
        (2, [9.0, 0.0]),   # a=1, b=9  -> s = 8/9, cluster 1
        (3, [4.0, 0.0]),   # a=4, b=6  -> s = 2/6, cluster 0
        (4, [0.0, 0.0]),   # a=0, b=10 -> s = 1.0, cluster 0
    ]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    out = {
        r["cluster"]: r
        for r in silhouette_fixed(df, "v", cents).collect()
    }
    q = 1 << 20
    s89 = round(8.0 / 9.0 * q)
    assert out[0]["n"] == 3
    assert out[0]["sil_q"] == s89 + round((2.0 / 6.0) * q) + q
    assert out[1]["n"] == 1 and out[1]["sil_q"] == s89
    assert out[1]["mean_sil"] == s89 / float(q)


def test_silhouette_tie_breaks_to_first_centroid(spark):
    from hdfe_spark.operators.similarity import silhouette_fixed

    cents = [[0.0, 0.0], [2.0, 0.0]]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "id long, v array<float>"
    )
    r = silhouette_fixed(df, "v", cents).collect()[0]
    assert r["cluster"] == 0  # equidistant -> first index
    assert r["sil_q"] == 0  # a == b -> s = 0


# ---------------- streaming_gopher ----------------


def test_streaming_gopher_equals_batch(spark, sf_dir):
    from hdfe_spark.operators.text import gopher_rules
    from hdfe_spark.streaming.ops import (
        read_table_stream,
        streaming_gopher,
    )

    batch = gopher_rules(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), min_words=3
    ).collect()
    stream = read_table_stream(spark, sf_dir, "documents")
    out = streaming_gopher(stream, min_words=3)
    q = (
        out.writeStream.format("memory")
        .queryName("t_r10_gopher")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_r10_gopher").collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(
        [tuple(r) for r in got], key=lambda t: t[0]
    ) == sorted([tuple(r) for r in batch], key=lambda t: t[0])


# ---------------- batch 3: mcc / calibration_bins / spearman_by /
# entropy_by / streaming_brier ----------------


def test_confusion_mcc_hand_computed(spark):
    from hdfe_spark.operators.ml import confusion_stats

    rows = [(1, 1)] * 6 + [(0, 1)] * 2 + [(1, 0)] * 1 + [(0, 0)] * 3
    df = spark.createDataFrame(rows, "y long, p long")
    r = confusion_stats(df, "y", "p").collect()[0]
    tp, fp, fn, tn = 6, 2, 1, 3
    num = tp * tn - fp * fn
    den = math.sqrt(
        float(tp + fp) * float(tp + fn) * float(tn + fp) * float(tn + fn)
    )
    assert r["mcc"] == num / den
    # degenerate margin -> NULL
    d2 = spark.createDataFrame([(1, 1), (1, 0)], "y long, p long")
    assert confusion_stats(d2, "y", "p").collect()[0]["mcc"] is None


def test_calibration_bins_hand_computed(spark):
    from hdfe_spark.operators.ml import calibration_bins

    rows = [(1, 0.95), (0, 0.92), (1, 1.0), (0, 0.05), (0, 0.12), (1, 0.18)]
    df = spark.createDataFrame(rows, "y long, p double")
    out = {r["bin"]: r for r in calibration_bins(df, "y", "p").collect()}
    q = 1 << 20
    # bin 9: p in {.95,.92,1.0}; bin 0: {.05}; bin 1: {.12,.18}
    assert set(out) == {0, 1, 9}
    assert out[9]["n"] == 3 and out[9]["n_pos"] == 2
    spq = round(0.95 * q) + round(0.92 * q) + round(1.0 * q)
    assert out[9]["conf"] == spq / (3.0 * q)
    assert out[9]["acc"] == 2 / 3
    assert out[9]["gap"] == abs(spq / (3.0 * q) - 2 / 3)
    assert out[0]["n_pos"] == 0 and out[1]["n_pos"] == 1


def test_calibration_bins_rejects_bad_prob(spark):
    from hdfe_spark.operators.ml import calibration_bins

    df = spark.createDataFrame([(1, -0.1)], "y long, p double")
    with pytest.raises(Exception, match="out of"):
        calibration_bins(df, "y", "p").collect()


def test_spearman_by_matches_global_per_group(spark):
    from hdfe_spark.operators.stats import spearman_by, spearman_corr

    import random

    rng = random.Random(11)
    rows = []
    for g in ("a", "b"):
        for _ in range(80):
            x = rng.randint(0, 20)
            y = x + rng.randint(-5, 5) if g == "a" else rng.randint(0, 20)
            rows.append((g, float(x), float(y)))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in spearman_by(df, "g", "x", "y").collect()}
    for g in ("a", "b"):
        want = spearman_corr(
            df.filter(F.col("g") == g), "x", "y"
        ).collect()[0]
        assert got[g]["n"] == want["n"]
        assert got[g]["rho"] == pytest.approx(want["rho"], abs=1e-12), g
    # constant column -> NULL rho
    dfc = spark.createDataFrame(
        [("c", 1.0, 2.0), ("c", 1.0, 3.0)], "g string, x double, y double"
    )
    assert spearman_by(dfc, "g", "x", "y").collect()[0]["rho"] is None


def test_entropy_by_hand_computed(spark):
    from hdfe_spark.operators.stats import entropy_by

    rows = [("s1", "en")] * 4 + [("s1", "de")] * 4 + [("s2", "en")] * 5
    df = spark.createDataFrame(rows, "src string, lang string")
    out = {r["src"]: r for r in entropy_by(df, "src", "lang").collect()}
    q = 1 << 20
    # s1: uniform over 2 -> H = ln 2; numerator 8*qln(8) - 2*4*qln(4)
    e_num = 8 * round(math.log(8) * q) - 2 * (4 * round(math.log(4) * q))
    assert out["s1"]["n"] == 8 and out["s1"]["n_distinct"] == 2
    assert out["s1"]["entropy"] == e_num / (8.0 * q)
    assert abs(out["s1"]["entropy"] - math.log(2)) < 1e-5
    # s2: single value -> exactly 0 (n*qln(n) - n*qln(n))
    assert out["s2"]["entropy"] == 0.0


def test_streaming_brier_equals_batch(spark, sf_dir):
    from hdfe_spark.operators.ml import brier_score
    from hdfe_spark.streaming.ops import (
        read_table_stream,
        streaming_brier,
    )

    lab = lambda d: d.select(  # noqa: E731
        (F.col("event_id") % 2).cast("long").alias("y"),
        F.least(
            F.greatest(F.col("value"), F.lit(0.0)), F.lit(1.0)
        ).alias("p"),
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = brier_score(lab(ev), "y", "p").collect()[0]
    stream = read_table_stream(spark, sf_dir, "events")
    out = streaming_brier(lab(stream), "y", "p")
    q = (
        out.writeStream.format("memory")
        .queryName("t_r10_brier")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_r10_brier").collect()[0]
    assert got.asDict() == want.asDict()


# ---------------- batch 4: mcnemar / cramers_v / gini_by /
# streaming_ece ----------------


def test_mcnemar_hand_computed(spark):
    from hdfe_spark.operators.stats import mcnemar_test

    # y, pa, pb: 5 both-right, 3 a-right-b-wrong, 1 a-wrong-b-right,
    # 2 both-wrong
    rows = (
        [(1, 1, 1)] * 5 + [(1, 1, 0)] * 3 + [(1, 0, 1)] * 1
        + [(1, 0, 0)] * 2
    )
    df = spark.createDataFrame(rows, "y long, pa long, pb long")
    r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
    assert (r["n"], r["b"], r["c"]) == (11, 3, 1)
    assert r["chi2"] == 4 / 4
    # no discordant pairs -> NULL
    d2 = spark.createDataFrame([(1, 1, 1)] * 3, "y long, pa long, pb long")
    assert mcnemar_test(d2, "y", "pa", "pb").collect()[0]["chi2"] is None


def test_mcnemar_rejects_out_of_domain(spark):
    from hdfe_spark.operators.stats import mcnemar_test

    df = spark.createDataFrame([(1, 2, 0)], "y long, pa long, pb long")
    with pytest.raises(Exception, match="outside"):
        mcnemar_test(df, "y", "pa", "pb").collect()


def test_cramers_v_matches_replica(spark):
    from hdfe_spark.operators.stats import cramers_v

    rows = (
        [("x", "p")] * 20 + [("x", "q")] * 5
        + [("y", "p")] * 8 + [("y", "q")] * 17
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    n = 50
    obs = {("x", "p"): 20, ("x", "q"): 5, ("y", "p"): 8, ("y", "q"): 17}
    rowm = {"x": 25, "y": 25}
    colm = {"p": 28, "q": 22}
    chi2 = 0.0
    for (aa, bb) in sorted(obs):
        exp = float(rowm[aa]) * float(colm[bb]) / float(n)
        chi2 = chi2 + (float(obs[(aa, bb)]) - exp) ** 2 / exp
    import math as _m

    assert (r["n"], r["r"], r["c"]) == (50, 2, 2)
    assert r["chi2"] == chi2
    assert r["v"] == _m.sqrt(chi2 / (50 * 1))


def test_cramers_v_constant_column_raises(spark):
    from hdfe_spark.operators.stats import cramers_v

    df = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    with pytest.raises(ValueError, match="constant"):
        cramers_v(df, "a", "b")


def test_gini_by_matches_global_per_group(spark):
    from hdfe_spark.operators.stats import gini, gini_by

    import random

    rng = random.Random(5)
    rows = [
        (g, float(rng.randint(0, 100)))
        for g in ("a", "b") for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: r for r in gini_by(df, "g", "x").collect()}
    for g in ("a", "b"):
        want = gini(df.filter(F.col("g") == g), "x").collect()[0]
        assert got[g]["n"] == want["n"]
        assert got[g]["gini"] == pytest.approx(want["gini"], abs=1e-12)


def test_gini_by_edge_cases(spark):
    from hdfe_spark.operators.stats import gini_by

    df = spark.createDataFrame(
        [("z", 0.0), ("z", 0.0), ("e", 5.0), ("e", 5.0)],
        "g string, x double",
    )
    out = {r["g"]: r for r in gini_by(df, "g", "x").collect()}
    assert out["z"]["gini"] is None  # zero total
    assert out["e"]["gini"] == 0.0  # perfect equality
    neg = spark.createDataFrame([("n", -1.0)], "g string, x double")
    with pytest.raises(Exception, match="negative"):
        gini_by(neg, "g", "x").collect()


def test_streaming_ece_equals_batch(spark, sf_dir):
    from hdfe_spark.operators.ml import calibration_bins
    from hdfe_spark.streaming.ops import read_table_stream, streaming_ece

    lab = lambda d: d.select(  # noqa: E731
        (F.col("event_id") % 2).cast("long").alias("y"),
        F.least(
            F.greatest(F.col("value"), F.lit(0.0)), F.lit(1.0)
        ).alias("p"),
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = sorted(
        [tuple(r) for r in calibration_bins(lab(ev), "y", "p").collect()]
    )
    stream = read_table_stream(spark, sf_dir, "events")
    out = streaming_ece(lab(stream), "y", "p")
    q = (
        out.writeStream.format("memory")
        .queryName("t_r10_ece")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted([tuple(r) for r in spark.table("t_r10_ece").collect()])
    assert got == want
