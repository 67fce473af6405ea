"""Round-10 pre-builds: AdaBoost stumps (quantized weights),
multinomial Naive Bayes train/score (integer counts, quantized
log-probs), integer reciprocal-rank fusion, entity-resolution
clustering (er_cluster), grouped deterministic HLL (hll_by), and
additive Holt-Winters (holt_winters). Operators + tests land this
round; registry queries and oracles are next round's first job (the
round-8/9 pre-build convention)."""

import math

import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.ml import adaboost_stumps, nb_score, nb_train
from hdfe_spark.operators.text import rrf_fuse


# ---------------- adaboost_stumps ----------------


def _ada_replica(xs, ys, n_rounds, wbits=16):
    """Driver replica of the identical integer-weight recursion."""
    w = [1 << wbits] * len(xs)
    out = []
    for rnd in range(1, n_rounds + 1):
        vals = sorted(set(xs))
        best = None
        for t in vals:
            ep = sum(
                wi
                for xi, yi, wi in zip(xs, ys, w)
                if (xi <= t and yi == 0) or (xi > t and yi == 1)
            )
            W = sum(w)
            em = W - ep
            for err, pol in sorted(((ep, 1), (em, -1)), key=lambda p: (p[0], -p[1])):
                cand = (err, t, -pol)
                if best is None or cand < best:
                    best = cand
        err, t, negpol = best
        pol = -negpol
        W = sum(w)
        alpha = 0.5 * math.log((W - err) / err)
        out.append((rnd, t, pol, err, W, alpha))
        f_ok, f_bad = math.exp(-alpha), math.exp(alpha)
        neww = []
        for xi, yi, wi in zip(xs, ys, w):
            pred_pos = (xi <= t) if pol == 1 else (xi > t)
            ok = pred_pos == (yi == 1)
            neww.append(math.floor(wi * (f_ok if ok else f_bad) + 0.5))
        w = neww
    return out


def test_adaboost_matches_replica(spark):
    # noisy threshold signal: y = [x >= 5] with two flipped rows
    xs = list(range(10)) * 3
    ys = [1 if x >= 5 else 0 for x in xs]
    ys[2] = 1  # x=2 flipped positive
    ys[17] = 0  # x=7 flipped negative
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    got = adaboost_stumps(df, "x", "y", n_rounds=3).collect()
    exp = _ada_replica(xs, ys, 3)
    assert len(got) == 3
    for g, (rnd, t, pol, err, W, alpha) in zip(got, exp):
        assert (g["round"], g["threshold"], g["polarity"]) == (rnd, t, pol)
        assert (g["err_q"], g["w_total_q"]) == (err, W)
        assert g["alpha"] == pytest.approx(alpha, abs=0)


def test_adaboost_perfect_split_raises(spark):
    df = spark.createDataFrame(
        [(x, 1 if x >= 5 else 0) for x in range(10)], "x long, y long"
    )
    with pytest.raises(ValueError, match="separates the labels"):
        adaboost_stumps(df, "x", "y", n_rounds=2)


def test_adaboost_guards(spark):
    df = spark.createDataFrame([(1.0, 0.5)], "x double, y double")
    with pytest.raises(ValueError, match="integral/boolean"):
        adaboost_stumps(df, "x", "y")
    df2 = spark.createDataFrame([(1, 2), (2, 0)], "x long, y long")
    with pytest.raises(ValueError, match="outside"):
        adaboost_stumps(df2, "x", "y", n_rounds=1)


# ---------------- nb_train / nb_score ----------------


def test_nb_train_counts(spark):
    rows = [("en", "the"), ("en", "the"), ("en", "cat"),
            ("fr", "le"), ("fr", "chat"), ("fr", "le")]
    model = nb_train(
        spark.createDataFrame(rows, "c string, t string"), "c", "t"
    ).collect()
    got = {(r["class"], r["token"]): (r["n"], r["n_class"]) for r in model}
    assert got == {
        ("en", "the"): (2, 3),
        ("en", "cat"): (1, 3),
        ("fr", "le"): (2, 3),
        ("fr", "chat"): (1, 3),
    }


def test_nb_score_argmax_and_quantization(spark):
    train = [("en", t) for t in ["the", "the", "cat", "dog"]] + [
        ("fr", t) for t in ["le", "le", "chat", "chien"]
    ]
    model = nb_train(
        spark.createDataFrame(train, "c string, t string"), "c", "t"
    )
    docs = [(1, "the"), (1, "cat"), (2, "le"), (2, "chien"), (3, "zzz")]
    toks = spark.createDataFrame(docs, "d long, t string")
    V = 100
    out = {
        r["doc"]: r
        for r in nb_score(toks, model, "d", "t", vocab_size=V).collect()
    }

    def ql(n, nc):
        return math.floor(math.log((n + 1) / (nc + V)) * (1 << 20))

    # doc 1: en = ql(2)+ql(1), fr = miss+miss
    assert out[1]["pred_class"] == "en"
    assert out[1]["score_q"] == ql(2, 4) + ql(1, 4)
    assert out[1]["n_tokens"] == 2
    assert out[2]["pred_class"] == "fr"
    assert out[2]["score_q"] == ql(2, 4) + ql(1, 4)
    # doc 3: unseen token everywhere -> same miss score in both
    # classes -> tie broken by class ASC
    assert out[3]["pred_class"] == "en"
    assert out[3]["score_q"] == ql(0, 4)


def test_nb_score_guards(spark):
    model = nb_train(
        spark.createDataFrame([("a", "x")], "c string, t string"), "c", "t"
    )
    toks = spark.createDataFrame([(1, "x")], "d long, t string")
    with pytest.raises(ValueError, match="vocab_size"):
        nb_score(toks, model, "d", "t", vocab_size=0)
    with pytest.raises(ValueError, match="more than"):
        nb_score(toks, model, "d", "t", vocab_size=10, max_classes=0)


# ---------------- rrf_fuse ----------------


def test_rrf_fuse_integer_scores(spark):
    rows = [
        ("a", "bm25", 1), ("b", "bm25", 2), ("c", "bm25", 3),
        ("b", "dense", 1), ("a", "dense", 2), ("d", "dense", 3),
    ]
    out = rrf_fuse(
        spark.createDataFrame(rows, "id string, src string, rank long"),
        "id", "src", "rank", k0=60, k=10,
    ).collect()
    two32 = 1 << 32

    def c(r):
        return two32 // (60 + r)

    exp = {
        "a": (c(1) + c(2), 2),
        "b": (c(2) + c(1), 2),
        "c": (c(3), 1),
        "d": (c(3), 1),
    }
    got = {r["id"]: (r["rrf_q"], r["n_sources"]) for r in out}
    assert got == exp
    # a and b tie exactly (integer scores) -> id ASC; c/d tie -> c first
    order = [r["id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == ["a", "b", "c", "d"]


def test_rrf_fuse_rejects_bad_rank(spark):
    df = spark.createDataFrame(
        [("a", "s", 0)], "id string, src string, rank long"
    )
    with pytest.raises(Exception, match="rank must be >= 1"):
        rrf_fuse(df, "id", "src", "rank").collect()


def test_rrf_fuse_topk_cut(spark):
    rows = [(f"d{i}", "s", i + 1) for i in range(5)]
    out = rrf_fuse(
        spark.createDataFrame(rows, "id string, src string, rank long"),
        "id", "src", "rank", k=2,
    ).collect()
    assert [r["id"] for r in out] == ["d0", "d1"]
    assert [r["rank"] for r in out] == [1, 2]


# ---------------- er_cluster ----------------


def test_er_cluster_synthetic(spark):
    from hdfe_spark.operators.fuzzy import er_cluster

    rows = [
        (1, "martin"),
        (2, "artin"),      # d=1 from martin
        (3, "martln"),     # d=1 from martin
        (7, "mrtln"),      # d=1 from martln only -> same cluster via CC
        (6, "zzzzzz"),     # singleton
        (None, "martin"),  # NULL id: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in er_cluster(df).collect()}
    assert set(out) == {1, 2, 3, 6, 7}
    for i in (1, 2, 3, 7):
        assert out[i]["er_id"] == 1
        assert out[i]["cluster_size"] == 4
        assert out[i]["is_rep"] == (i == 1)
    assert out[6]["er_id"] == 6
    assert out[6]["cluster_size"] == 1
    assert out[6]["is_rep"] is True


def test_er_cluster_matches_brute_force_union_find(spark, sf_dir):
    from hdfe_spark.operators.fuzzy import er_cluster

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["er_id"], r["cluster_size"], r["is_rep"])
        for r in er_cluster(docs).collect()
    }
    # brute-force pairs on normalized prefixes (the fuzzy_pairs
    # exactness test's replica), then a driver union-find
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
        1,
        16,
    )
    k = docs.select(F.col("doc_id").alias("id"), norm.alias("s")).filter(
        F.length("s") >= 1
    )
    a, b = k.alias("a"), k.alias("b")
    pairs = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(F.levenshtein(F.col("a.s"), F.col("b.s")) <= 1)
        .select(F.col("a.id").alias("u"), F.col("b.id").alias("v"))
        .collect()
    )
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ru, rv = find(r["u"]), find(r["v"])
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    from collections import Counter

    root = {i: find(i) for i in ids}
    size = Counter(root.values())
    want = {
        i: (root[i], size[root[i]], root[i] == i) for i in ids
    }
    assert got == want
    # the fixture must actually exercise a multi-row cluster
    assert any(sz > 1 for _, sz, _ in got.values())


# ---------------- hll_by ----------------


def test_hll_by_equals_global_per_group(spark):
    from hdfe_spark.operators.sketch import hll_by, hll_distinct

    rows = [(g, f"u{g}_{i % (50 * (g + 1))}") for g in range(3)
            for i in range(400)]
    rows += [(None, f"x{i}") for i in range(30)]   # NULL group: a group
    rows += [(0, None)] * 5                        # NULL keys: filtered
    df = spark.createDataFrame(rows, "g int, k string")
    got = {r["g"]: r for r in hll_by(df, "g", "k", b=8).collect()}
    assert set(got) == {0, 1, 2, None}
    for g in [0, 1, 2, None]:
        cond = F.col("g").isNull() if g is None else (F.col("g") == g)
        solo = hll_distinct(df.filter(cond), "k", b=8).collect()[0]
        row = got[g]
        for c in ("m", "n_exact", "n_empty", "s33", "est", "rel_err"):
            assert row[c] == solo[c], (g, c)


def test_hll_by_absent_groups_and_empty(spark):
    from hdfe_spark.operators.sketch import hll_by

    df = spark.createDataFrame(
        [(1, None), (2, "a")], "g int, k string"
    )
    out = {r["g"]: r for r in hll_by(df, "g", "k").collect()}
    assert set(out) == {2}  # group 1 has only NULL keys -> absent
    assert out[2]["n_exact"] == 1
    assert hll_by(df.filter("g < 0"), "g", "k").count() == 0
    with pytest.raises(ValueError):
        hll_by(df, "g", "k", b=7)


# ---------------- holt_winters ----------------


def _hw_replica(vs, m, a, g, d):
    acc = 0.0
    for v in vs[:m]:
        acc = acc + v
    l = acc / m
    acc2 = 0.0
    for v in vs[m:2 * m]:
        acc2 = acc2 + v
    b = (acc2 / m - acc / m) / m
    s = [v - l for v in vs[:m]]
    for x in vs[m:]:
        sh = s[0]
        ln = a * (x - sh) + (1 - a) * (l + b)
        bn = g * (ln - l) + (1 - g) * b
        sn = d * (x - ln) + (1 - d) * sh
        s = s[1:] + [sn]
        l, b = ln, bn
    return l, b, s[0]


def test_holt_winters_matches_replica_bit_exact(spark):
    from hdfe_spark.operators.stats import holt_winters

    import random

    random.seed(23)
    m = 4
    rows = []
    for k in range(5):
        n = random.choice([8, 9, 20, 41])
        for t in range(n):
            base = 10 + 0.5 * t + [3, -1, -4, 2][t % m]
            rows.append((k, t, round(base + random.uniform(-1, 1), 3)))
    df = spark.createDataFrame(rows, "k int, o int, v double")
    out = {
        r["k"]: r
        for r in holt_winters(
            df, "k", "o", "v", period=m, alpha=0.3, gamma=0.15, delta=0.2
        ).collect()
    }
    import collections

    series = collections.defaultdict(list)
    for k, t, v in rows:
        series[k].append((t, v))
    for k, sr in series.items():
        vs = [v for _, v in sorted(sr)]
        l, b, s0 = _hw_replica(vs, m, 0.3, 0.15, 0.2)
        r = out[k]
        # bit-exact: the fold replays the identical IEEE sequence
        assert r["level"] == l and r["trend"] == b and r["season"] == s0
        assert r["forecast"] == l + b + s0 and r["n"] == len(vs)


def test_holt_winters_drops_short_keys_and_boundary(spark):
    from hdfe_spark.operators.stats import holt_winters

    m = 3
    rows = [(1, t, float(t)) for t in range(2 * m - 1)]   # n = 5 < 6
    rows += [(2, t, float(t % m)) for t in range(2 * m)]  # n = 6: kept
    df = spark.createDataFrame(rows, "k int, o int, v double")
    out = holt_winters(df, "k", "o", "v", m, 0.5, 0.5, 0.5).collect()
    assert [r["k"] for r in out] == [2]
    vs = [float(t % m) for t in range(2 * m)]
    l, b, s0 = _hw_replica(vs, m, 0.5, 0.5, 0.5)
    r = out[0]
    assert r["level"] == l and r["trend"] == b and r["season"] == s0


def test_holt_winters_guards(spark):
    from hdfe_spark.operators.stats import holt_winters

    ok = [(1, t, float(t)) for t in range(8)]
    df = spark.createDataFrame(ok, "k int, o int, v double")
    with pytest.raises(ValueError, match="period"):
        holt_winters(df, "k", "o", "v", 1, 0.5, 0.5, 0.5)
    with pytest.raises(ValueError, match="alpha"):
        holt_winters(df, "k", "o", "v", 4, 1.0, 0.5, 0.5)
    with pytest.raises(ValueError, match="delta"):
        holt_winters(df, "k", "o", "v", 4, 0.5, 0.5, 0.0)
    dup = spark.createDataFrame(
        ok + [(1, 3, 9.9)], "k int, o int, v double"
    )
    with pytest.raises(Exception, match="duplicate order"):
        holt_winters(dup, "k", "o", "v", 4, 0.5, 0.5, 0.5).collect()


def test_holt_winters_single_fold_evaluation(spark):
    from hdfe_spark.operators.stats import holt_winters

    df = spark.createDataFrame(
        [("k", i, float(i * i % 7)) for i in range(1, 10)],
        "g string, o int, v double",
    )
    out = holt_winters(df, "g", "o", "v", 4, 0.5, 0.3, 0.2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the O(series)-step main fold (its s-ring rebuild is the only
    # concat(slice(...)) in the tree) must appear exactly once —
    # CollapseProject must NOT re-inline it into level/trend/season/
    # forecast (the measured 4x holt lesson, SPARK-35410); and the
    # three lambda folds (init mean x2 + main) must not multiply
    assert plan.count("concat(slice(") == 1, plan
    assert plan.count("aggregate(") == 3, plan


# ---------------- url_normalize / url_dedup ----------------


def test_url_normalize_steps(spark):
    from hdfe_spark.operators.dedup import url_normalize

    cases = [
        # scheme+host case, default port, trailing slash
        ("HTTP://ExAmple.COM:80/A/B/", "http://example.com/A/B"),
        # https default port, fragment stripped, root path kept
        ("https://h.io:443/#top", "https://h.io/"),
        # non-default port kept; empty path -> /
        ("http://h.io:8080", "http://h.io:8080/"),
        # tracking params dropped, rest sorted, ? dropped when empty
        ("http://h.io/p?utm_source=x&gclid=1&fbclid=2", "http://h.io/p"),
        ("http://h.io/p?b=2&a=1&utm_c=z", "http://h.io/p?a=1&b=2"),
        # ? inside fragment is NOT a query
        ("http://h.io/p#frag?x=1", "http://h.io/p"),
        # path case preserved; query value case preserved
        ("http://H.io/CaSe?K=V", "http://h.io/CaSe?K=V"),
        # non-URL passes through trimmed
        ("  not a url  ", "not a url"),
        ("relative/path?utm_source=x", "relative/path?utm_source=x"),
        # double slash collapses only the LAST trailing one
        ("http://h.io/a//", "http://h.io/a/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [
        r["c"]
        for r in df.select(url_normalize(F.col("u")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]
    www = (
        spark.createDataFrame([("http://www.h.io/p",)], "u string")
        .select(url_normalize(F.col("u"), strip_www=True).alias("c"))
        .collect()[0]["c"]
    )
    assert www == "http://h.io/p"


def test_url_dedup_groups_and_reps(spark):
    from hdfe_spark.operators.dedup import url_dedup

    rows = [
        (1, "http://A.io/x?b=2&a=1"),
        (2, "http://a.io:80/x/?a=1&b=2&utm_source=t"),
        (3, "http://a.io/x#f"),     # no query -> different canon
        (4, None),                  # NULL url: singleton, kept
        (None, "http://a.io/x"),    # NULL id: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["canonical_url"] == "http://a.io/x?a=1&b=2"
    assert out[1]["canonical_url"] == out[2]["canonical_url"]
    assert out[1]["n_dups"] == 2 and out[2]["n_dups"] == 2
    assert out[1]["is_rep"] is True and out[2]["is_rep"] is False
    assert out[3]["canonical_url"] == "http://a.io/x"
    assert out[3]["n_dups"] == 1 and out[3]["is_rep"] is True
    assert out[4]["canonical_url"] is None
    assert out[4]["n_dups"] == 1 and out[4]["is_rep"] is True


# ---------------- event_ngrams ----------------


def test_event_ngrams_k2_equals_transitions(spark):
    from hdfe_spark.operators.sessions import event_ngrams, event_transitions

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "b"), (2, 2, "a"), (2, 3, "b"),
        (3, 1, "a"),
    ]
    df = spark.createDataFrame(rows, "e long, o long, s string")
    tr = {
        (r["src"], r["dst"]): r["n"]
        for r in event_transitions(df, "e", "o", "s").collect()
    }
    ng = {
        (r["s1"], r["s2"]): r["n"]
        for r in event_ngrams(df, "e", "o", "s", k=2).collect()
    }
    assert ng == tr


def test_event_ngrams_trigrams_and_min_count(spark):
    from hdfe_spark.operators.sessions import event_ngrams

    rows = [(1, t, s) for t, s in enumerate("abcabcab")]
    rows += [(2, t, s) for t, s in enumerate("abc")]
    df = spark.createDataFrame(rows, "e long, o long, s string")
    got = {
        (r["s1"], r["s2"], r["s3"]): r["n"]
        for r in event_ngrams(df, "e", "o", "s", k=3).collect()
    }
    # entity 1 "abcabcab": abc x2, bca x2, cab x2; entity 2: abc x1
    assert got == {
        ("a", "b", "c"): 3,
        ("b", "c", "a"): 2,
        ("c", "a", "b"): 2,
    }
    pruned = {
        (r["s1"], r["s2"], r["s3"]): r["n"]
        for r in event_ngrams(df, "e", "o", "s", k=3, min_count=3).collect()
    }
    assert pruned == {("a", "b", "c"): 3}


def test_event_ngrams_guards(spark):
    import pytest

    from hdfe_spark.operators.sessions import event_ngrams

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 1, "b"), (1, 2, "c")], "e long, o long, s string"
    )
    with pytest.raises(ValueError, match="k must be"):
        event_ngrams(df, "e", "o", "s", k=1)
    with pytest.raises(Exception, match="duplicate order"):
        event_ngrams(df, "e", "o", "s", k=2).collect()
    # NULL states are excluded: the stream for entity 1 is a,c ->
    # the (a, c) bigram IS adjacent-after-filter (documented)
    df2 = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, None), (1, 3, "c")], "e long, o long, s string"
    )
    got = {
        (r["s1"], r["s2"]): r["n"]
        for r in event_ngrams(df2, "e", "o", "s", k=2).collect()
    }
    assert got == {("a", "c"): 1}


# ---------------- rake_keywords ----------------


def test_rake_matches_hand_computation(spark):
    from hdfe_spark.operators.text import rake_keywords

    # classic RAKE example shape: stopwords split phrases
    docs = [
        ("deep learning models, and deep nets",),
        ("the learning rate",),
    ]
    df = spark.createDataFrame(docs, "text string")
    out = {
        r["word"]: (r["freq"], r["deg"], r["score"])
        for r in rake_keywords(df, "text").collect()
    }
    # phrases: [deep learning models] [deep nets] [learning rate]
    # ("and"/"the" are stopwords; "," splits)
    assert out["deep"] == (2, 5, 2.5)          # 3 + 2
    assert out["learning"] == (2, 5, 2.5)      # 3 + 2
    assert out["models"] == (1, 3, 3.0)
    assert out["nets"] == (1, 2, 2.0)
    assert out["rate"] == (1, 2, 2.0)
    assert "and" not in out and "the" not in out
    # min_freq prunes exactly
    from hdfe_spark.operators.text import rake_keywords as rk

    pruned = {r["word"] for r in rk(df, "text", min_freq=2).collect()}
    assert pruned == {"deep", "learning"}


def test_rake_guards_and_nulls(spark):
    import pytest

    from hdfe_spark.operators.text import rake_keywords

    df = spark.createDataFrame([(None,), ("the and of",)], "text string")
    assert rake_keywords(df, "text").count() == 0  # all stop/NULL
    with pytest.raises(ValueError, match="min_freq"):
        rake_keywords(df, "text", min_freq=0)
    with pytest.raises(ValueError, match="stopword"):
        rake_keywords(df, "text", stopwords=[])


# ---------------- collapse_rare_levels ----------------


def test_collapse_rare_levels(spark):
    from hdfe_spark.operators.encoding import collapse_rare_levels

    rows = [("a",)] * 5 + [("b",)] * 2 + [("c",)] * 1 + [(None,)] * 2
    df = spark.createDataFrame(rows, "lvl string")
    out = collapse_rare_levels(df, "lvl", min_count=2).collect()
    got = {}
    for r in out:
        got[r["lvl"]] = got.get(r["lvl"], 0) + 1
    assert got == {"a": 5, "b": 2, "__other__": 1, None: 2}
    # numeric column -> string output, new column name honored
    df2 = spark.createDataFrame([(1,), (1,), (9,)], "k int")
    out2 = collapse_rare_levels(df2, "k", 2, out_col="kc")
    assert dict(out2.groupBy("kc").count().collect()) == {
        "1": 2, "__other__": 1,
    }
    assert [f.name for f in out2.schema if f.name == "kc"]
    import pytest

    with pytest.raises(ValueError, match="min_count"):
        collapse_rare_levels(df, "lvl", 0)


# ---------------- mst_boruvka ----------------


def _kruskal(n_nodes, edges):
    """Unique-MST replica under the (w, min, max) total order."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    picked = []
    for w, u, v in sorted((w, min(u, v), max(u, v)) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            picked.append((u, v, w))
    return set(picked)


def test_mst_matches_kruskal(spark):
    from hdfe_spark.operators.graph import mst_boruvka

    import random

    random.seed(31)
    n = 40
    edges = set()
    while len(edges) < 120:
        u, v = random.randrange(n), random.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    rows = [(u, v, random.randint(1, 50)) for u, v in sorted(edges)]
    df = spark.createDataFrame(rows, "u long, v long, w long")
    got = {
        (r["u"], r["v"], r["w"])
        for r in mst_boruvka(df, "u", "v", "w", n_rounds=8).collect()
    }
    want = _kruskal(n, rows)
    assert got == want


def test_mst_chain_merge_graph(spark):
    """Review regression: a monotone-weight path makes phase 1 pick
    EVERY edge, so the contraction graph is one long chain — the
    old min-label-CC contraction exceeded max_iter=50 and raised;
    pointer doubling handles it in O(log n) rounds."""
    from hdfe_spark.operators.graph import mst_boruvka

    n = 200
    path = spark.createDataFrame(
        [(i, i + 1, 100 + i) for i in range(n - 1)],
        "u long, v long, w long",
    )
    got = {
        (r["u"], r["v"]) for r in mst_boruvka(path, n_rounds=1).collect()
    }
    assert got == {(i, i + 1) for i in range(n - 1)}
    # NULL-weight edges are excluded, never argmin winners
    withnull = spark.createDataFrame(
        [(0, 1, 5), (1, 2, None), (0, 2, 7)], "u long, v long, w long"
    )
    got2 = {
        (r["u"], r["v"], r["w"])
        for r in mst_boruvka(withnull, n_rounds=2).collect()
    }
    assert got2 == {(0, 1, 5), (0, 2, 7)}


def test_mst_partial_and_guards(spark):
    import pytest

    from hdfe_spark.operators.graph import mst_boruvka

    # triangle with distinct weights: one round completes the MST
    tri = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (0, 2, 3)], "u long, v long, w long"
    )
    got = {
        (r["u"], r["v"], r["w"])
        for r in mst_boruvka(tri, n_rounds=1).collect()
    }
    assert got == {(0, 1, 1), (1, 2, 2)}
    # non-monotone path weights: one phase leaves a genuine GAP, so
    # the partial-forest contract (subset of the unique MST, never a
    # wrong edge) is actually exercised (a monotone path completes
    # in one phase — the earlier version of this test was vacuous)
    zig = [(0, 1, 1), (1, 2, 9), (2, 3, 2), (3, 4, 8), (4, 5, 3)]
    path = spark.createDataFrame(zig, "u long, v long, w long")
    full = {
        (r["u"], r["v"]) for r in mst_boruvka(path, n_rounds=3).collect()
    }
    assert full == {(i, i + 1) for i in range(5)}
    part = {
        (r["u"], r["v"]) for r in mst_boruvka(path, n_rounds=1).collect()
    }
    # phase 1 picks exactly {(0,1), (2,3), (4,5)} — the heavy
    # (1,2) and (3,4) edges are nobody's minimum: two real gaps
    assert part == {(0, 1), (2, 3), (4, 5)}
    assert part < full
    with pytest.raises(ValueError, match="integral"):
        mst_boruvka(
            spark.createDataFrame([(0, 1, 1.5)], "u long, v long, w double")
        )
    # ties broken by (w, min, max): parallel-free square, all w=7 —
    # unique MST under the total order is the Kruskal replica's
    sq = spark.createDataFrame(
        [(0, 1, 7), (1, 2, 7), (2, 3, 7), (0, 3, 7)],
        "u long, v long, w long",
    )
    got_sq = {
        (r["u"], r["v"], r["w"])
        for r in mst_boruvka(sq, n_rounds=4).collect()
    }
    assert got_sq == _kruskal(4, [(0, 1, 7), (1, 2, 7), (2, 3, 7), (0, 3, 7)])


# ---------------- weighted_sample_by ----------------


def test_weighted_sample_by_equals_global_per_group(spark):
    from hdfe_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_by,
    )

    rows = [
        (g, i * 7 + g, float(1 + (i % 5)))
        for g in range(3)
        for i in range(40)
    ]
    rows += [(None, 999, 2.0), (None, 998, 0.5)]
    rows += [(0, 500, 0.0), (0, 501, -1.0)]  # non-positive: excluded
    df = spark.createDataFrame(rows, "g int, doc_id long, w double")
    got = weighted_sample_by(df, "g", "w", k=5).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], set()).add(r["doc_id"])
    # per group, the grouped sample equals the global sampler run on
    # that group alone (identical key construction)
    for g in [0, 1, 2, None]:
        cond = "g is null" if g is None else f"g = {g}"
        solo = {
            r["doc_id"]
            for r in weighted_sample(
                df.filter(cond), "w", k=5
            ).collect()
        }
        assert by_g[g] == solo, g
        assert len(by_g[g]) == (2 if g is None else 5)
    # NULL group has only 2 positive-weight rows -> both returned
    assert by_g[None] == {999, 998}
    assert 500 not in by_g[0] and 501 not in by_g[0]
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        weighted_sample_by(df, "g", "w", k=0)
