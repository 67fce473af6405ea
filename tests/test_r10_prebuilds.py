"""Round-10 pre-builds: AdaBoost stumps (quantized weights),
multinomial Naive Bayes train/score (integer counts, quantized
log-probs), and integer reciprocal-rank fusion. Operators + tests
land this round; registry queries and oracles are next round's first
job (the round-8/9 pre-build convention)."""

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
