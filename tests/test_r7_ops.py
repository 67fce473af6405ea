"""Round-7 operator batch: one-way ANOVA, Brown-Forsythe, 2-column
PCA, per-key autocorrelation, CUSUM drift, exact weighted quantiles,
dedup representative selection, duplicated-span scrubbing, CCNet
bucketing, and the streaming anomaly counter (14th streaming form)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.dedup import select_representatives
from hdfe_spark.operators.rank import weighted_quantiles
from hdfe_spark.operators.stats import (
    anova_oneway,
    autocorr,
    brown_forsythe,
    cusum,
    pca2,
)
from hdfe_spark.operators.text import lm_score_buckets, scrub_duplicate_spans


# ------------------------------------------------------------- anova


def _f_oneway(groups):
    """scipy-free one-way ANOVA reference."""
    allv = np.concatenate(groups)
    n, k = len(allv), len(groups)
    gm = allv.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    return (ssb / (k - 1)) / (ssw / (n - k)), ssb, ssw


def test_anova_matches_reference(spark):
    rng = np.random.default_rng(3)
    groups = [
        np.round(rng.normal(10 + d, 2.0, 150), 6) for d in (0.0, 0.5, 1.5)
    ]
    rows = [
        (f"g{i}", float(v)) for i, g in enumerate(groups) for v in g
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = anova_oneway(df, "g", "v").collect()[0]
    f, ssb, ssw = _f_oneway(groups)
    assert got["k"] == 3 and got["n"] == 450
    assert got["f_stat"] == pytest.approx(f, rel=1e-9)
    assert got["ssb"] == pytest.approx(ssb, rel=1e-9)
    assert got["ssw"] == pytest.approx(ssw, rel=1e-9)


def test_anova_guards(spark):
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    with pytest.raises(ValueError, match=">= 2 groups"):
        anova_oneway(one, "g", "v")
    tiny = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "g string, v double"
    )
    with pytest.raises(ValueError, match="no within-group dof"):
        anova_oneway(tiny, "g", "v")


def test_brown_forsythe_detects_variance_difference(spark):
    rng = np.random.default_rng(4)
    a = np.round(rng.normal(0, 1.0, 300), 6)
    b = np.round(rng.normal(0, 4.0, 300), 6)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = brown_forsythe(df, "g", "v").collect()[0]
    # reference on |x - median|
    za = np.abs(a - np.median(a))
    zb = np.abs(b - np.median(b))
    f, _, _ = _f_oneway([za, zb])
    assert got["f_stat"] == pytest.approx(f, rel=1e-6)
    assert got["f_stat"] > 50  # wildly unequal variances


# -------------------------------------------------------------- pca2


def test_pca2_matches_numpy_eig(spark):
    rng = np.random.default_rng(9)
    x = np.round(rng.normal(size=500), 6)
    y = np.round(2.0 * x + rng.normal(size=500) * 0.5, 6)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    got = pca2(df, "x", "y").collect()[0]
    C = np.cov(np.stack([x, y]), ddof=1)
    evals, evecs = np.linalg.eigh(C)
    l1, l2 = evals[1], evals[0]
    v = evecs[:, 1]
    if v[0] < 0:
        v = -v
    assert got["lambda1"] == pytest.approx(l1, rel=1e-9)
    assert got["lambda2"] == pytest.approx(l2, rel=1e-9)
    assert got["var_explained"] == pytest.approx(l1 / (l1 + l2), rel=1e-9)
    assert got["v1x"] == pytest.approx(v[0], rel=1e-6)
    assert got["v1y"] == pytest.approx(v[1], rel=1e-6)


def test_pca2_axis_aligned(spark):
    # zero covariance: principal axis is the higher-variance axis
    rows = [(float(v), float(0)) for v in (-2, -1, 0, 1, 2)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = pca2(df, "x", "y").collect()[0]
    assert (got["v1x"], got["v1y"]) == (1.0, 0.0)
    assert got["lambda2"] == 0.0


# ---------------------------------------------------------- autocorr


def test_autocorr_matches_pandas(spark):
    import pandas as pd

    rng = np.random.default_rng(12)
    series = {
        "a": np.round(np.cumsum(rng.normal(size=80)), 6),
        "b": np.round(rng.normal(size=60), 6),
    }
    rows = [
        (k, i, float(v)) for k, vs in series.items() for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    got = {r["k"]: r for r in autocorr(df, "k", "o", "v", lag=1).collect()}
    for k, vs in series.items():
        s = pd.Series(vs)
        exp = s.iloc[1:].reset_index(drop=True).corr(
            s.iloc[:-1].reset_index(drop=True)
        )
        assert got[k]["n_pairs"] == len(vs) - 1
        assert got[k]["r"] == pytest.approx(exp, rel=1e-6)


def test_autocorr_lag2_and_guard(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 3)) for i in range(9)], "k string, o long, v double"
    )
    r = autocorr(df, "k", "o", "v", lag=3).collect()[0]
    assert r["r"] == pytest.approx(1.0)  # period-3 series, lag 3
    with pytest.raises(ValueError, match="lag must be >= 1"):
        autocorr(df, "k", "o", "v", lag=0)


# ------------------------------------------------------------- cusum


def test_cusum_detects_shift(spark):
    # 20 in-control points at 10, then 10 shifted to 12
    vals = [10.0] * 20 + [12.0] * 10
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, o long, v double"
    )
    got = cusum(df, "k", "o", "v", target=10.0, slack=0.5).collect()[0]
    # in-control: max(0, 0 + (10-10.5)) = 0 each step; shift: +1.5/step
    assert got["cusum"] == pytest.approx(15.0)
    assert got["n"] == 30


def test_cusum_duplicate_order_raises(spark):
    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 1, 2.0)], "k string, o long, v double"
    )
    with pytest.raises(Exception, match="duplicate order"):
        cusum(df, "k", "o", "v", target=0.0).collect()


# ------------------------------------------------- weighted_quantiles


def test_weighted_quantiles_exact(spark):
    rows = [(10.0, 1), (20.0, 2), (30.0, 3), (40.0, 4)]  # W=10
    df = spark.createDataFrame(rows, "v double, w long")
    got = {
        r["pct"]: (r["value"], r["cum_weight"])
        for r in weighted_quantiles(df, "v", "w", pcts=(10, 30, 50, 100)).collect()
    }
    # cum: 10->1, 20->3, 30->6, 40->10
    assert got[10] == (10.0, 1)   # 1*100 >= 10*10
    assert got[30] == (20.0, 3)   # 3*100 >= 300
    assert got[50] == (30.0, 6)
    assert got[100] == (40.0, 10)


def test_weighted_quantiles_float_weight_raises(spark):
    df = spark.createDataFrame([(1.0, 1.5)], "v double, w double")
    with pytest.raises(ValueError, match="integral weights"):
        weighted_quantiles(df, "v", "w")


# -------------------------------------------- select_representatives


def test_select_representatives(spark):
    rows = [
        ("c1", 1, 5), ("c1", 2, 9), ("c1", 3, 9),   # best: quality 9, id 2
        ("c2", 4, 1),
        (None, 5, 0), (None, 6, 0),                  # unclustered kept
    ]
    df = spark.createDataFrame(rows, "cluster string, doc_id long, q long")
    kept = select_representatives(
        df, "cluster", [F.desc("q"), F.asc("doc_id")]
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [2, 4, 5, 6]
    only = select_representatives(
        df, "cluster", [F.desc("q"), F.asc("doc_id")], keep_unclustered=False
    )
    assert sorted(r["doc_id"] for r in only.collect()) == [2, 4]


# ------------------------------------------- scrub_duplicate_spans


def test_scrub_duplicate_spans(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = [
        (1, f"unique one text {shared} tail one"),
        (2, f"other opening {shared} closing words two"),
        (3, "completely independent document with its own words"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_duplicate_spans(df, k=8).collect()}
    # the shared 8-gram is removed from docs 1 and 2; unique prose stays
    assert out[1]["scrubbed_text"] == "unique one text tail one"
    assert out[2]["scrubbed_text"] == "other opening closing words two"
    assert out[3]["scrubbed_text"] == docs[2][1]
    assert out[1]["n_tokens"] == 13 and out[1]["n_kept"] == 5
    assert out[3]["n_kept"] == out[3]["n_tokens"]


def test_scrub_short_docs_survive(spark):
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in scrub_duplicate_spans(df, k=8).collect()}
    # shorter than k tokens: no grams, nothing scrubbed
    assert out[1]["scrubbed_text"] == "tiny doc"
    assert out[2]["n_kept"] == 2


# ------------------------------------------------- lm_score_buckets


def test_lm_score_buckets(spark):
    docs = [
        (1, "the the the the"),          # most common tokens
        (2, "the the rare1 rare2"),
        (3, "zzz qqq xxx www"),          # all-unique junk
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_score_buckets(df, n_buckets=3).collect()}
    assert out[1]["bucket"] == 1 and out[3]["bucket"] == 3
    assert out[1]["avg_tf"] == 6.0   # 'the' appears 6x in corpus
    assert out[3]["avg_tf"] == 1.0


# ------------------------------------------------- streaming_anomaly


def test_streaming_anomaly_equals_batch(spark, tmp_path):
    """availableNow replay of the exact-integer state equals the
    batch windowed-cumsum decision rule row-for-row."""
    from hdfe_spark.streaming.ops import streaming_anomaly

    rng = np.random.default_rng(21)
    rows = []
    for key in (1, 2):
        vals = np.round(rng.normal(100, 5, 60), 3)
        vals[40] += 60  # inject an anomaly
        rows += [(key, i, float(v)) for i, v in enumerate(vals)]
    src = str(tmp_path / "anom_src")
    spark.createDataFrame(
        rows, "user_id long, event_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "user_id long, event_id long, value double"
    ).parquet(src)
    sm = streaming_anomaly(
        stream, "user_id", "event_id", "value", z=3, min_n=10, scale=1e3
    )
    name = "anom_sink"
    q = (
        sm.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["s"]["n"], r["s"]["n_anomalies"])
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n", "n_anomalies"), "n").alias("s"))
        .collect()
    }
    # batch replica: exact integer cumulative decision
    exp = {}
    for key in (1, 2):
        vs = [v for k, _, v in sorted(rows) if k == key]
        n = s = qq = na = 0
        for v in vs:
            u = int(math.floor(v * 1e3 + 0.5))
            if n >= 10 and (n * u - s) ** 2 > 9 * (n * qq - s * s):
                na += 1
            n, s, qq = n + 1, s + u, qq + u * u
        exp[key] = (n, na)
    assert got == exp
    assert all(na >= 1 for _, na in exp.values())  # injection caught


# ------------------------------------- review-pass regressions (r7)


def test_anova_null_group_excluded(spark):
    """NULL groups are excluded like SQL aggregates (and like
    brown_forsythe's median join) — not a driver TypeError from
    sorting None against str."""
    rows = (
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 5.0)]
        + [(None, 100.0)] * 5
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = anova_oneway(df, "g", "v").collect()[0]
    assert got["k"] == 2 and got["n"] == 4


def test_anova_zero_within_variance_raises(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double",
    )
    with pytest.raises(ValueError, match="zero within-group variance"):
        anova_oneway(df, "g", "v")


def test_autocorr_duplicate_order_raises(spark):
    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 1, 2.0), ("k", 2, 3.0), ("k", 3, 1.0)],
        "k string, o long, v double",
    )
    with pytest.raises(Exception, match="duplicate order"):
        autocorr(df, "k", "o", "v", lag=1).collect()


# ---------------------------------------------- isotonic / bfs (r7b)


def _pav(w, y):
    """Stack-based weighted pool-adjacent-violators reference."""
    blocks = []  # (weight, sum)
    for wi, yi in zip(w, y):
        blocks.append([wi, yi])
        while len(blocks) > 1 and (
            blocks[-2][1] / blocks[-2][0] > blocks[-1][1] / blocks[-1][0]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
    # expand back to per-input-block values
    fit = []
    cur, left = None, 0
    bi = 0
    for wi in w:
        if left == 0:
            cur = blocks[bi][1] / blocks[bi][0]
            left = blocks[bi][0]
            bi += 1
        fit.append(cur)
        left -= wi
    return fit


def test_isotonic_minimax_equals_pav(spark):
    from hdfe_spark.operators.stats import isotonic_fit

    rng = np.random.default_rng(17)
    n = 5000
    score = rng.uniform(size=n)
    # noisy, roughly increasing success probability
    label = rng.uniform(size=n) < (0.2 + 0.6 * score**2)
    df = spark.createDataFrame(
        [(i, float(s), bool(l)) for i, (s, l) in enumerate(zip(score, label))],
        "id long, score double, label boolean",
    )
    rows = isotonic_fit(df, ["score", "id"], "label", n_bins=10).collect()
    rows.sort(key=lambda r: r["tile"])
    got = [r["iso_rate"] for r in rows]
    # PAV reference over the same bins (equal-size exact deciles)
    order = np.lexsort((np.arange(n), score))
    binned = np.array_split(label[order].astype(int), 10)
    w = [len(b) for b in binned]
    s = [int(b.sum()) for b in binned]
    exp = _pav(w, s)
    assert got == pytest.approx(exp, abs=1e-12)
    # monotone nondecreasing, and mass-preserving overall
    assert all(a <= b + 1e-15 for a, b in zip(got, got[1:]))
    raw = [r["n_pos"] / r["n"] for r in rows]
    assert sum(g * r["n"] for g, r in zip(got, rows)) == pytest.approx(
        sum(ra * r["n"] for ra, r in zip(raw, rows))
    )


def test_bfs_levels_small_graph(spark):
    from hdfe_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (7, 8)],
        "u long, v long",
    )
    got = {
        r["node"]: r["level"]
        for r in bfs_levels(edges, "u", "v", source=1, max_depth=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 6: 2, 4: 3}
    # directed variant: 6 is still reached, but nothing flows back
    d = {
        r["node"]: r["level"]
        for r in bfs_levels(
            edges, "u", "v", source=2, max_depth=2, directed=True
        ).collect()
    }
    assert d == {2: 0, 3: 1, 6: 1, 4: 2}


# ------------------------------------------------- gini / cross_corr


def test_gini_known_values(spark):
    from hdfe_spark.operators.stats import gini

    # all equal -> 0
    eq = spark.createDataFrame([(5.0,)] * 8, "v double")
    assert gini(eq, "v").collect()[0]["gini"] == pytest.approx(0.0)
    # one holder of everything among n -> (n-1)/n
    n = 10
    conc = spark.createDataFrame(
        [(0.0,)] * (n - 1) + [(100.0,)], "v double"
    )
    assert gini(conc, "v").collect()[0]["gini"] == pytest.approx(
        (n - 1) / n
    )


def test_gini_matches_numpy_reference(spark):
    from hdfe_spark.operators.stats import gini

    rng = np.random.default_rng(23)
    x = np.round(rng.lognormal(0, 1.2, 4000), 6)
    df = spark.createDataFrame([(float(v),) for v in x], "v double")
    got = gini(df, "v").collect()[0]
    xs = np.sort(np.round(x * 1e6))
    i = np.arange(1, len(xs) + 1)
    exp = 2 * (i * xs).sum() / (len(xs) * xs.sum()) - (len(xs) + 1) / len(xs)
    assert got["gini"] == pytest.approx(exp, rel=1e-9)
    assert got["n"] == 4000


def test_gini_guards(spark):
    from hdfe_spark.operators.stats import gini

    neg = spark.createDataFrame([(-1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="negative"):
        gini(neg, "v")
    zero = spark.createDataFrame([(0.0,), (0.0,)], "v double")
    with pytest.raises(ValueError, match="zero total"):
        gini(zero, "v")


def test_cross_corr_matches_pandas(spark):
    import pandas as pd

    from hdfe_spark.operators.stats import cross_corr

    rng = np.random.default_rng(29)
    y = np.round(rng.normal(size=100), 6)
    x = np.round(np.roll(y, 2) * 0.8 + rng.normal(size=100) * 0.3, 6)
    rows = [("k", i, float(x[i]), float(y[i])) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, o long, x double, y double")
    got = cross_corr(df, "k", "o", "x", "y", lag=2).collect()[0]
    sx = pd.Series(x[2:])
    sy = pd.Series(y[:-2])
    assert got["n_pairs"] == 98
    assert got["r"] == pytest.approx(sx.corr(sy), rel=1e-6)
    assert got["r"] > 0.8  # the planted lead-lag relationship


def test_cross_corr_duplicate_order_raises(spark):
    from hdfe_spark.operators.stats import cross_corr

    df = spark.createDataFrame(
        [("k", 1, 1.0, 1.0), ("k", 1, 2.0, 2.0), ("k", 2, 3.0, 3.0)],
        "k string, o long, x double, y double",
    )
    with pytest.raises(Exception, match="duplicate order"):
        cross_corr(df, "k", "o", "x", "y").collect()


# --------------------------------------------------- binary source


def test_read_binary_files_roundtrip(spark, tmp_path):
    import hashlib

    from hdfe_spark.sources.tables import read_binary_files

    payloads = {1: b"hello world", 2: b"\x00\x01\xffbinary", 7: b""}
    for i, b in payloads.items():
        (tmp_path / f"{i}.bin").write_bytes(b)
    (tmp_path / "notes.txt").write_bytes(b"ignored")
    out = {
        r["file_id"]: (r["length"], bytes(r["content"]))
        for r in read_binary_files(
            spark, str(tmp_path) + "/*.bin"
        ).collect()
    }
    # zero-byte files produce NO row (Spark's binaryFile partitions
    # by bytes) — pinned here because the docstring promises it
    assert set(out) == {1, 2}
    for i in (1, 2):
        assert out[i] == (len(payloads[i]), payloads[i])


def test_read_binary_files_nonmatching_name_is_null(spark, tmp_path):
    """ANSI regression (third review pass): a matched file whose name
    has no id must yield NULL file_id, not kill the scan with a
    CAST_INVALID_INPUT (regexp_extract returns '' on no match and a
    bare cast('' as long) throws under ANSI)."""
    from hdfe_spark.sources.tables import read_binary_files

    (tmp_path / "42.bin").write_bytes(b"x")
    (tmp_path / "abc.bin").write_bytes(b"y")
    out = {
        r["file_id"]
        for r in read_binary_files(spark, str(tmp_path) + "/*.bin").collect()
    }
    assert out == {42, None}


# --------------------------------- round-8 pre-builds (no query yet)


def test_dbscan_grid_matches_brute_force(spark):
    from hdfe_spark.operators.cluster import dbscan_grid

    rng = np.random.default_rng(41)
    # two dense blobs + sparse noise, integer coordinates
    blob1 = rng.normal((0, 0), 3, size=(40, 2))
    blob2 = rng.normal((100, 100), 3, size=(40, 2))
    noise = rng.uniform(-50, 150, size=(10, 2))
    pts = np.round(np.vstack([blob1, blob2, noise])).astype(int)
    rows = [(i, int(x), int(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    eps, min_pts = 8, 5
    got = {
        r["id"]: (r["cluster"], r["is_core"])
        for r in dbscan_grid(df, "id", "x", "y", eps, min_pts).collect()
    }
    # brute force
    n = len(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    nbrs = d2 <= eps * eps
    core = {i for i in range(n) if nbrs[i].sum() >= min_pts}
    # core components (single link over core-core eps edges)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in core:
        for j in core:
            if i < j and nbrs[i][j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    exp = {}
    comp = {}
    for i in core:
        comp.setdefault(find(i), []).append(i)
    lab = {}
    for root, members in comp.items():
        m = min(members)
        for i in members:
            lab[i] = m
    for i in core:
        exp[i] = (lab[i], True)
    for i in range(n):
        if i in core:
            continue
        cands = [lab[j] for j in core if nbrs[i][j]]
        if cands:
            exp[i] = (min(cands), False)
    assert got == exp
    # the two blobs form exactly two clusters among core points
    assert len({c for c, isc in got.values() if isc}) == 2


def test_mutual_information_matches_reference(spark):
    import math as _m

    from hdfe_spark.operators.stats import mutual_information

    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 30
        + [(None, "p")] * 5 + [("x", None)] * 5   # excluded
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_information(df, "a", "b").collect()
    mi = sum(r["mi_term"] for r in out)
    # reference
    joint = {("x", "p"): 30, ("x", "q"): 10, ("y", "p"): 10, ("y", "q"): 30}
    ntot = 80
    na = {"x": 40, "y": 40}
    nb = {"p": 40, "q": 40}
    exp = sum(
        (c / ntot) * _m.log2(ntot * c / (na[a] * nb[b]))
        for (a, b), c in joint.items()
    )
    assert mi == pytest.approx(exp, rel=1e-12)
    assert all(r["n_tot"] == 80 for r in out)
    assert mi > 0.15  # strongly dependent fixture


def test_shortest_paths_matches_reference(spark):
    from hdfe_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [(1, 2, 4), (1, 3, 1), (3, 2, 1), (2, 4, 1), (3, 4, 7),
         (4, 5, 2), (9, 10, 1)],
        "u long, v long, w long",
    )
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths(
            edges, "u", "v", "w", source=1, n_iter=6
        ).collect()
    }
    # dijkstra by hand: 1->3 (1), 3->2 (2), 2->4 (3), 4->5 (5)
    assert got == {1: 0, 3: 1, 2: 2, 4: 3, 5: 5}
    # undirected variant reaches the same set symmetrically
    und = {
        r["node"]: r["dist"]
        for r in shortest_paths(
            edges, "u", "v", "w", source=5, n_iter=6, directed=False
        ).collect()
    }
    assert und[1] == 5 and und[4] == 2


def test_shortest_paths_guards(spark):
    import pytest as _pt

    from hdfe_spark.operators.graph import shortest_paths

    neg = spark.createDataFrame([(1, 2, -1)], "u long, v long, w long")
    with _pt.raises(ValueError, match="negative weights"):
        shortest_paths(neg, "u", "v", "w", source=1)
    fl = spark.createDataFrame([(1, 2, 1.5)], "u long, v long, w double")
    with _pt.raises(ValueError, match="integral weights"):
        shortest_paths(fl, "u", "v", "w", source=1)


def test_streaming_hopping_agg_equals_batch(spark, sf_dir):
    """Hopping (sliding) event-time windows — covered by the EXISTING
    streaming_windowed_agg slide parameter (a fourth-review pass
    caught a redundant reimplementation): the availableNow replay
    must equal the batch F.window(ts, win, slide) aggregation."""
    from hdfe_spark.sources.tables import load_table, ts_micros
    from hdfe_spark.streaming.ops import (
        read_events_stream,
        streaming_windowed_agg,
    )

    load_table(spark, "events", sf_dir)
    stream = read_events_stream(spark, sf_dir)
    sm = streaming_windowed_agg(
        stream, "event_type", window="2 hours", slide="1 hour",
        watermark="4 hours",
    )
    name = "hop_sink"
    q = (
        sm.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["window_end"], r["event_type"]):
            (r["count_value"], r["mean_value"])
        for r in spark.table(name).collect()
    }
    # batch replica on the same timestamp semantics (ts_micros
    # adapts to whichever physical type the fixture carries)
    from pyspark.sql import functions as FF

    evb = load_table(spark, "events", sf_dir)
    tsc = ts_micros(evb)
    batch = evb.withColumn("__t", (tsc / FF.lit(1_000_000)).cast("timestamp"))
    exp = {
        (r["window_start"], r["window_end"], r["event_type"]):
            (r["count_value"], r["mean_value"])
        for r in (
            batch.groupBy(
                FF.window(FF.col("__t"), "2 hours", "1 hour"),
                "event_type",
            )
            .agg(
                FF.count("value").alias("count_value"),
                FF.avg("value").alias("mean_value"),
            )
            .select(
                FF.col("window.start").alias("window_start"),
                FF.col("window.end").alias("window_end"),
                "event_type", "count_value", "mean_value",
            )
            .collect()
        )
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], rel=1e-9)


def test_bm25_matches_reference(spark):
    import math as _m

    from hdfe_spark.operators.text import bm25_scores

    docs = [
        (1, "spark engine spark query"),
        (2, "pandas engine"),
        (3, "cats and dogs"),
        (4, "spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score"], r["n_hit_terms"])
        for r in bm25_scores(df, ["spark", "engine"]).collect()
    }
    # reference
    toks = {i: t.split() for i, t in docs}
    N = 4
    avgdl = sum(len(v) for v in toks.values()) / N
    dfc = {"spark": 2, "engine": 2}
    k1, b = 1.2, 0.75
    exp = {}
    for i, ts in toks.items():
        s, hits = 0.0, 0
        for term in ("spark", "engine"):
            tf = ts.count(term)
            if not tf:
                continue
            hits += 1
            idf = _m.log((N - dfc[term] + 0.5) / (dfc[term] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(ts) / avgdl)
            )
        if hits:
            exp[i] = (s, hits)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][1] == exp[i][1]
        assert got[i][0] == pytest.approx(exp[i][0], rel=1e-9)
    # doc 1 (two spark hits, short) outranks the others
    assert got[1][0] == max(v[0] for v in got.values())


def test_best_split_exact(spark):
    from hdfe_spark.operators.stats import best_split

    # perfectly separable at 5: x<=5 all false, x>5 all true
    rows = [(float(x), x > 5) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    got = best_split(df, "x", "y").collect()[0]
    assert got["threshold"] == 5.0
    assert got["gain"] == pytest.approx(0.5)  # parent gini 0.5 -> 0
    assert got["p_left"] == 0.0 and got["p_right"] == 1.0
    assert got["n"] == 10


def test_best_split_matches_brute_force(spark):
    from hdfe_spark.operators.stats import best_split

    rng = np.random.default_rng(51)
    x = np.round(rng.uniform(0, 10, 500), 2)
    y = (x + rng.normal(0, 2.0, 500)) > 5
    df = spark.createDataFrame(
        [(float(a), bool(l)) for a, l in zip(x, y)], "x double, y boolean"
    )
    got = best_split(df, "x", "y").collect()[0]
    n, p = len(x), int(y.sum())
    parent = 2 * (p / n) * (1 - p / n)
    best = None
    for t in sorted(set(x)):
        m = x <= t
        nl = int(m.sum())
        if nl == 0 or nl == n:
            continue
        pl, prr = int(y[m].sum()), int(y[~m].sum())
        gl = 2 * (pl / nl) * (1 - pl / nl)
        gr = 2 * (prr / (n - nl)) * (1 - prr / (n - nl))
        gain = parent - ((nl / n) * gl + ((n - nl) / n) * gr)
        if best is None or gain > best[0] + 1e-15:
            best = (gain, t)
    assert got["threshold"] == pytest.approx(best[1])
    assert got["gain"] == pytest.approx(best[0], rel=1e-9)


def test_bm25_corpus_stats_and_query_bag(spark):
    """Fourth-review regressions: N/avgdl span token-less docs, and a
    repeated query term doubles its contribution (bag semantics)."""
    from hdfe_spark.operators.text import bm25_scores

    docs = [
        (1, "spark engine"),
        (2, "spark"),
        (3, ""),          # token-less: counts toward N, dl=0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    import math as _m

    one = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, ["spark"]).collect()}
    two = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, ["spark", "spark"]).collect()}
    assert two[1] == pytest.approx(2 * one[1])
    # N = 3 (not 2): idf = ln(1 + (3-2+0.5)/(2+0.5)), avgdl = 3/3
    k1, b = 1.2, 0.75
    idf = _m.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    exp2 = idf * 1 * (k1 + 1) / (1 + k1 * (1 - b + b * (1 / 1.0)))
    assert one[2] == pytest.approx(exp2, rel=1e-9)


def test_seasonal_decompose_recovers_planted_pattern(spark):
    from hdfe_spark.operators.stats import seasonal_decompose

    # y = 0.5*t + planted weekly-ish pattern (period 7), no noise
    period = 7
    pattern = [3.0, -1.0, 2.0, 0.0, -2.5, 1.5, -3.0]
    rows = [
        ("k", t, 0.5 * t + pattern[t % period])
        for t in range(70)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = seasonal_decompose(df, "k", "t", "v", period=period).collect()
    got = {r["t"]: r for r in out}
    # edges dropped: h=3 rows each side
    assert set(got) == set(range(3, 67))
    # the centered MA of a linear trend is exact; seasonal means
    # recover the pattern up to a constant; trend absorbs the rest
    for t, r in got.items():
        # reconstruction is exact: trend + seasonal + resid = value
        assert r["trend"] + r["seasonal"] + r["resid"] == pytest.approx(
            r["v"], abs=1e-9
        )
    # residuals of a perfectly periodic + linear series are ~0
    # (pattern mean folds between trend and seasonal)
    assert max(abs(r["resid"]) for r in got.values()) < 1e-6


def test_seasonal_decompose_guards(spark):
    from hdfe_spark.operators.stats import seasonal_decompose

    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 1, 2.0)] + [("k", i, 1.0) for i in range(2, 9)],
        "k string, t long, v double",
    )
    with pytest.raises(Exception, match="duplicate order"):
        seasonal_decompose(df, "k", "t", "v", period=3).collect()
    ok_df = spark.createDataFrame(
        [("k", i, 1.0) for i in range(9)], "k string, t long, v double"
    )
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(ok_df, "k", "t", "v", period=4)


def test_kaplan_meier_by_matches_single_curve(spark):
    from hdfe_spark.operators.stats import kaplan_meier, kaplan_meier_by

    rows = (
        [("a", 1, True), ("a", 2, False), ("a", 2, True), ("a", 3, True)]
        + [("b", 1, True), ("b", 1, True), ("b", 4, False)]
        + [(None, 9, True)]  # NULL group excluded
    )
    df = spark.createDataFrame(rows, "g string, t long, e boolean")
    strat = kaplan_meier_by(df, "g", "t", "e")
    got = {
        (r["g"], r["t"]): (r["n_risk"], r["d"], r["c"], r["s"])
        for r in strat.collect()
    }
    # each stratum equals the single-curve operator on its slice
    for g in ("a", "b"):
        single = kaplan_meier(
            df.filter(F.col("g") == g), "t", "e"
        ).collect()
        for r in single:
            assert got[(g, r["t"])] == (
                r["n_risk"], r["d"], r["c"], r["s"]
            )
    assert not any(k[0] is None for k in got)


def test_kaplan_meier_by_cell_cap(spark):
    from hdfe_spark.operators.stats import kaplan_meier_by

    df = spark.createDataFrame(
        [("g", i, True) for i in range(50)], "g string, t long, e boolean"
    )
    with pytest.raises(ValueError, match="cells exceed"):
        kaplan_meier_by(df, "g", "t", "e", max_cells=10)


def test_kaplan_meier_null_event_raises(spark):
    """Fifth-review regression: a NULL outcome must fail loud, not
    vanish from the risk set (or crash with a bare TypeError)."""
    from hdfe_spark.operators.stats import kaplan_meier, kaplan_meier_by

    df = spark.createDataFrame(
        [(1, True), (2, None), (2, True)], "t long, e boolean"
    )
    with pytest.raises(ValueError, match="NULL 'e' values"):
        kaplan_meier(df, "t", "e")
    g = spark.createDataFrame(
        [("g", 1, True), ("g", 2, None)], "g string, t long, e boolean"
    )
    with pytest.raises(ValueError, match="NULL 'e' values"):
        kaplan_meier_by(g, "g", "t", "e")


def test_kaplan_meier_by_colliding_group_name_raises(spark):
    from hdfe_spark.operators.stats import kaplan_meier_by

    df = spark.createDataFrame(
        [("x", 1, True)], "s string, t long, e boolean"
    )
    with pytest.raises(ValueError, match="collides"):
        kaplan_meier_by(df, "s", "t", "e")


def test_seasonal_decompose_null_value_raises(spark):
    """Fifth-review regression: a NULL value would silently shift
    every later row's phase — it must raise instead."""
    from hdfe_spark.operators.stats import seasonal_decompose

    rows = [("k", i, None if i == 5 else float(i % 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    with pytest.raises(ValueError, match="NULL values in the series"):
        seasonal_decompose(df, "k", "t", "v", period=3)


def test_seasonal_decompose_guard_unprunable(spark):
    """The duplicate-order check is driver-side, so selecting only
    seasonal/resid cannot prune it away (the in-plan-guard pitfall a
    review pass demonstrated)."""
    from hdfe_spark.operators.stats import seasonal_decompose

    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 1, 2.0)]
        + [("k", i, 1.0) for i in range(2, 9)],
        "k string, t long, v double",
    )
    with pytest.raises(ValueError, match="duplicate order"):
        seasonal_decompose(df, "k", "t", "v", period=3)
