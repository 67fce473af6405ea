"""Property-based tests (hypothesis): invariants that must hold for
ANY input, not just the fixtures — the upgrade to the reference's
seeded-fixture-only strategy (SURVEY.md §5). Spark actions are slow,
so examples are capped and each property batches one round trip.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def panel(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    keys = draw(
        st.lists(st.integers(min_value=0, max_value=5), min_size=n, max_size=n)
    )
    vals = draw(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {"k": keys, "t": np.arange(n, dtype=np.int64), "v": vals}
    )


@SLOW
@given(pdf=panel())
def test_demean_group_means_vanish(spark, pdf):
    from hdfe_spark.operators.groupby import demean

    df = spark.createDataFrame(pdf)
    out = demean(df, keys="k", cols=["v"]).toPandas()
    # property: demeaned values average to ~0 within every group
    grp = out.groupby("k")["v_dm"].mean()
    scale = max(pdf["v"].abs().max(), 1.0)
    np.testing.assert_allclose(grp.values, 0.0, atol=1e-9 * scale)
    assert len(out) == len(pdf)


@SLOW
@given(pdf=panel(), lag=st.integers(min_value=1, max_value=3))
def test_lag_matches_pandas_shift(spark, pdf, lag):
    from hdfe_spark.operators.lags import make_lags

    df = spark.createDataFrame(pdf)
    got_df, names = make_lags(
        df, n_lags_back=lag, n_lags_forward=0,
        outcomes="v", groupby="k", order_by="t",
    )
    col = f"v_lag_{lag}"
    got = (
        got_df.select("k", "t", col).toPandas()
        .sort_values(["k", "t"]).reset_index(drop=True)
    )
    want = (
        pdf.sort_values(["k", "t"])
        .assign(w=lambda d: d.groupby("k")["v"].shift(lag))
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got[col].to_numpy(dtype=float),
        want["w"].to_numpy(dtype=float),
        rtol=1e-12,
        equal_nan=True,
    )
    # reference naming contract: one column per lag in 1..n_lags_back
    assert names["v"] == [f"v_lag_{i}" for i in range(1, lag + 1)]


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Nd"), max_codepoint=0x2FF
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_exact_dedup_properties(spark, texts):
    from hdfe_spark.operators.dedup import exact_dedup_by_hash

    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    df = spark.createDataFrame(pdf)
    out = exact_dedup_by_hash(df).toPandas()
    # survivors = one per distinct text, the min-id representative
    want = pdf.groupby("text", sort=False)["doc_id"].min()
    assert sorted(out["doc_id"]) == sorted(want.values)
    assert out["text"].is_unique


@SLOW
@given(
    keys=st.lists(
        st.integers(min_value=-3, max_value=3), min_size=1, max_size=40
    )
)
def test_factorize_is_dense_rank(spark, keys):
    from hdfe_spark.operators.encoding import factorize

    pdf = pd.DataFrame({"k": keys})
    df = spark.createDataFrame(pdf)
    out = factorize(df, "k").toPandas()
    # codes are 0..n_distinct-1, order-isomorphic to the key order
    codes = out.drop_duplicates("k").sort_values("k")["k_code"].to_numpy()
    assert list(codes) == list(range(len(codes)))
    # same key always maps to the same code
    assert out.groupby("k")["k_code"].nunique().max() == 1


# ------------------------------------------------------ codec roundtrips
# Pure-numpy, no Spark session → cheap enough for many examples.

FAST = settings(max_examples=50, deadline=None)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@FAST
def test_ppm_roundtrip_any_dims(w, h, seed):
    from hdfe_spark.operators.multimodal import decode_ppm, encode_ppm

    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    got_w, got_h, got = decode_ppm(encode_ppm(w, h, px))
    assert (got_w, got_h) == (w, h)
    np.testing.assert_array_equal(got, px)


@given(
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    n=st.integers(min_value=0, max_value=500),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@FAST
def test_wav_roundtrip_any_samples(rate, n, seed):
    from hdfe_spark.operators.multimodal import decode_wav, encode_wav

    s = (
        np.random.RandomState(seed)
        .randint(-32768, 32768, size=n)
        .astype(np.int16)
    )
    got_rate, ch, bits, got = decode_wav(encode_wav(rate, s))
    assert (got_rate, ch, bits) == (rate, 1, 16)
    np.testing.assert_array_equal(got, s)


@given(data=st.binary(min_size=0, max_size=200))
@FAST
def test_codec_parsers_reject_or_raise_never_crash(data):
    """Arbitrary bytes must raise ValueError (or parse legitimately) —
    never segfault, hang, or raise an unexpected type. This is the
    decode_media 'corrupt asset must not kill the scan' contract."""
    from struct import error as struct_error

    from hdfe_spark.operators.multimodal import decode_ppm, decode_wav

    for parser in (decode_ppm, decode_wav):
        try:
            parser(data)
        except (ValueError, IndexError, struct_error):
            # exactly the set decode_media catches per-row
            pass


def test_truncated_fmt_chunk_is_flagged_not_fatal(spark):
    """A RIFF header whose fmt chunk is shorter than 16 bytes raises
    struct.error in the parser; decode_media must absorb it."""
    from hdfe_spark.operators.multimodal import ASSET_SCHEMA, decode_media

    bad = b"RIFF\x24\x00\x00\x00WAVEfmt \x02\x00\x00\x00XX"
    df = spark.createDataFrame(
        [(0, "audio/wav", bytearray(bad), {})], schema=ASSET_SCHEMA
    )
    out = decode_media(df).toPandas()
    assert not out["decode_ok"].iloc[0]


@SLOW
@given(pdf=panel(), alpha=st.sampled_from([0.25, 0.5, 0.75]))
def test_ewma_matches_pandas_ewm(spark, pdf, alpha):
    from hdfe_spark.operators.stats import ewma

    df = spark.createDataFrame(pdf)
    got = {
        r["k"]: (r["n"], r["ewma"])
        for r in ewma(df, "k", "t", "v", alpha=alpha).collect()
    }
    for k, g in pdf.groupby("k"):
        want = (
            g.sort_values("t")["v"]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .iloc[-1]
        )
        n, y = got[k]
        assert n == len(g)
        assert y == pytest.approx(want, rel=1e-9, abs=1e-12)


@SLOW
@given(pdf=panel())
def test_mann_whitney_u_sum_identity(spark, pdf):
    """U_a + U_b == n_a * n_b for ANY data (rank-sum identity), and
    u_a equals the brute-force pair count with half-credit ties."""
    from hdfe_spark.operators.stats import mann_whitney_u

    pdf = pdf.copy()
    pdf["side"] = np.where(pdf["k"] % 2 == 0, "a", "b")
    if (pdf["side"] == "a").sum() == 0 or (pdf["side"] == "b").sum() == 0:
        return
    # quantize to force ties
    pdf["v"] = np.round(pdf["v"], 1)
    df = spark.createDataFrame(pdf)
    try:
        got = mann_whitney_u(df, "side", "v", "a", "b").collect()[0]
    except ValueError:
        return  # all-tied degenerate: documented raise
    assert got["u_a"] + got["u_b"] == got["n_a"] * got["n_b"]
    a = pdf[pdf["side"] == "a"]["v"].to_numpy()
    b = pdf[pdf["side"] == "b"]["v"].to_numpy()
    wins = (a[:, None] > b[None, :]).sum() + 0.5 * (
        a[:, None] == b[None, :]
    ).sum()
    assert got["u_a"] == pytest.approx(wins, rel=1e-12, abs=1e-9)


@SLOW
@given(pdf=panel())
def test_interpolate_gaps_bounded_by_neighbors(spark, pdf):
    """Interpolated values always lie between their two anchor
    values; known rows pass through; edge NULLs stay NULL."""
    from hdfe_spark.operators.resample import interpolate_gaps

    pdf = pdf.copy()
    # null out every third value to create gaps
    pdf.loc[pdf.index % 3 == 1, "v"] = None
    df = spark.createDataFrame(pdf)
    out = interpolate_gaps(df, "k", "t", "v").toPandas()
    merged = out.merge(pdf, on=["k", "t"], suffixes=("", "_in"))
    for k, g in merged.groupby("k"):
        g = g.sort_values("t")
        known = g[g["v_in"].notna()]
        for _, row in g.iterrows():
            if pd.notna(row["v_in"]):
                assert row["value_interp"] == pytest.approx(row["v_in"])
            elif pd.isna(row["value_interp"]):
                # must be an edge (no known neighbor on one side)
                assert (
                    len(known[known["t"] < row["t"]]) == 0
                    or len(known[known["t"] > row["t"]]) == 0
                )
            else:
                lo = known[known["t"] < row["t"]]["v_in"].iloc[-1]
                hi = known[known["t"] > row["t"]]["v_in"].iloc[0]
                lo, hi = min(lo, hi), max(lo, hi)
                eps = 1e-9 * max(abs(lo), abs(hi), 1.0)
                assert lo - eps <= row["value_interp"] <= hi + eps


@SLOW
@given(pdf=panel())
def test_containment_in_unit_interval_and_self_free(spark, pdf):
    """Containment is always in (0, 1], never emits self-pairs, and
    C(A->B) = 1 whenever A's shingle set is a subset of B's."""
    from hdfe_spark.operators.dedup import containment_pairs

    pdf = pdf.copy()
    pdf["text"] = (
        "w" + (pdf["k"] % 3).astype(str) + " common prefix text "
        + (pdf["t"] % 5).astype(str)
    )
    pdf["doc_id"] = pdf["t"]
    df = spark.createDataFrame(pdf[["doc_id", "text"]])
    out = containment_pairs(df, threshold=0.01).collect()
    for r in out:
        assert r["id_a"] != r["id_b"]
        assert 0.0 < r["containment"] <= 1.0
        assert r["n_common"] <= r["size_a"]


@SLOW
@given(
    n=st.integers(min_value=2, max_value=40),
    r=st.integers(min_value=1, max_value=30),
)
def test_radius_join_is_symmetric_and_complete(spark, n, r):
    """Self-join pair set == brute force, and (a,b) present iff
    (b,a) present (distance is symmetric)."""
    from hdfe_spark.operators.rangejoin import radius_join

    rng = np.random.default_rng(n * 31 + r)
    pts = rng.integers(-50, 50, (n, 2))
    df = spark.createDataFrame(
        [(i, int(x), int(y)) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )
    got = {
        (row["id_l"], row["id_r"])
        for row in radius_join(df, df, "x", "y", r).collect()
    }
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    want = {
        (i, j) for i in range(n) for j in range(n) if d2[i, j] <= r * r
    }
    assert got == want
    assert all((b, a) in got for a, b in got)


@st.composite
def binned_labels(draw):
    k = draw(st.integers(min_value=1, max_value=8))
    w = draw(st.lists(st.integers(min_value=1, max_value=20),
                      min_size=k, max_size=k))
    s = [draw(st.integers(min_value=0, max_value=wi)) for wi in w]
    return w, s


@settings(max_examples=200, deadline=None)
@given(ws=binned_labels())
def test_isotonic_minimax_equals_pav_property(ws):
    """The minimax identity must equal stack-based PAV for ANY bin
    profile — this is the mathematical core of the isotonic_cal
    certificate, checked directly on the driver lattice (no Spark
    binning ambiguity, so it can run 200 examples)."""
    from hdfe_spark.operators.stats import _isotonic_minimax

    from tests.test_r7_ops import _pav

    w, s = ws
    got = _isotonic_minimax(w, s)
    exp = _pav(w, s)
    assert got == pytest.approx(exp, abs=1e-12)
    assert all(a <= b + 1e-12 for a, b in zip(got, got[1:]))


@SLOW
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=40,
    ),
    pct=st.integers(min_value=1, max_value=100),
)
def test_weighted_quantile_matches_reference(spark, vals, pct):
    """weighted_quantiles must return the smallest value whose
    cumulative weight covers pct% of the total — checked against a
    direct Python fold for ANY (value, weight) multiset."""
    from hdfe_spark.operators.rank import weighted_quantiles

    df = spark.createDataFrame(
        [(float(v), w) for v, w in vals], "v double, w long"
    )
    got = weighted_quantiles(df, "v", "w", pcts=(pct,)).collect()[0]
    agg = {}
    for v, w in vals:
        agg[float(v)] = agg.get(float(v), 0) + w
    tot = sum(agg.values())
    cum = 0
    exp = None
    for v in sorted(agg):
        cum += agg[v]
        if cum * 100 >= pct * tot:
            exp = (v, cum)
            break
    assert (got["value"], got["cum_weight"]) == exp


@st.composite
def tiny_corpus(draw):
    n_docs = draw(st.integers(min_value=2, max_value=5))
    vocab = ["a", "b", "c", "d"]
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(min_value=0, max_value=12))
        docs.append(
            (i, " ".join(draw(st.sampled_from(vocab)) for _ in range(n_tok)))
        )
    return docs


@SLOW
@given(docs=tiny_corpus(), k=st.integers(min_value=2, max_value=4))
def test_span_scrub_matches_brute_force(spark, docs, k):
    """scrub_duplicate_spans must equal a direct Python reference for
    ANY corpus: tokens covered by a cross-document k-gram vanish,
    everything else survives in order. A 4-letter vocabulary makes
    duplicated grams common, exercising overlap and full-coverage
    paths the fixtures rarely hit."""
    from hdfe_spark.operators.text import scrub_duplicate_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["scrubbed_text"])
        for r in scrub_duplicate_spans(df, k=k, min_docs=2).collect()
    }
    toks = {i: t.split() if t else [] for i, t in docs}
    grams = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            grams.setdefault(" ".join(ts[p:p + k]), set()).add(i)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    exp = {}
    for i, ts in toks.items():
        covered = set()
        for p in range(len(ts) - k + 1):
            if " ".join(ts[p:p + k]) in dup:
                covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        if kept:
            exp[i] = (len(ts), len(kept), " ".join(kept))
    assert got == exp


@st.composite
def _preds(draw):
    n = draw(st.integers(min_value=2, max_value=80))
    ys = draw(
        st.lists(st.integers(0, 1), min_size=n, max_size=n)
    )
    ps = draw(
        st.lists(st.integers(0, 1), min_size=n, max_size=n)
    )
    probs = draw(
        st.lists(
            st.floats(min_value=0.0, max_value=1.0,
                      allow_nan=False),
            min_size=n, max_size=n,
        )
    )
    return ys, ps, probs


@SLOW
@given(_preds())
def test_confusion_invariants(spark, data):
    """For ANY 0/1 labels/preds: counters partition n; every metric
    is in [0, 1]; mcc in [-1, 1]."""
    from hdfe_spark.operators.ml import confusion_stats

    ys, ps, _ = data
    df = spark.createDataFrame(list(zip(ys, ps)), "y long, p long")
    r = confusion_stats(df, "y", "p").collect()[0]
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n"]
    for m in ("accuracy", "precision", "recall", "f1"):
        if r[m] is not None:
            assert 0.0 <= r[m] <= 1.0, (m, r[m])
    if r["mcc"] is not None:
        assert -1.0 <= r["mcc"] <= 1.0 + 1e-12


@SLOW
@given(_preds())
def test_brier_and_bins_invariants(spark, data):
    """brier in [0, 1]; calibration bins partition the rows, conf
    and acc in [0, 1], gap == |conf - acc|."""
    from hdfe_spark.operators.ml import brier_score, calibration_bins

    ys, _, probs = data
    df = spark.createDataFrame(
        list(zip(ys, probs)), "y long, p double"
    )
    r = brier_score(df, "y", "p").collect()[0]
    assert 0.0 <= r["brier"] <= 1.0 + 1e-9
    bins = calibration_bins(df, "y", "p").collect()
    assert sum(b["n"] for b in bins) == len(ys)
    for b in bins:
        assert 0 <= b["bin"] <= 9
        assert 0.0 <= b["acc"] <= 1.0
        assert -1e-9 <= b["conf"] <= 1.0 + 1e-9
        assert b["gap"] == abs(b["conf"] - b["acc"])


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),
            st.floats(min_value=0.0, max_value=1e4, allow_nan=False),
        ),
        min_size=2,
        max_size=80,
    )
)
def test_gini_by_range_invariant(spark, rows):
    """For ANY non-negative values: gini in [0, 1) per group (NULL
    only for zero-total groups)."""
    from hdfe_spark.operators.stats import gini_by

    df = spark.createDataFrame(
        [(str(g), v) for g, v in rows], "g string, x double"
    )
    for r in gini_by(df, "g", "x").collect():
        if r["gini"] is not None:
            assert -1e-9 <= r["gini"] < 1.0, r


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 1),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=4,
        max_size=80,
    )
)
def test_auc_by_range_invariant(spark, rows):
    """For ANY labeled scores: AUC in [0, 1] per group; NULL exactly
    for one-sided groups."""
    from hdfe_spark.operators.stats import auc_by

    df = spark.createDataFrame(
        [(str(g), y, s) for g, y, s in rows],
        "g string, y long, s double",
    )
    got = auc_by(df, "g", "y", "s").collect()
    for r in got:
        one_sided = r["n_pos"] == 0 or r["n_neg"] == 0
        assert (r["auc"] is None) == one_sided
        if r["auc"] is not None:
            assert -1e-12 <= r["auc"] <= 1.0 + 1e-12


@st.composite
def keyed_series(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    keys = draw(
        st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n)
    )
    vals = draw(
        st.lists(
            st.floats(
                min_value=-1e4, max_value=1e4,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=n,
            max_size=n,
        )
    )
    block_len = draw(st.integers(min_value=2, max_value=8))
    return keys, vals, block_len


@SLOW
@given(data=keyed_series(), alpha=st.floats(min_value=0.05, max_value=0.95))
def test_blocked_ewma_matches_sequential_any_series(spark, data, alpha):
    """For ANY keyed series and ANY small block size, the blocked
    fold agrees with the sequential fold to ~1 ulp per composition
    step, and a blocking wider than every key is bit-identical."""
    from hdfe_spark.operators.stats import ewma, ewma_blocked

    keys, vals, block_len = data
    rows = [(str(k), i, v) for i, (k, v) in enumerate(zip(keys, vals))]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    seq = {r["k"]: r["ewma"] for r in ewma(df, "k", "t", "v", alpha).collect()}
    blk = {
        r["k"]: r["ewma"]
        for r in ewma_blocked(
            df, "k", "t", "v", alpha, block_len=block_len, max_blocks=64
        ).collect()
    }
    assert set(seq) == set(blk)
    for k in seq:
        assert blk[k] == pytest.approx(seq[k], rel=1e-10, abs=1e-9), k
    one = {
        r["k"]: r["ewma"]
        for r in ewma_blocked(df, "k", "t", "v", alpha, block_len=64).collect()
    }
    assert one == seq


@SLOW
@given(data=keyed_series(), target=st.integers(min_value=-3, max_value=3))
def test_blocked_cusum_integer_deltas_bit_exact_any_blocking(
    spark, data, target
):
    """Integer-exact regime: for ANY integer series and ANY block
    size, blocked cusum == sequential cusum BIT-FOR-BIT (max-plus
    algebra on exact binary64 integers)."""
    from hdfe_spark.operators.stats import cusum, cusum_blocked

    keys, vals, block_len = data
    rows = [
        (str(k), i, float(int(v) % 7 - 3))
        for i, (k, v) in enumerate(zip(keys, vals))
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    seq = {
        r["k"]: r["cusum"]
        for r in cusum(df, "k", "t", "v", float(target)).collect()
    }
    blk = {
        r["k"]: r["cusum"]
        for r in cusum_blocked(
            df, "k", "t", "v", float(target),
            block_len=block_len, max_blocks=64,
        ).collect()
    }
    assert blk == seq


@SLOW
@given(
    data=keyed_series(),
    alpha=st.floats(min_value=0.1, max_value=0.9),
    gamma=st.floats(min_value=0.1, max_value=0.9),
)
def test_blocked_holt_matches_sequential_any_series(
    spark, data, alpha, gamma
):
    """The 2x2 affine composition: for ANY keyed series and block
    size, blocked holt agrees with the sequential fold to tight rel
    tolerance on level/trend/forecast."""
    from hdfe_spark.operators.stats import holt, holt_blocked

    keys, vals, block_len = data
    rows = [(str(k), i, v) for i, (k, v) in enumerate(zip(keys, vals))]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    cols = ("level", "trend", "forecast")
    seq = {
        r["k"]: tuple(r[c] for c in cols)
        for r in holt(df, "k", "t", "v", alpha, gamma).collect()
    }
    blk = {
        r["k"]: tuple(r[c] for c in cols)
        for r in holt_blocked(
            df, "k", "t", "v", alpha, gamma,
            block_len=block_len, max_blocks=64,
        ).collect()
    }
    assert set(seq) == set(blk)
    for k in seq:
        for s, b in zip(seq[k], blk[k]):
            assert b == pytest.approx(s, rel=1e-8, abs=1e-8), k
