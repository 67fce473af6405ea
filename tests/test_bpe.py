"""BPE tokenizer training/encoding (`operators/bpe.py`) against a
pure-Python Sennrich reference on the same word histogram."""

from collections import Counter

import pytest

from hdfe_spark.operators.bpe import (
    END,
    decode_word,
    encode_words,
    train_bpe,
)


def _ref_train(word_freq: dict[str, int], n_merges: int):
    """Textbook BPE on a word histogram, with the same total-order
    tie-break (count desc, pair asc)."""
    vocab = {w: list(w) + [END] for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, seq in vocab.items():
            f = word_freq[w]
            for x, y in zip(seq, seq[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, seq in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            vocab[w] = out
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the cats sat",
    "a mat on a cat",
    "the the the",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def _hist(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            c[w] += 1
    return dict(c)


def test_train_matches_reference(corpus_df):
    got = train_bpe(corpus_df, "text", n_merges=8)
    want = _ref_train(_hist(CORPUS), 8)
    assert got == want


def test_merges_deterministic_rerun(corpus_df):
    a = train_bpe(corpus_df, "text", n_merges=5)
    b = train_bpe(corpus_df.repartition(7), "text", n_merges=5)
    assert a == b  # partitioning must not change the merge sequence


def test_encode_roundtrip_and_compression(corpus_df):
    merges = train_bpe(corpus_df, "text", n_merges=8)
    enc = encode_words(corpus_df, merges).collect()
    assert enc, "histogram empty"
    for r in enc:
        assert decode_word(r["tokens"]) == r["word"]
        # merges only shorten sequences
        assert len(r["tokens"]) <= len(r["word"]) + 1
    # the most frequent word ('the', freq 6) must compress to a
    # single unit within 8 merges
    the = [r for r in enc if r["word"] == "the"][0]
    assert the["tokens"] == ["the" + END] or len(the["tokens"]) <= 2


def test_min_freq_stop(spark):
    # every pair unique -> best count 1 < 2 -> no merges learned
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    assert train_bpe(df, "text", n_merges=5) == []
