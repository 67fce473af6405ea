"""Vectorized deterministic hashing kernels for sketch operators.

Why Pandas UDFs here and not JVM expressions: a MinHash signature
needs ``num_hashes × n_shingles`` hash evaluations per document.
Expressed as nested higher-order SQL functions
(``transform(seq, i -> array_min(transform(shingles, ...)))``) the
inner shingle array is re-evaluated per outer lambda — the expression
tree is quadratic and falls out of whole-stage codegen, which measured
minutes for 500 docs. Here the per-document work is one numpy
rolling-hash pass (O(len)) plus an affine fan-out to ``num_hashes``
functions (uint64 wraparound arithmetic = mod 2^64), Arrow-batched.
Deterministic across workers (no Python ``hash()``).

Hash family: polynomial rolling hash over UTF-8 bytes,
``h(g) = Σ b_j·B^(k-1-j) (mod 2^64)``; MinHash fns are the standard
affine family ``h_i = a_i·h + c_i (mod 2^64)`` with seeded odd
multipliers (2-universal enough for sketching).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE = np.uint64(1099511628211)  # FNV prime as polynomial base


def kgram_hashes_np(text: str, k: int) -> np.ndarray:
    """uint64 hashes of every char k-gram (UTF-8 bytes), vectorized:
    one cumulative polynomial pass + window recombination."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = data.shape[0]
    if n < k:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        d = data.astype(np.uint64)
        # windows[i] = sum_{j<k} d[i+j] * B^(k-1-j)  via sliding dot
        powers = np.empty(k, dtype=np.uint64)
        powers[-1] = np.uint64(1)
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _BASE
        win = np.lib.stride_tricks.sliding_window_view(d, k)
        out = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    # xorshift finalize to decorrelate adjacent grams
    out = out ^ (out >> np.uint64(33))
    with np.errstate(over="ignore"):
        out = out * np.uint64(0xFF51AFD7ED558CCD)
    out = out ^ (out >> np.uint64(33))
    return out


def token_hashes_np(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token (full-token polynomial hash).

    Vectorized ACROSS tokens (optimization r15): the FNV fold is
    sequential per byte, so it runs position-by-position over a padded
    byte matrix — max(len) numpy sweeps for the whole batch instead of
    a Python loop per byte (measured ~2.5× on the fixture corpus).
    Tokens are length-sorted so each sweep touches only still-live
    tokens as a contiguous slice (an outlier-long token costs sweeps
    over itself alone, not masked passes over the batch).
    Bit-identical to the per-byte loop."""
    n = len(tokens)
    out = np.full(n, np.uint64(14695981039346656037), dtype=np.uint64)
    if n == 0:
        return out
    bs = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in bs), count=n, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return out
    # Length-sorted, then processed in chunks whose padded matrix is
    # bounded (~8 MB) — a single outlier-mega-token (minified JS /
    # base64 blob in crawled text) lands in its own tiny chunk instead
    # of forcing an n × maxlen allocation (review r15).
    order = np.argsort(lens, kind="stable")
    lens_s = lens[order]
    bounds = np.cumsum(lens_s)
    starts = bounds - lens_s
    out_s = out[order]
    _CHUNK_BYTES = 1 << 23
    lo = 0
    with np.errstate(over="ignore"):
        while lo < n:
            hi = lo + 1
            # grow while padded size (count × current maxlen) stays
            # bounded; lens_s is ascending so maxlen = lens_s[hi-1]
            while hi < n and (hi + 1 - lo) * int(lens_s[hi]) <= _CHUNK_BYTES:
                hi += 1
            maxlen = int(lens_s[hi - 1])
            if maxlen == 0:
                lo = hi
                continue
            cnt = hi - lo
            csz = int(bounds[hi - 1] - starts[lo])
            flat = np.frombuffer(
                b"".join(bs[order[i]] for i in range(lo, hi)), dtype=np.uint8
            )
            clens = lens_s[lo:hi]
            mat = np.zeros((cnt, maxlen), dtype=np.uint8)
            row = np.repeat(np.arange(cnt), clens)
            col = np.arange(csz) - np.repeat(np.cumsum(clens) - clens, clens)
            mat[row, col] = flat
            h = out_s[lo:hi]
            for j in range(maxlen):
                jlo = int(np.searchsorted(clens, j, side="right"))
                h[jlo:] = (h[jlo:] ^ mat[jlo:, j].astype(np.uint64)) * _BASE
            out_s[lo:hi] = h
            lo = hi
    out[order] = out_s
    return out


def _affine_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num_hashes).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    c = rng.randint(0, 2**62, size=num_hashes).astype(np.uint64)
    return a, c


def make_minhash_udf(num_hashes: int = 64, shingle_k: int = 5, seed: int = 42):
    """Returns a pandas UDF: text → array<bigint> MinHash signature.

    Empty/short texts get the all-zeros signature (parity with the
    JVM fallback in dedup.minhash_signature's coalesce-to-0)."""
    a, c = _affine_params(num_hashes, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([0] * num_hashes)
                continue
            h = np.unique(kgram_hashes_np(t.lower(), shingle_k))
            if h.size == 0:
                out.append([0] * num_hashes)
                continue
            with np.errstate(over="ignore"):
                m = (a[:, None] * h[None, :] + c[:, None]).min(axis=1)
            out.append(m.astype(np.int64).tolist())
        return pd.Series(out)

    return sig


def make_minhash_bands_udf(
    num_hashes: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42
):
    """Returns a pandas UDF: text → array<bigint> of ``bands`` band
    digests (the LSH bucketing keys). Band digest = polynomial hash of
    the band's slice of the MinHash signature, so two docs share a
    band digest iff they agree on every min-hash in that band.
    Computed inside one UDF because Python UDF columns cannot feed
    higher-order JVM lambdas (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_
    WITH_PYTHON_UDF)."""
    a, c = _affine_params(num_hashes, seed)
    rows_per_band = num_hashes // bands
    band_pows = np.empty(rows_per_band, dtype=np.uint64)
    band_pows[-1] = np.uint64(1)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is intended
        for j in range(rows_per_band - 2, -1, -1):
            band_pows[j] = band_pows[j + 1] * _BASE

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                h = np.empty(0, dtype=np.uint64)
            else:
                h = np.unique(kgram_hashes_np(t.lower(), shingle_k))
            if h.size == 0:
                m = np.zeros(num_hashes, dtype=np.uint64)
            else:
                with np.errstate(over="ignore"):
                    m = (a[:, None] * h[None, :] + c[:, None]).min(axis=1)
            with np.errstate(over="ignore"):
                sl = m.reshape(bands, rows_per_band)
                digs = (sl * band_pows[None, :]).sum(axis=1, dtype=np.uint64)
                digs = digs ^ (digs >> np.uint64(33))
                digs = digs * np.uint64(0xC4CEB9FE1A85EC53)
                # salt with band index so identical slices in different
                # bands never collide across bands
                digs = digs + np.arange(bands, dtype=np.uint64)
            out.append(digs.astype(np.int64).tolist())
        return pd.Series(out)

    return band_sig


def make_minhash_bands_and_set_udf(
    num_hashes: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42
):
    """Fused kernel (optimization r15, guide §4.2): text →
    ``struct(bands array<bigint>, shingles array<bigint>)`` in ONE
    Arrow pass. ``bands`` is bit-identical to
    :func:`make_minhash_bands_udf`; ``shingles`` to
    :func:`make_kgram_set_udf`. Both start from the same
    ``unique(kgram_hashes)`` set, which the unfused pipeline computed
    four times per corpus (bands twice for the LSH self-join's two
    sides, the shingle set twice for the verify join's two sides);
    computing it once and persisting the compact signature table
    removes three full text scans + Arrow passes from near-dedup."""
    a, c = _affine_params(num_hashes, seed)
    rows_per_band = num_hashes // bands
    band_pows = np.empty(rows_per_band, dtype=np.uint64)
    band_pows[-1] = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(rows_per_band - 2, -1, -1):
            band_pows[j] = band_pows[j + 1] * _BASE

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("bands", T.ArrayType(T.LongType())),
                T.StructField("shingles", T.ArrayType(T.LongType())),
            ]
        )
    )
    def bands_and_set(texts: pd.Series) -> pd.DataFrame:
        out_b, out_s = [], []
        for t in texts:
            if t is None:
                h = np.empty(0, dtype=np.uint64)
            else:
                h = np.unique(kgram_hashes_np(t.lower(), shingle_k))
            # shingle set: kset semantics ((t or "") — identical for
            # None input: empty array)
            out_s.append(h.astype(np.int64).tolist())
            if h.size == 0:
                m = np.zeros(num_hashes, dtype=np.uint64)
            else:
                with np.errstate(over="ignore"):
                    m = (a[:, None] * h[None, :] + c[:, None]).min(axis=1)
            with np.errstate(over="ignore"):
                sl = m.reshape(bands, rows_per_band)
                digs = (sl * band_pows[None, :]).sum(axis=1, dtype=np.uint64)
                digs = digs ^ (digs >> np.uint64(33))
                digs = digs * np.uint64(0xC4CEB9FE1A85EC53)
                digs = digs + np.arange(bands, dtype=np.uint64)
            out_b.append(digs.astype(np.int64).tolist())
        return pd.DataFrame({"bands": out_b, "shingles": out_s})

    return bands_and_set


def make_kgram_set_udf(shingle_k: int = 5):
    """Returns a pandas UDF: text → sorted distinct array<bigint> of
    char k-gram hashes — the set representation used for exact
    Jaccard. Same Jaccard value as string-shingle sets up to 2^-64
    collisions."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def kset(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = np.unique(kgram_hashes_np((t or "").lower(), shingle_k))
            out.append(h.astype(np.int64).tolist())
        return pd.Series(out)

    return kset


def make_jaccard_udf():
    """Returns a pandas UDF: (set_a, set_b) → exact Jaccard, where
    both inputs are SORTED distinct int64 arrays (make_kgram_set_udf
    output). ``np.intersect1d(assume_unique=True)`` on sorted arrays —
    ~20µs/pair vs ~3.5ms/pair measured for JVM
    ``array_intersect``+``array_union`` on 300-element arrays."""

    @F.pandas_udf(T.DoubleType())
    def jac(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a))
        for i, (x, y) in enumerate(zip(a, b)):
            xa = np.asarray(x, dtype=np.int64)
            ya = np.asarray(y, dtype=np.int64)
            inter = np.intersect1d(xa, ya, assume_unique=True).size
            union = xa.size + ya.size - inter
            out[i] = inter / union if union else 0.0
        return pd.Series(out)

    return jac


def make_winnow_udf(k: int = 7, window: int = 4):
    """Returns a pandas UDF: text → sorted distinct array<bigint>
    winnowing fingerprint (Schleimer et al. 2003): hash every char
    k-gram, keep the min hash of each sliding ``window`` of k-gram
    hashes, dedupe.

    A JVM expression of the same thing
    (``transform(seq, i -> array_min(slice(gram_hashes, ...)))``)
    re-inlines the un-named ``gram_hashes`` subtree into the outer
    lambda — O(len²) per document (measured 200+ s for 5k docs).
    Here: one O(len) rolling-hash pass + a vectorized
    sliding-window min."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = kgram_hashes_np((t or "").lower(), k)
            if h.size == 0:
                out.append([])
                continue
            if h.size <= window:
                mins = np.array([h.min()], dtype=np.uint64)
            else:
                mins = np.lib.stride_tricks.sliding_window_view(
                    h, window
                ).min(axis=1)
            out.append(np.unique(mins).astype(np.int64).tolist())
        return pd.Series(out)

    return winnow


def make_simhash_udf(seed: int = 42):
    """Returns a pandas UDF: text → bigint 64-bit SimHash
    (Charikar 2002): bit b of the signature = majority of bit b over
    the token hash multiset."""

    @F.pandas_udf(T.LongType())
    def sig(texts: pd.Series) -> pd.Series:
        bits = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.int64)
        # All tokens of the whole batch hashed in one vectorized FNV
        # sweep (r15 — token_hashes_np is batch-vectorized); the bit
        # voting stays per-doc over slices, whose (n_tokens × 64)
        # matrices are small and cache-resident.
        tok_lists = [
            [w for w in (t or "").lower().split() if w] for t in texts
        ]
        hs = token_hashes_np([w for ts in tok_lists for w in ts])
        off = 0
        for i, toks in enumerate(tok_lists):
            if not toks:
                out[i] = 0
                continue
            h = hs[off : off + len(toks)]
            off += len(toks)
            # (n_tokens, 64) bit matrix → column votes
            mat = (h[:, None] >> bits[None, :]) & np.uint64(1)
            votes = mat.sum(axis=0)
            sig_bits = (votes * 2 > len(toks)).astype(np.uint64)
            out[i] = (sig_bits << bits).sum(dtype=np.uint64).astype(np.int64)
        return pd.Series(out)

    return sig
