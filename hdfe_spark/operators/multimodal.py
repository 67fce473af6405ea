"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). Images / audio /
video ride in DataFrames as ``binary`` columns next to typed metadata
(mime, width/height, sample rate, ...). The Spark-side plumbing —
schema contract, Arrow batch shape, ``mapInPandas`` decode stage,
partition sizing — is real and tested.

Codecs: the container has no PIL/libvips/ffmpeg, so compressed
formats (JPEG/MP3/H.264) stay stubbed — but the UNCOMPRESSED formats
are decoded for real, in pure numpy:

- ``decode_ppm`` / ``encode_ppm`` — binary PPM (P6) images: ASCII
  header (magic, width, height, maxval, ``#`` comments) + interleaved
  RGB bytes.
- ``decode_wav`` / ``encode_wav`` — RIFF/WAVE PCM16: chunk walk to
  ``fmt `` and ``data``, little-endian int16 samples.
- ``decode_media`` — the mixed-modality ``mapInPandas`` stage: routes
  each row by mime to the right parser and emits typed header fields
  plus an int64 content checksum (pixel sum / sample sum), payload
  dropped in-stage.

``decode_image(..., fake=True)`` still substitutes a deterministic
content-hash-seeded feature vector (for exercising dedup/ANN on
opaque payloads); ``fake=False`` now really decodes PPM payloads and
emits a 64-bin luminance histogram as the feature vector.

Scale notes: binary payloads dominate row size, so the decode stage
uses ``mapInPandas`` (per-partition Arrow batches, streaming iterator
— never materializes a partition as one pandas object) and callers
should size ``spark.sql.files.maxPartitionBytes`` so a batch of
payloads fits executor memory. Feature extraction shrinks rows by
~1000×; do it as early as possible and drop the payload column before
any shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from struct import error as struct_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema contract for a multimodal asset table.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURE_DIM = 64


def make_fake_assets(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table obeying ASSET_SCHEMA — the
    test stand-in for an object-store scan of real media."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        payload = rng.bytes(128 + int(rng.randint(0, 128)))
        rows.append(
            (
                i,
                "image/fake" if i % 3 else "audio/fake",
                bytearray(payload),
                {"w": str(int(rng.randint(16, 512))), "h": str(int(rng.randint(16, 512)))},
            )
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def encode_ppm(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Binary PPM (P6): ``P6\\n{w} {h}\\n255\\n`` + row-major
    interleaved RGB uint8. ``pixels`` is (height, width, 3) uint8."""
    assert pixels.shape == (height, width, 3) and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.tobytes()


def decode_ppm(payload: bytes) -> "tuple[int, int, np.ndarray]":
    """Pure-numpy P6 parser → (width, height, (h, w, 3) uint8 pixels).

    Handles the PPM grammar for real: ``#`` comments and arbitrary
    whitespace between the four header tokens, single whitespace byte
    after maxval, then exactly w·h·3 binary bytes."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    need = w * h * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return w, h, raster.reshape(h, w, 3)


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """RIFF/WAVE PCM16 mono: canonical 44-byte header + LE int16."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> "tuple[int, int, int, np.ndarray]":
    """Pure-numpy RIFF/WAVE parser → (sample_rate, channels, bits,
    int16 samples). Walks the chunk list (not a fixed 44-byte offset),
    so files with LIST/INFO chunks before ``data`` parse too."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, sample_rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    return sample_rate, channels, bits, np.frombuffer(data, dtype="<i2")


# Deterministic closed-form fixture: every header field and pixel /
# sample value is a pure function of asset_id, so a SQL oracle can
# recompute the expected decode output from ``range(n)`` alone while
# the Spark side must actually parse the bytes. (Mirrored in the
# ``multimodal_decode`` oracle in ``__spark_entry__.py`` — keep in
# sync.)
def _img_dims(i: int) -> "tuple[int, int]":
    return 4 + (i % 29), 4 + ((i * 3) % 23)


def _wav_params(i: int) -> "tuple[int, int]":
    return 8000 + ((i // 3) % 3) * 4000, 64 + (i * 5) % 200


def make_codec_assets(spark, n: int = 256) -> DataFrame:
    """Asset table of REAL media payloads (PPM images, WAV audio)
    whose contents follow the closed-form functions above — the
    oracle-checkable fixture for the pure-numpy codecs."""
    rows = []
    for i in range(n):
        if i % 3:
            w, h = _img_dims(i)
            x = np.arange(w, dtype=np.int64)[None, :, None]
            y = np.arange(h, dtype=np.int64)[:, None, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            px = ((x * 31 + y * 17 + i + c * 7) % 256).astype(np.uint8)
            rows.append(
                (i, "image/ppm", bytearray(encode_ppm(w, h, px)), {"w": str(w), "h": str(h)})
            )
        else:
            rate, ns = _wav_params(i)
            j = np.arange(ns, dtype=np.int64)
            s = (((j * 7 + i * 13) % 4096) - 2048).astype(np.int16)
            rows.append(
                (i, "audio/wav", bytearray(encode_wav(rate, s)), {"rate": str(rate)})
            )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    mime_col: str = "mime",
) -> DataFrame:
    """Mixed-modality decode stage: one ``mapInPandas`` pass routes
    each row by mime to the PPM or WAV parser and emits typed header
    fields + an int64 content checksum (pixel sum / sample sum),
    payload dropped in-stage. Unknown mimes / parse failures emit
    ``decode_ok=false`` with zeroed fields (never raise — one corrupt
    asset must not kill a 100 TB scan). Inapplicable fields are 0,
    not NULL, so every output column stays a non-nullable-shaped
    int64 for byte-stable comparison."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, m, p in zip(pdf[id_col], pdf[mime_col], pdf[payload_col]):
                w = h = ch = rate = ns = chk = 0
                ok = False
                try:
                    if m == "image/ppm" and p is not None:
                        w, h, px = decode_ppm(bytes(p))
                        ch = 3
                        chk = int(px.astype(np.int64).sum())
                        ok = True
                    elif m == "audio/wav" and p is not None:
                        rate, ch, _bits, s = decode_wav(bytes(p))
                        # frames, not interleaved samples: a stereo
                        # 100-frame file is ns=100 ch=2, never ns=200
                        ns = len(s) // ch if ch else 0
                        chk = int(s.astype(np.int64).sum())
                        ok = True
                except (ValueError, IndexError, struct_error):
                    ok = False
                out.append((int(i), m, w, h, ch, rate, ns, chk, ok))
            yield pd.DataFrame(
                out, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic content-hash-seeded feature vector — the stub for
    a real encoder. Same payload ⇒ same vector (so dedup semantics
    survive the stub)."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
    return rng.randn(dim).astype(np.float64)


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = True,
    feature_dim: int = IMAGE_FEATURE_DIM,
) -> DataFrame:
    """Decode + feature-extract stage over ``mapInPandas``.

    Output schema: input columns (minus payload) + ``features
    array<double>`` + ``decode_ok boolean``. ``fake=True`` emits the
    content-hash-seeded stub vector (any payload). ``fake=False``
    really decodes PPM payloads (pure numpy) and emits a normalized
    ``feature_dim``-bin luminance histogram — rows that fail to parse
    get ``features=NULL, decode_ok=false``. Compressed formats
    (JPEG/...) would slot in here but need PIL, absent from this
    container.
    """
    out_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        out_fields
        + [
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
            T.StructField("decode_ok", T.BooleanType(), False),
        ]
    )
    keep_cols = [f.name for f in out_fields]

    def real_features(p) -> "np.ndarray | None":
        if p is None:
            return None
        try:
            _w, _h, px = decode_ppm(bytes(p))
        except (ValueError, IndexError):
            return None
        # ITU-R 601 luma, then a fixed-width histogram → unit L1 norm
        luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        hist, _ = np.histogram(luma, bins=feature_dim, range=(0.0, 256.0))
        return hist / max(hist.sum(), 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _fake_features(p, feature_dim) if p is not None else None
                    for p in pdf[payload_col]
                ]
            else:
                feats = [real_features(p) for p in pdf[payload_col]]
            out = pdf[keep_cols].copy()
            out["features"] = [f.tolist() if f is not None else None for f in feats]
            out["decode_ok"] = [f is not None for f in feats]
            yield out

    return df.mapInPandas(run, schema=out_schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("resize_ok", T.BooleanType(), False),
    ]
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL nearest-neighbor image resize over PPM payloads: decode →
    numpy index-map resample → re-encode, streaming ``mapInPandas``
    batches (no payload ever crosses to the driver).

    The source index map is pure integer floor arithmetic —
    ``src = (dst * src_dim) // dst_dim`` — so any engine reproduces
    the exact resampled raster; the driver certificate recomputes the
    resized checksum in DuckDB from the fixture's closed-form pixel
    function alone while this stage must actually parse and resample
    the bytes. Non-image rows emit ``resize_ok=false`` with a null
    payload (the caller keeps or drops them); corrupt payloads do the
    same instead of failing the stage.

    Scale: per-row CPU work inside Arrow batches, one narrow pass, no
    shuffle; output bytes scale with out_w×out_h — downsampling
    shrinks the stage's output, which is the point of running resize
    early in a media pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, mime, payload in zip(
                pdf["asset_id"], pdf["mime"], pdf[payload_col]
            ):
                if mime == "image/ppm" and payload is not None:
                    try:
                        w, h, px = decode_ppm(bytes(payload))
                        ix = (np.arange(out_w, dtype=np.int64) * w) // out_w
                        iy = (np.arange(out_h, dtype=np.int64) * h) // out_h
                        res = px[iy[:, None], ix[None, :], :]
                        rows.append(
                            (
                                aid, mime,
                                bytearray(encode_ppm(out_w, out_h, res)),
                                out_w, out_h,
                                int(res.astype(np.int64).sum()), True,
                            )
                        )
                        continue
                    except (ValueError, struct_error, IndexError):
                        pass
                rows.append((aid, mime, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "mime", "payload",
                    "width", "height", "checksum", "resize_ok",
                ],
            )

    return df.select("asset_id", "mime", payload_col).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage stub: records the requested size in metadata;
    payload passthrough (real implementation would transform bytes)."""
    return df.withColumn(
        "meta",
        F.map_concat(
            F.col("meta"),
            F.create_map(
                F.lit("resize_w"), F.lit(str(width)),
                F.lit("resize_h"), F.lit(str(height)),
            ),
        ),
    )


def frame_sample_stub(
    df: DataFrame, every_n: int = 10, payload_col: str = "payload"
) -> DataFrame:
    """Video frame-sampling stub: emits one row per sampled frame index
    with the frame payload stubbed to the content hash. Demonstrates
    the explode-shaped (1→N) stage with correct schema/partition
    behavior."""
    n_frames = (F.length(F.col(payload_col)) / F.lit(16)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        df.withColumn("frame_idx", F.explode(idx))
        .withColumn("frame_hash", F.sha2(F.concat(F.col(payload_col), F.col("frame_idx").cast("string").cast("binary")), 256))
        .drop(payload_col)
    )


AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("time_energy", T.LongType(), True),
        T.StructField("parseval_ratio", T.DoubleType(), True),
        T.StructField("band_share", T.ArrayType(T.DoubleType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    mime_col: str = "mime",
    n_bands: int = 4,
) -> DataFrame:
    """Audio feature extraction over binary WAV payloads — the
    feature-extract stage of the multimodal pipeline, pure numpy in
    one ``mapInPandas`` pass (payload dropped in-stage, Arrow-batched,
    same plumbing contract as ``decode_media``):

    - ``time_energy`` — Σ sample² as EXACT int64 (int16 samples make
      this integer arithmetic, so any engine that can regenerate the
      samples reproduces it bit-for-bit — the cross-engine handle the
      ``multimodal_audio`` driver certificate hashes on);
    - ``parseval_ratio`` — Σ|FFT|² / (N · Σ sample²), which Parseval's
      theorem fixes at EXACTLY 1.0 up to float rounding: the
      self-certifying invariant that the spectral path agrees with
      the time-domain path on every asset;
    - ``band_share`` — energy fraction per ``n_bands`` equal slices
      of the rfft spectrum (the cheap spectral-shape descriptor a
      quality filter or language/music classifier consumes).

    Failures emit ``decode_ok=false`` with zeroed fields — one
    corrupt asset must not kill a 100 TB scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, m, p in zip(pdf[id_col], pdf[mime_col], pdf[payload_col]):
                rate = ns = te = 0
                ratio = 0.0
                bands = None
                ok = False
                try:
                    if m == "audio/wav" and p is not None:
                        rate, ch, _bits, s = decode_wav(bytes(p))
                        x = s.astype(np.float64)
                        te = int((s.astype(np.int64) ** 2).sum())
                        ns = len(s) // ch if ch else 0
                        spec = np.abs(np.fft.fft(x)) ** 2
                        ratio = float(spec.sum() / (len(x) * te)) if te else 0.0
                        mag = np.abs(np.fft.rfft(x)) ** 2
                        total = mag.sum()
                        splits = np.array_split(mag, n_bands)
                        bands = [
                            float(b.sum() / total) if total else 0.0
                            for b in splits
                        ]
                        ok = True
                except (ValueError, IndexError, struct_error):
                    ok = False
                out.append((int(i), rate, ns, te, ratio, bands, ok))
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEAT_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=AUDIO_FEAT_SCHEMA)


# ---------------------------------------------------------------------------
# Video: a real (toy-container) codec + frame sampling. "PVID" is the
# video sibling of the PPM/WAV codecs above: 4-byte magic, big-endian
# u32 frame-count/width/height header, then raw RGB24 frames
# concatenated — enough container to make the decode path REAL
# (header parsing, bounds checks, frame slicing) while staying
# pure-numpy. A production system swaps decode_pvid for pyav/ffmpeg;
# the Spark-side plumbing (binary column in, one row per sampled
# frame out, Arrow batches, payload dropped in-stage) is the part
# that carries to 100 TB unchanged.
# ---------------------------------------------------------------------------

import struct


def _vid_params(i: int) -> "tuple[int, int, int]":
    """(width, height, n_frames) for fixture asset i — closed form so
    a SQL oracle can regenerate every pixel."""
    return 6 + (i % 7), 5 + ((i * 2) % 5), 4 + (i % 6)


def encode_pvid(width: int, height: int, frames: np.ndarray) -> bytes:
    """frames: (n, height, width, 3) uint8."""
    n = frames.shape[0]
    assert frames.shape == (n, height, width, 3)
    return (
        b"PVID"
        + struct.pack(">III", n, width, height)
        + frames.astype(np.uint8).tobytes()
    )


def decode_pvid(payload: bytes) -> "tuple[int, int, int, np.ndarray]":
    """Returns (n_frames, width, height, frames[n,h,w,3])."""
    if payload[:4] != b"PVID" or len(payload) < 16:
        raise ValueError("not a PVID payload")
    n, w, h = struct.unpack(">III", payload[4:16])
    body = np.frombuffer(payload, dtype=np.uint8, offset=16)
    if body.size != n * h * w * 3:
        raise ValueError("truncated PVID payload")
    return n, w, h, body.reshape(n, h, w, 3)


def make_video_assets(spark, n: int = 128) -> DataFrame:
    """Fixture videos whose pixel (f, y, x, c) of asset i equals
    ``(x*31 + y*17 + f*11 + i + c*7) % 256`` — the closed form the
    driver oracle re-sums."""
    rows = []
    for i in range(n):
        w, h, nf = _vid_params(i)
        f = np.arange(nf, dtype=np.int64)[:, None, None, None]
        y = np.arange(h, dtype=np.int64)[None, :, None, None]
        x = np.arange(w, dtype=np.int64)[None, None, :, None]
        c = np.arange(3, dtype=np.int64)[None, None, None, :]
        px = ((x * 31 + y * 17 + f * 11 + i + c * 7) % 256).astype(np.uint8)
        rows.append(
            (
                i,
                "video/pvid",
                bytearray(encode_pvid(w, h, px)),
                {"w": str(w), "h": str(h), "n_frames": str(nf)},
            )
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("pix_sum", T.LongType(), False),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Decode each video payload and emit one row per every_n-th
    frame with exact int64 pixel-sum stats — the frame-sampling stage
    of a video-training pipeline (decode → subsample → per-frame
    features), as one Arrow ``mapInPandas`` pass. The multi-MB
    payload is DROPPED inside the stage: only scalar frame rows
    shuffle downstream, the property that matters when the input
    column is 100 TB of video."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: "dict[str, list]" = {
                "asset_id": [], "frame_idx": [], "width": [],
                "height": [], "pix_sum": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                nf, w, h, frames = decode_pvid(bytes(payload))
                for fi in range(0, nf, every_n):
                    out["asset_id"].append(int(aid))
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["pix_sum"].append(
                        int(frames[fi].astype(np.int64).sum())
                    )
            yield pd.DataFrame(out)

    return df.select("asset_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)
