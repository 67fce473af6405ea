"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). Images / audio /
video ride in DataFrames as ``binary`` columns next to typed metadata
(mime, width/height, sample rate, ...). The Spark-side plumbing —
schema contract, Arrow batch shape, ``mapInPandas`` decode stage,
partition sizing — is real and tested; the actual codec calls are
STUBBED (the image/audio libraries are not in this container):
``decode_image(..., fake=False)`` raises ``NotImplementedError``
where PIL/libvips would be called, and ``fake=True`` substitutes a
deterministic content-hash-seeded feature vector so downstream
operators (dedup, ANN) can be exercised end-to-end.

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
    array<double>`` + ``decode_ok boolean``. With ``fake=False`` this
    is where PIL/torchvision would run — stubbed with
    ``NotImplementedError`` in this container.
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not in this container"
                )
            feats = [
                _fake_features(p, feature_dim) if p is not None else None
                for p in pdf[payload_col]
            ]
            out = pdf[keep_cols].copy()
            out["features"] = [f.tolist() if f is not None else None for f in feats]
            out["decode_ok"] = [f is not None for f in feats]
            yield out

    return df.mapInPandas(run, schema=out_schema)


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
