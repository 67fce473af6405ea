"""Multimodal tests — schema contract, mapInPandas decode stage,
pure-numpy PPM/WAV codecs (roundtrip + end-to-end), 1→N frame
sampling."""

import numpy as np
import pytest

from hdfe_spark.operators.multimodal import (
    ASSET_SCHEMA,
    IMAGE_FEATURE_DIM,
    _img_dims,
    _wav_params,
    decode_image,
    decode_media,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    frame_sample_stub,
    make_codec_assets,
    make_fake_assets,
    resize_stub,
)


@pytest.fixture(scope="module")
def assets(spark):
    return make_fake_assets(spark, n=64).persist()


@pytest.fixture(scope="module")
def codec_assets(spark):
    return make_codec_assets(spark, n=48).persist()


def test_schema_contract(assets):
    assert assets.schema == ASSET_SCHEMA


def test_decode_fake_features(assets):
    out = decode_image(assets).toPandas()
    assert len(out) == 64
    assert "payload" not in out.columns
    assert out["decode_ok"].all()
    feats = np.array([np.array(f) for f in out["features"]])
    assert feats.shape == (64, IMAGE_FEATURE_DIM)
    # deterministic: same payload → same features across runs
    out2 = decode_image(assets).toPandas()
    f1 = out.sort_values("asset_id")["features"].iloc[0]
    f2 = out2.sort_values("asset_id")["features"].iloc[0]
    np.testing.assert_array_equal(np.array(f1), np.array(f2))


# ------------------------------------------------------ codec roundtrips


def test_ppm_roundtrip():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(13, 9, 3)).astype(np.uint8)
    w, h, got = decode_ppm(encode_ppm(9, 13, px))
    assert (w, h) == (9, 13)
    np.testing.assert_array_equal(got, px)


def test_ppm_comments_and_whitespace():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    raw = b"P6\n# a comment\n 3\t2 # trailing\n255\n" + px.tobytes()
    w, h, got = decode_ppm(raw)
    assert (w, h) == (3, 2)
    np.testing.assert_array_equal(got, px)


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_wav_roundtrip():
    s = (np.arange(-100, 100) * 11).astype(np.int16)
    rate, ch, bits, got = decode_wav(encode_wav(16000, s))
    assert (rate, ch, bits) == (16000, 1, 16)
    np.testing.assert_array_equal(got, s)


def test_wav_chunk_walk():
    """Parser walks chunks, not fixed offsets: LIST before data."""
    import struct

    s = np.array([1, -2, 3], dtype=np.int16)
    base = encode_wav(8000, s)
    # splice a LIST chunk between fmt and data
    head, data_chunk = base[:36], base[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    rate, _, _, got = decode_wav(head + extra + data_chunk)
    assert rate == 8000
    np.testing.assert_array_equal(got, s)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"OggS....")


# -------------------------------------------------- end-to-end decode


def test_decode_media_matches_formulas(codec_assets):
    out = decode_media(codec_assets).toPandas().sort_values("asset_id")
    assert len(out) == 48
    assert out["decode_ok"].all()
    assert "payload" not in out.columns
    for _, r in out.iterrows():
        i = int(r["asset_id"])
        if i % 3:
            w, h = _img_dims(i)
            assert (r["mime"], r["width"], r["height"]) == ("image/ppm", w, h)
            assert r["channels"] == 3
            x = np.arange(w, dtype=np.int64)[None, :, None]
            y = np.arange(h, dtype=np.int64)[:, None, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            assert r["checksum"] == int(((x * 31 + y * 17 + i + c * 7) % 256).sum())
        else:
            rate, ns = _wav_params(i)
            assert (r["mime"], r["sample_rate"], r["n_samples"]) == (
                "audio/wav", rate, ns,
            )
            assert r["channels"] == 1
            j = np.arange(ns, dtype=np.int64)
            assert r["checksum"] == int((((j * 7 + i * 13) % 4096) - 2048).sum())


def test_decode_media_corrupt_payload_is_flagged_not_fatal(spark):
    rows = [
        (0, "image/ppm", bytearray(b"not a ppm at all"), {}),
        (1, "video/mp4", bytearray(b"\x00\x00"), {}),  # unknown mime
        (2, "image/ppm", None, {}),
    ]
    df = spark.createDataFrame(rows, schema=ASSET_SCHEMA)
    out = decode_media(df).toPandas().sort_values("asset_id")
    assert not out["decode_ok"].any()
    assert (out["checksum"] == 0).all()


def test_decode_image_real_histogram(codec_assets):
    """fake=False really decodes PPM payloads: unit-L1 histograms for
    image rows, decode_ok=false for the (non-PPM) audio rows."""
    out = decode_image(codec_assets, fake=False).toPandas()
    img = out[out["mime"] == "image/ppm"]
    aud = out[out["mime"] == "audio/wav"]
    assert img["decode_ok"].all() and not aud["decode_ok"].any()
    for f in img["features"]:
        arr = np.array(f)
        assert arr.shape == (IMAGE_FEATURE_DIM,)
        np.testing.assert_allclose(arr.sum(), 1.0, rtol=1e-9)


def test_resize_stub_metadata(assets):
    out = resize_stub(assets, 224, 224).toPandas()
    meta = out["meta"].iloc[0]
    assert meta["resize_w"] == "224"
    assert meta["resize_h"] == "224"


def test_frame_sample_explodes(assets):
    out = frame_sample_stub(assets, every_n=4).toPandas()
    assert len(out) > 64  # 1→N rows
    assert "payload" not in out.columns
    assert out["frame_hash"].str.len().eq(64).all()


def test_decode_media_stereo_frames_not_samples(spark):
    """A 2-channel WAV reports frames and channels, never the
    interleaved sample count masquerading as mono."""
    import struct

    import numpy as np

    from hdfe_spark.operators.multimodal import decode_media

    frames = 100
    s = np.arange(frames * 2, dtype=np.int16)  # interleaved stereo
    data = s.tobytes()
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame(
        [(0, "audio/wav", bytearray(payload), {})], schema=ASSET_SCHEMA
    )
    r = decode_media(df).toPandas().iloc[0]
    assert bool(r["decode_ok"])
    assert r["channels"] == 2
    assert r["n_samples"] == frames


def test_resize_images_real(spark, codec_assets):
    """Real NN resize: resampled raster equals the numpy reference on
    a known formula image; payload re-encodes as a valid PPM."""
    import numpy as np

    from hdfe_spark.operators.multimodal import (
        decode_ppm,
        resize_images,
    )

    out = resize_images(codec_assets, 8, 6).toPandas().set_index("asset_id")
    # asset 1 is an image: w=4+(1%29)=5, h=4+(3%23)=7
    row = out.loc[1]
    assert row["resize_ok"] and (row["width"], row["height"]) == (8, 6)
    w2, h2, px2 = decode_ppm(bytes(row["payload"]))
    assert (w2, h2) == (8, 6)
    w, h = 5, 7
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    src = ((x * 31 + y * 17 + 1 + c * 7) % 256).astype(np.uint8)
    ix = (np.arange(8, dtype=np.int64) * w) // 8
    iy = (np.arange(6, dtype=np.int64) * h) // 6
    want = src[iy[:, None], ix[None, :], :]
    assert (px2 == want).all()
    assert row["checksum"] == int(want.astype(np.int64).sum())
    # audio rows pass through with resize_ok=false
    assert not out.loc[0, "resize_ok"] and out.loc[0, "payload"] is None


def test_audio_features_bands_and_parseval(spark):
    """band_share must partition the spectral energy (sums to 1),
    parseval_ratio must be 1 to float precision on every asset, and
    a corrupt payload must degrade to decode_ok=false, not raise."""
    import pyspark.sql.functions as F

    from hdfe_spark.operators.multimodal import (
        audio_features,
        make_codec_assets,
    )

    assets = make_codec_assets(spark, n=48).filter(
        F.col("mime") == "audio/wav"
    )
    rows = audio_features(assets, n_bands=4).collect()
    assert len(rows) == 16  # every third asset is audio
    for r in rows:
        assert r["decode_ok"]
        assert r["time_energy"] > 0
        assert abs(r["parseval_ratio"] - 1.0) < 1e-9
        assert len(r["band_share"]) == 4
        assert abs(sum(r["band_share"]) - 1.0) < 1e-9
        assert all(b >= 0 for b in r["band_share"])

    corrupt = spark.createDataFrame(
        [(999, "audio/wav", bytearray(b"not a wav"), {})],
        assets.schema,
    )
    bad = audio_features(corrupt).collect()
    assert len(bad) == 1 and not bad[0]["decode_ok"]


def test_pvid_roundtrip_exact():
    import numpy as np

    from hdfe_spark.operators.multimodal import decode_pvid, encode_pvid

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(5, 7, 6, 3)).astype("uint8")
    n, w, h, back = decode_pvid(encode_pvid(6, 7, frames))
    assert (n, w, h) == (5, 6, 7)
    assert (back == frames).all()


def test_pvid_rejects_garbage():
    import pytest

    from hdfe_spark.operators.multimodal import decode_pvid, encode_pvid
    import numpy as np

    with pytest.raises(ValueError):
        decode_pvid(b"nope" + b"\0" * 32)
    good = encode_pvid(2, 2, np.zeros((1, 2, 2, 3), dtype="uint8"))
    with pytest.raises(ValueError):
        decode_pvid(good[:-1])  # truncated raster


def test_sample_frames_every_n_and_sums(spark):
    import numpy as np

    from hdfe_spark.operators.multimodal import (
        ASSET_SCHEMA,
        encode_pvid,
        sample_frames,
    )

    frames = np.arange(4 * 2 * 3 * 3, dtype=np.uint8).reshape(4, 2, 3, 3)
    df = spark.createDataFrame(
        [(7, "video/pvid", bytearray(encode_pvid(3, 2, frames)), {})],
        schema=ASSET_SCHEMA,
    )
    rows = {r.frame_idx: r for r in sample_frames(df, every_n=3).collect()}
    assert set(rows) == {0, 3}
    for fi, r in rows.items():
        assert (r.width, r.height) == (3, 2)
        assert r.pix_sum == int(frames[fi].astype("int64").sum())
