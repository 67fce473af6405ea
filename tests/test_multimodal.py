"""Multimodal plumbing tests — schema contract, mapInPandas decode
stage (deterministic fake), 1→N frame sampling."""

import numpy as np
import pytest

from hdfe_spark.operators.multimodal import (
    ASSET_SCHEMA,
    IMAGE_FEATURE_DIM,
    decode_image,
    frame_sample_stub,
    make_fake_assets,
    resize_stub,
)


@pytest.fixture(scope="module")
def assets(spark):
    return make_fake_assets(spark, n=64).persist()


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


def test_decode_real_raises(assets):
    with pytest.raises(Exception):
        decode_image(assets, fake=False).count()


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
