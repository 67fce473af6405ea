"""Z-order layout: Morton-key correctness and the file-level
min/max-tightness property that parquet data skipping needs."""

import pyspark.sql.functions as F

from hdfe_spark.sources.zorder import write_zordered, zorder_bucket, zvalue


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zvalue_matches_python_morton(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zvalue([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton(r["x"], r["y"], 8), (r["x"], r["y"])


def test_zorder_bucket_is_stable_and_clamped(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (999.0,)], "v double")
    got = [
        r["b"]
        for r in df.select(zorder_bucket(F.col("v"), 0, 100, bits=8).alias("b"))
        .collect()
    ]
    assert got[0] == 0 and got[1] == 0          # clamped low
    assert got[3] == 255 and got[4] == 255      # clamped high
    assert 0 < got[2] < 255


def test_zordered_files_are_tight_in_both_dims(spark, tmp_path):
    """After a z-ordered write, each parquet file's (x, y) bounding box
    covers a small fraction of the domain — the property min/max
    skipping exploits. A single-column sort would leave the OTHER
    dimension's per-file range at ~full domain."""
    n, side = 4096, 64  # 64×64 grid
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    z = zvalue([F.col("x"), F.col("y")], bits=6)
    path = str(tmp_path / "zord")
    write_zordered(df, path, z, n_files=16)

    boxes = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        )
        .collect()
    )
    assert len(boxes) >= 8
    domain = float(side * side)
    areas = [(r["x1"] - r["x0"] + 1) * (r["y1"] - r["y0"] + 1) / domain for r in boxes]
    # every file covers a LOCAL tile, not a full-domain stripe
    assert max(areas) <= 0.5
    assert sum(areas) / len(areas) <= 0.25

    # data-skipping effect: a 16×16 corner query intersects few boxes
    hit = [
        r for r in boxes
        if r["x1"] >= 0 and r["x0"] <= 15 and r["y1"] >= 0 and r["y0"] <= 15
    ]
    assert len(hit) <= max(2, len(boxes) // 4)
