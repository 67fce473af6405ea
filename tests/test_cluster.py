"""Fixed-iteration Lloyd's k-means: textbook-iteration equivalence on
a driver-side numpy replica, determinism, and edge contracts."""

import numpy as np
import pytest

from hdfe_spark.operators.cluster import kmeans_fixed


def _numpy_lloyd(pts, k, n_iter):
    cents = pts[:k].astype(float).copy()
    for _ in range(n_iter):
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin ties -> lowest index
        for j in range(k):
            sel = pts[assign == j]
            if len(sel):
                # exact fixed-point means, like the operator
                cents[j] = (
                    np.round(sel * 1e6).sum(axis=0) / len(sel) / 1e6
                )
    d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), cents


def test_kmeans_matches_numpy_lloyd(spark):
    rng = np.random.default_rng(5)
    blob = np.concatenate(
        [
            rng.normal((0, 0), 0.5, (60, 2)),
            rng.normal((5, 5), 0.5, (60, 2)),
            rng.normal((0, 8), 0.5, (60, 2)),
        ]
    )
    blob = np.round(blob, 6)
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(blob)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out, cents = kmeans_fixed(df, ["x", "y"], k=3, n_iter=4,
                              order_cols=["id"])
    want_assign, want_cents = _numpy_lloyd(blob, 3, 4)
    got = out.orderBy("id").select("cluster").toPandas()["cluster"]
    assert (got.to_numpy() == want_assign).all()
    assert np.allclose(np.array(cents), want_cents, rtol=1e-9)


def test_kmeans_separates_obvious_blobs(spark):
    rows = [(i, 0.0 + i * 0.01, 0.0) for i in range(10)]
    rows += [(100 + i, 100.0 + i * 0.01, 0.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out, cents = kmeans_fixed(df, ["x", "y"], k=2, n_iter=3,
                              order_cols=["id"])
    pdf = out.toPandas()
    left = set(pdf[pdf.x < 50]["cluster"])
    right = set(pdf[pdf.x >= 50]["cluster"])
    assert left == {0} and right == {1}
    assert cents[0][0] == pytest.approx(0.045)
    assert cents[1][0] == pytest.approx(100.045)


def test_kmeans_raises_when_k_exceeds_rows(spark):
    df = spark.createDataFrame([(1, 1.0, 1.0)], "id long, x double, y double")
    with pytest.raises(ValueError, match="only 1 rows"):
        kmeans_fixed(df, ["x", "y"], k=3, n_iter=1, order_cols=["id"])


def test_kmeans_excludes_null_features(spark):
    rows = [(1, 1.0, 1.0), (2, None, 2.0), (3, 5.0, 5.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out, _ = kmeans_fixed(df, ["x", "y"], k=2, n_iter=2, order_cols=["id"])
    assert out.count() == 2
