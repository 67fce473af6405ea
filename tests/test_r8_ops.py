"""Round-8 operator tests: general-k PCA (exact Gram moments +
driver eigh) against numpy on the fixture, consistency with the
closed-form pca2 certificate."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdfe_spark.operators.stats import pca, pca2


def _fixture_matrix(spark, sf_dir, cols):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pdf = li.select(*cols).dropna().toPandas()
    return pdf.to_numpy(dtype=float)


COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_pca_k4_matches_numpy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = pca(li, COLS).collect()
    assert [r["component"] for r in out] == [1, 2, 3, 4]

    X = _fixture_matrix(spark, sf_dir, COLS)
    # replicate the operator's quantization so the comparison is of
    # the eigensolve, not the fixed-point rounding
    Xq = np.round(X * 1e6)
    C = np.cov(Xq, rowvar=False, ddof=1)
    ev = np.sort(np.linalg.eigvalsh(C))[::-1] / 1e12
    got = np.array([r["eigenvalue"] for r in out])
    assert np.allclose(got, ev, rtol=1e-9)

    tot = ev.sum()
    assert np.allclose(
        [r["var_explained"] for r in out], ev / tot, rtol=1e-9
    )
    # loadings: orthonormal, sign-pinned (largest-|loading| positive)
    V = np.array([[r[f"v_{c}"] for c in COLS] for r in out]).T
    assert np.allclose(V.T @ V, np.eye(4), atol=1e-9)
    for j in range(4):
        pin = int(np.argmax(np.abs(V[:, j])))
        assert V[pin, j] > 0.0
    # eigen-equation holds against the numpy covariance (residual
    # relative to the spectral scale — C entries are ~1e20 in
    # fixed-point units, so absolute tolerances are meaningless)
    spectral = float(np.abs(ev).max()) * 1e12
    for j in range(4):
        lam = got[j] * 1e12
        resid = np.linalg.norm(C @ V[:, j] - lam * V[:, j])
        assert resid <= 1e-9 * spectral


def test_pca_k2_agrees_with_pca2(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    r2 = pca2(li, "l_quantity", "l_extendedprice").collect()[0]
    rk = pca(li, ["l_quantity", "l_extendedprice"]).collect()
    assert rk[0]["eigenvalue"] == pytest.approx(r2["lambda1"], rel=1e-9)
    assert rk[1]["eigenvalue"] == pytest.approx(r2["lambda2"], rel=1e-9)
    assert rk[0]["var_explained"] == pytest.approx(
        r2["var_explained"], rel=1e-9
    )
    # pca2 pins v1x >= 0; pca pins the dominant loading positive —
    # same axis up to sign, so compare |cosine| of the two vectors
    v_closed = np.array([r2["v1x"], r2["v1y"]])
    v_gen = np.array(
        [rk[0]["v_l_quantity"], rk[0]["v_l_extendedprice"]]
    )
    assert abs(float(v_closed @ v_gen)) == pytest.approx(1.0, abs=1e-9)


def test_pca_guards(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    with pytest.raises(ValueError, match=">= 2 col"):
        pca(df, ["a"])
    with pytest.raises(ValueError, match=">= 2 complete rows"):
        pca(df, ["a", "b"]).collect()
    const = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 1.0)], "a double, b double"
    )
    with pytest.raises(ValueError, match="degenerate"):
        pca(const, ["a", "b"])
