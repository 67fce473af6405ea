"""Collinearity detection tests — reference golden cases
(``tests/test_multicollinearity_funcs.py:10-29``, doctests at
``hdfe/multicollinearity.py:66-71,118-121``) plus the randomized
exact-linear-combination fixture from FIXTURES.md F3.
"""

import numpy as np
import pandas as pd
import pytest

from hdfe_spark.operators.collinearity import (
    find_collinear_cols,
    find_collinear_cols_gram,
    gram_matrix,
    remove_collinear_cols,
)


def test_gram_matrix(spark):
    rng = np.random.RandomState(3)
    X = rng.randn(200, 3)
    Y = rng.randn(200, 2)
    df = spark.createDataFrame(
        pd.DataFrame(np.hstack([X, Y]), columns=["x0", "x1", "x2", "y0", "y1"])
    )
    G, Xty, n = gram_matrix(df, ["x0", "x1", "x2"], ["y0", "y1"])
    assert n == 200
    np.testing.assert_allclose(G, X.T @ X, rtol=1e-10)
    np.testing.assert_allclose(Xty, X.T @ Y, rtol=1e-10)


def test_rank1_golden(spark):
    # Reference doctest: x = [[1,1],[0,0]] → collinear [1], keep [0]
    # (hdfe/multicollinearity.py:66-71)
    df = spark.createDataFrame(
        pd.DataFrame({"a": [1.0, 0.0], "b": [1.0, 0.0]})
    )
    collinear, keep = find_collinear_cols(df, ["a", "b"])
    assert collinear == ["b"]
    assert keep == ["a"]


def test_full_rank_detected(spark):
    rng = np.random.RandomState(4)
    df = spark.createDataFrame(
        pd.DataFrame(rng.randn(100, 3), columns=["a", "b", "c"])
    )
    collinear, keep = find_collinear_cols(df, ["a", "b", "c"])
    assert collinear == []
    assert keep == ["a", "b", "c"]


def test_exact_linear_combination(spark):
    # FIXTURES.md F3: col j an exact combination of cols {0,1}
    rng = np.random.RandomState(5)
    X = rng.randn(300, 4)
    X[:, 3] = 2.0 * X[:, 0] + 3.0 * X[:, 1]
    df = spark.createDataFrame(pd.DataFrame(X, columns=["a", "b", "c", "d"]))
    collinear, keep = find_collinear_cols(df, ["a", "b", "c", "d"])
    assert collinear == ["d"]  # earlier columns win
    assert keep == ["a", "b", "c"]


def test_remove_collinear_cols(spark):
    rng = np.random.RandomState(6)
    X = rng.randn(100, 3)
    pdf = pd.DataFrame(X, columns=["a", "b", "c"])
    pdf["dup"] = pdf["a"]  # exact duplicate
    pdf["other"] = 1  # non-X column must survive
    df = spark.createDataFrame(pdf)
    out, keep = remove_collinear_cols(df, ["a", "b", "c", "dup"])
    assert keep == ["a", "b", "c"]
    assert "dup" not in out.columns
    assert "other" in out.columns


def test_gram_scan_matches_reference_shape():
    # Local-matrix scan on a 2x2 rank-1 Gram (reference golden)
    X = np.array([[1.0, 1.0], [0.0, 0.0]])
    G = X.T @ X
    collinear, keep = find_collinear_cols_gram(G)
    assert (collinear, keep) == ([1], [0])
