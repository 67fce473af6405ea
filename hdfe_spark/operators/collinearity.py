"""Multicollinearity detection & repair via distributed Gram + local QR.

Reference parity: ``find_collinear_cols`` / ``remove_collinear_cols`` /
``remove_cols_from_csc`` (``hdfe/multicollinearity.py:8-138``).

Algorithm (same as the reference, re-based onto the Gram):

1. Compute ``G = X'X`` (k×k). The reference already uses this trick
   for non-square X (``hdfe/multicollinearity.py:75-78``); here the
   Gram is the *only* data-sized computation and it is one distributed
   aggregation — ``k(k+1)/2`` sum-of-products expressions with
   map-side partial aggregation, one shuffle of k×k partials, nothing
   collected but the k×k result.
2. Driver-side: rank of G; if deficient, QR of G and scan the R
   diagonal in column order against ``tol``
   (``hdfe/multicollinearity.py:86-101``). Columns of G carry exactly
   the same linear dependencies as columns of X (``Gv=0 ⟺ Xv=0``), so
   the scan identifies the same minimal collinear set; earlier columns
   win, so the caller must fix a deterministic column order
   (SURVEY.md §7.4 risk 4) — we use the caller's list order.
3. Repair = column pruning: ``df.select(keep)`` — a no-op for the
   scan (Catalyst prunes), unlike the reference's CSC splicing
   (``hdfe/multicollinearity.py:8-47``) which exists only because a
   global CSC matrix must be physically edited.

Note on tolerance: the reference applies ``tol=1e-12`` to R's diagonal
from a QR of X; we apply it to R from a QR of G = X'X, whose pivots
are (roughly) squared/rescaled. Exact linear dependence produces
pivots at rounding level (~1e-16·‖G‖) either way; for *near*
collinearity pass an explicit tol scaled to your data.
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    df: DataFrame,
    x_cols: Sequence[str],
    y_cols: Sequence[str] | None = None,
) -> tuple[np.ndarray, np.ndarray | None, int]:
    """One-pass distributed ``(X'X, X'y, n)``.

    Returns ``(G, Xty, n)`` with ``G`` k×k and ``Xty`` k×m (None when
    ``y_cols`` is None). Single ``agg`` — Catalyst fuses all
    sum-of-products into one whole-stage-codegen'd partial aggregate;
    only k(k+1)/2 + k·m + 1 doubles cross the network per partition.
    """
    x_cols = list(x_cols)
    y_cols = list(y_cols) if y_cols else []
    k, m = len(x_cols), len(y_cols)

    exprs = [F.count(F.lit(1)).alias("__n")]
    for i in range(k):
        for j in range(i, k):
            exprs.append(
                F.sum(F.col(x_cols[i]) * F.col(x_cols[j])).alias(f"__g_{i}_{j}")
            )
    for i in range(k):
        for j in range(m):
            exprs.append(
                F.sum(F.col(x_cols[i]) * F.col(y_cols[j])).alias(f"__xy_{i}_{j}")
            )
    row = df.agg(*exprs).collect()[0]

    G = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            v = row[f"__g_{i}_{j}"]
            G[i, j] = G[j, i] = 0.0 if v is None else float(v)
    Xty = None
    if m:
        Xty = np.zeros((k, m))
        for i in range(k):
            for j in range(m):
                v = row[f"__xy_{i}_{j}"]
                Xty[i, j] = 0.0 if v is None else float(v)
    return G, Xty, int(row["__n"])


def find_collinear_cols_gram(
    G: np.ndarray, tol: float = 1e-9, verbose: bool = False
) -> tuple[list[int], list[int]]:
    """QR-diagonal scan on a (driver-side) Gram matrix — the algorithm
    of ``hdfe/multicollinearity.py:75-108`` applied to G.

    Returns ``(collinear_idx, non_collinear_idx)``; earlier columns
    are preferentially kept.
    """
    k = G.shape[1]
    rank = int(np.linalg.matrix_rank(G))
    if rank == k:
        if verbose:
            print("Full rank")
        return [], list(range(k))

    _, r = np.linalg.qr(G)
    scale = max(abs(r[0, 0]), 1.0)
    collinear: list[int] = []
    keep: list[int] = []
    row = 0
    for col in range(k):
        if row >= r.shape[0]:
            collinear += list(range(col, k))
            break
        if abs(r[row, col]) < tol * scale:
            collinear.append(col)
        else:
            keep.append(col)
            row += 1
    if len(keep) != rank:
        warnings.warn(f"Rank is {rank}, but {len(keep)} columns kept.")
    if verbose:
        print("Number collinear", len(collinear))
    return collinear, keep


def find_collinear_cols(
    df: DataFrame,
    x_cols: Sequence[str],
    tol: float = 1e-9,
    verbose: bool = False,
) -> tuple[list[str], list[str]]:
    """Distributed form of ``find_collinear_cols``
    (``hdfe/multicollinearity.py:50-108``): one Gram pass + local scan.
    Returns ``(collinear_names, non_collinear_names)``.
    """
    x_cols = list(x_cols)
    G, _, _ = gram_matrix(df, x_cols)
    ci, ki = find_collinear_cols_gram(G, tol=tol, verbose=verbose)
    return [x_cols[i] for i in ci], [x_cols[i] for i in ki]


def remove_collinear_cols(
    df: DataFrame,
    x_cols: Sequence[str],
    tol: float = 1e-9,
    verbose: bool = False,
) -> tuple[DataFrame, list[str]]:
    """Distributed form of ``remove_collinear_cols``
    (``hdfe/multicollinearity.py:111-138``): prune a minimal collinear
    subset. Returns ``(df_without_them, kept_x_cols)``; non-X columns
    are preserved.
    """
    collinear, keep = find_collinear_cols(df, x_cols, tol=tol, verbose=verbose)
    if not collinear:
        return df, keep
    other = [c for c in df.columns if c not in set(collinear)]
    return df.select(*other), keep
