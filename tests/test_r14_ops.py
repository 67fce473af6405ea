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


# ------------------------------------------------------- psm_att


def test_psm_att_matches_bruteforce(spark):
    import numpy as np

    from hdfe_spark.operators.matching import psm_att

    rng = np.random.default_rng(3)
    rows = []
    for i in range(800):
        sc = (i % 40) / 40.0
        rows.append((False, sc, float(5 * sc + rng.normal() * 0.01)))
    for i in range(200):
        sc = (i % 40) / 40.0 + (0.004 if i % 2 == 0 else 0.02)
        rows.append((True, sc, float(5 * sc + 1.0 + rng.normal() * 0.01)))
    df = spark.createDataFrame(rows, "t boolean, s double, y double")
    out = psm_att(df, "y", "t", "s").collect()[0]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["t", "s", "y"])
    c = pdf[~pdf.t].groupby("s")["y"].mean()
    cs = np.array(sorted(c.index))
    cm = c.loc[cs].to_numpy()
    terms = []
    for s, yv in zip(pdf[pdf.t].s, pdf[pdf.t].y):
        j = int(np.argmin(np.abs(cs - s)))  # first min = lower score
        terms.append(yv - cm[j])
    assert out["att"] == pytest.approx(float(np.mean(terms)), abs=1e-12)
    assert out["n_treat"] == 200 and out["n_matched"] == 200
    assert out["n_ctrl"] == 800 and out["n_unmatched"] == 0


def test_psm_att_caliper_and_empty_controls(spark):
    from hdfe_spark.operators.matching import psm_att

    df = spark.createDataFrame(
        [(False, 0.10, 1.0), (False, 0.20, 3.0),
         (True, 0.101, 5.0), (True, 0.50, 9.0)],
        "t boolean, s double, y double",
    )
    out = psm_att(df, "y", "t", "s", caliper=0.01).collect()[0]
    # the 0.101 treated matches 0.10 (dist .001); 0.50's nearest is
    # 0.20 (dist .3 > caliper) -> unmatched
    assert out["n_matched"] == 1 and out["n_unmatched"] == 1
    assert out["att"] == pytest.approx(5.0 - 1.0)
    # no controls at all -> NULL att, zero matched
    out2 = psm_att(
        df.filter("t"), "y", "t", "s"
    ).collect()[0]
    assert out2["att"] is None and out2["n_matched"] == 0
    assert out2["n_ctrl"] == 0 and out2["n_treat"] == 2


def test_psm_att_equal_distance_ties_to_lower_score(spark):
    from hdfe_spark.operators.matching import psm_att

    df = spark.createDataFrame(
        [(False, 0.0, 10.0), (False, 1.0, 20.0), (True, 0.5, 99.0)],
        "t boolean, s double, y double",
    )
    out = psm_att(df, "y", "t", "s").collect()[0]
    assert out["att"] == pytest.approx(99.0 - 10.0)  # lower score wins


# ------------------------------------------------------- msprt_by


def test_msprt_by_detects_shift_and_nulls_thin_arms(spark):
    import numpy as np

    from hdfe_spark.operators.stats import msprt_by

    rng = np.random.default_rng(7)
    rows = []
    for i in range(3000):
        seg = i % 3
        if seg == 2:
            rows.append((seg, "a", float(rng.normal())))  # b empty
        else:
            arm = "a" if i % 2 == 0 else "b"
            shift = 0.8 if (arm == "b" and seg == 0) else 0.0
            rows.append((seg, arm, float(rng.normal() + shift)))
    df = spark.createDataFrame(rows, "seg long, arm string, v double")
    out = {r["seg"]: r for r in msprt_by(
        df, "seg", "arm", "v", "a", "b", tau2=1.0
    ).collect()}
    assert out[0]["p_always"] < 0.01          # real shift -> tiny p
    assert out[1]["p_always"] > 0.05           # null segment
    assert out[1]["lam"] is not None
    assert out[2]["lam"] is None and out[2]["p_always"] is None
    assert out[2]["n_b"] == 0
    # always-valid p is bounded by 1
    assert all(
        r["p_always"] is None or r["p_always"] <= 1.0
        for r in out.values()
    )


def test_msprt_by_matches_closed_form(spark):
    import math

    from hdfe_spark.operators.stats import msprt_by

    rows = [(0, "a", float(v)) for v in (1.0, 2.0, 3.0, 4.0)] + [
        (0, "b", float(v)) for v in (2.0, 3.0, 4.0, 7.0)
    ]
    df = spark.createDataFrame(rows, "seg long, arm string, v double")
    r = msprt_by(df, "seg", "arm", "v", "a", "b", tau2=2.0).collect()[0]
    ma, mb = 2.5, 4.0
    va = sum((v - ma) ** 2 for v in (1, 2, 3, 4)) / 3
    vb = sum((v - mb) ** 2 for v in (2, 3, 4, 7)) / 3
    vv = va / 4 + vb / 4
    d = mb - ma
    lam = math.sqrt(vv / (vv + 2.0)) * math.exp(
        d * d * 2.0 / (2 * vv * (vv + 2.0))
    )
    assert r["delta"] == pytest.approx(d, rel=1e-9)
    assert r["lam"] == pytest.approx(lam, rel=1e-9)
    assert r["p_always"] == pytest.approx(min(1.0, 1.0 / lam), rel=1e-9)


# -------------------------------------------- wild_cluster_bootstrap


def test_wild_cluster_bootstrap_matches_replica(spark):
    import numpy as np

    from hdfe_spark.operators.causal import (
        _ri_multiplier,
        wild_cluster_bootstrap,
    )

    rng = np.random.default_rng(5)
    rows = []
    for g in range(25):
        ug = rng.normal() * 0.5
        for _ in range(40):
            x = float(rng.normal())
            rows.append((g, x, 0.2 * x + ug + float(rng.normal())))
    df = spark.createDataFrame(rows, "g long, x double, y double")
    out = wild_cluster_bootstrap(df, "y", "x", "g", n_boot=49).collect()[0]

    M = 1_000_003
    ux = [int(round(x * 1e6)) for _, x, _ in rows]
    uy = [int(round(y * 1e6)) for _, _, y in rows]
    n = len(rows)
    cx0, cy0 = sum(ux) // n, sum(uy) // n
    S: dict = {}
    sxx = 0
    for (g, _, _), a, b in zip(rows, ux, uy):
        S[g] = S.get(g, 0) + (a - cx0) * (b - cy0)
        sxx += (a - cx0) * (a - cx0)
    tobs = sum(S.values())
    M2 = 999_983
    hits = 1
    for b in range(49):
        pb, qb = _ri_multiplier(b, M), 7919 * (b + 1)
        tb = sum(
            (S[g] if ((g % M) * pb + (g % M2) * qb) % M < M // 2
             else -S[g])
            for g in S
        )
        hits += abs(tb) >= abs(tobs)
    assert out["p_value"] == hits / 50.0
    assert out["beta"] == pytest.approx(float(tobs) / float(sxx), rel=0)
    assert out["n_clusters"] == 25 and out["n_boot"] == 49


def test_wild_cluster_bootstrap_guards(spark):
    from hdfe_spark.operators.causal import wild_cluster_bootstrap

    one = spark.createDataFrame(
        [(1, 1.0, 2.0), (1, 2.0, 3.0)], "g long, x double, y double"
    )
    with pytest.raises(ValueError, match=">= 2 clusters"):
        wild_cluster_bootstrap(one, "y", "x", "g", n_boot=9)
    bad = spark.createDataFrame(
        [("aa", 1.0, 2.0), ("bb", 2.0, 3.0)],
        "g string, x double, y double",
    )
    with pytest.raises(ValueError, match="integer-castable"):
        wild_cluster_bootstrap(bad, "y", "x", "g", n_boot=9)


def test_streaming_msprt_equals_batch(spark, sf_dir):
    """availableNow fold == batch table exactly (additive counters),
    the 26th streaming form's defining equality."""
    from hdfe_spark.operators.stats import msprt_by
    from hdfe_spark.streaming.ops import (
        read_table_stream,
        streaming_msprt,
    )

    def shape(df):
        return df.select(
            (F.col("user_id") % 7).cast("long").alias("seg"),
            "event_type", "value",
        )

    batch = msprt_by(
        shape(spark.read.parquet(f"{sf_dir}/events.parquet")),
        "seg", "event_type", "value", "click", "view", tau2=0.5,
    ).collect()
    stream = streaming_msprt(
        shape(read_table_stream(spark, sf_dir, "events")),
        "seg", "event_type", "value", "click", "view", tau2=0.5,
    )
    import uuid

    sink = "t" + uuid.uuid4().hex[:12]
    q = (
        stream.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table(sink).collect()
    key = lambda r: r["seg"]
    assert sorted(map(tuple, got), key=lambda t: t[0]) == sorted(
        map(tuple, batch), key=lambda t: t[0]
    )


# --------------------------------------------------------- cem_att


def test_cem_att_matches_replica(spark):
    import numpy as np
    import pandas as pd

    from hdfe_spark.operators.matching import cem_att

    rng = np.random.default_rng(9)
    rows = []
    for i in range(2000):
        t = i % 4 == 0
        x1 = float(rng.normal() + (0.5 if t else 0.0))
        x2 = float(rng.uniform(0, 10))
        yv = float(2.0 * t + x1 + 0.3 * x2 + rng.normal() * 0.1)
        rows.append((t, x1, x2, yv))
    df = spark.createDataFrame(rows, "t boolean, x1 double, x2 double, y double")
    out = cem_att(df, "y", "t", ["x1", "x2"], bins=6).collect()[0]

    pdf = pd.DataFrame(rows, columns=["t", "x1", "x2", "y"])
    for c in ("x1", "x2"):
        lo, hi = pdf[c].min(), pdf[c].max()
        w = (hi - lo) / 6.0
        pdf[f"b_{c}"] = np.minimum(
            np.floor((pdf[c] - lo) / w), 5
        ).astype(int)
    g = pdf.groupby(["b_x1", "b_x2"]).apply(
        lambda s: pd.Series({
            "nt": s.t.sum(), "nc": (~s.t).sum(),
            "syt": s.y[s.t].sum(), "syc": s.y[~s.t].sum(),
        }), include_groups=False,
    )
    m = g[(g.nt > 0) & (g.nc > 0)]
    att = float((m.syt - (m.nt / m.nc) * m.syc).sum() / m.nt.sum())
    assert out["att"] == pytest.approx(att, rel=1e-10)
    assert out["n_treat_matched"] == int(m.nt.sum())
    assert out["n_ctrl_matched"] == int(m.nc.sum())
    assert out["n_strata_matched"] == len(m)
    assert out["n_treat_total"] == int(pdf.t.sum())
    # the true effect is 2.0; CEM should land near it
    assert abs(out["att"] - 2.0) < 0.2


def test_cem_att_unmatched_strata_drop(spark):
    from hdfe_spark.operators.matching import cem_att

    # controls only in low x, treated only in high x -> nothing
    # matches; att NULL
    df = spark.createDataFrame(
        [(False, 0.0, 1.0), (False, 0.1, 1.0),
         (True, 10.0, 5.0), (True, 9.9, 5.0)],
        "t boolean, x double, y double",
    )
    out = cem_att(df, "y", "t", ["x"], bins=5).collect()[0]
    assert out["att"] is None and out["n_strata_matched"] == 0
    assert out["n_treat_total"] == 2 and out["n_ctrl_total"] == 2


# ---------------------------------------------------------- att_gt


def test_att_gt_recovers_staggered_effects(spark):
    import numpy as np

    from hdfe_spark.operators.causal import att_gt

    rng = np.random.default_rng(4)
    rows = []
    # cohorts 3 and 5 adopt at t=3/5 with effects 1.0 and 2.0 from
    # adoption onward; never-treated units carry the common trend
    for u in range(600):
        cohort = [None, 3, 5][u % 3]
        for t in range(1, 8):
            base = 0.5 * t + (u % 7) * 0.1
            eff = 0.0
            if cohort is not None and t >= cohort:
                eff = 1.0 if cohort == 3 else 2.0
            rows.append(
                (u, t, cohort, float(base + eff + rng.normal() * 0.05))
            )
    df = spark.createDataFrame(
        rows, "unit long, t long, g long, y double"
    )
    out = {(r["g"], r["t"]): r for r in att_gt(
        df, "y", "t", "g"
    ).collect()}
    # cohort 3: post periods 3..7; cohort 5: 5..7
    assert set(out) == {(3, t) for t in range(3, 8)} | {
        (5, t) for t in range(5, 8)
    }
    for (g, t), r in out.items():
        truth = 1.0 if g == 3 else 2.0
        assert r["att"] == pytest.approx(truth, abs=0.05)
        assert r["n_treat"] == 200 and r["n_ctrl"] == 200


def test_att_gt_absent_cells_are_absent(spark):
    from hdfe_spark.operators.causal import att_gt

    # cohort g=2 has no t=1 observation -> no base period -> absent
    rows = [
        (1, 2, 2, 5.0), (1, 3, 2, 6.0),
        (2, 1, None, 1.0), (2, 2, None, 2.0), (2, 3, None, 3.0),
    ]
    df = spark.createDataFrame(rows, "unit long, t long, g long, y double")
    assert att_gt(df, "y", "t", "g").collect() == []


# ------------------------------------------------------ triple_diff


def test_triple_diff_matches_replica(spark):
    import numpy as np
    import pandas as pd

    from hdfe_spark.operators.causal import triple_diff

    rng = np.random.default_rng(6)
    rows = []
    for i in range(4000):
        t, p, g = bool(i % 2), bool((i // 2) % 2), bool((i // 4) % 2)
        yv = (
            1.0 * t + 0.5 * p + 0.25 * g
            + 0.8 * (t and p)                 # region-period shock
            + 2.0 * (t and p and g)           # the DDD effect
            + float(rng.normal() * 0.1)
        )
        rows.append((t, p, g, float(yv)))
    df = spark.createDataFrame(rows, "t boolean, p boolean, g boolean, y double")
    out = triple_diff(df, "y", "t", "p", "g").collect()[0]
    pdf = pd.DataFrame(rows, columns=["t", "p", "g", "y"])

    def did(sub):
        m = sub.groupby(["t", "p"])["y"].mean()
        return (m[True, True] - m[True, False]) - (
            m[False, True] - m[False, False]
        )

    ddd = did(pdf[pdf.g]) - did(pdf[~pdf.g])
    assert out["ddd"] == pytest.approx(ddd, rel=1e-12)
    assert out["ddd"] == pytest.approx(2.0, abs=0.05)
    # the contaminated plain DiD reads effect+shock; DDD removes it
    assert out["did_group"] == pytest.approx(2.8, abs=0.05)
    assert out["n_group"] + out["n_ctrlgroup"] == 4000


def test_triple_diff_empty_cell_nulls(spark):
    from hdfe_spark.operators.causal import triple_diff

    df = spark.createDataFrame(
        [(True, True, True, 1.0), (False, False, False, 2.0)],
        "t boolean, p boolean, g boolean, y double",
    )
    out = triple_diff(df, "y", "t", "p", "g").collect()[0]
    assert out["ddd"] is None


# ------------------------------------------------------- lee_bounds


def test_lee_bounds_matches_replica_and_brackets(spark):
    import numpy as np

    from hdfe_spark.operators.causal import lee_bounds

    rng = np.random.default_rng(8)
    rows = []
    for i in range(6000):
        t = i % 2 == 0
        yv = float(2.0 * t + rng.normal())
        # treated observed at 90%, control at 60% -> trim treated
        # (selection keyed on i//2 so it is independent of the
        # parity that assigns the arm)
        seen = ((i // 2) % 10) < (9 if t else 6)
        rows.append((t, yv if seen else None))
    df = spark.createDataFrame(rows, "t boolean, y double")
    out = lee_bounds(df, "y", "t").collect()[0]
    assert out["s_treat"] == pytest.approx(0.9)
    assert out["s_ctrl"] == pytest.approx(0.6)
    assert out["q_trim"] == pytest.approx(1.0 - 0.6 / 0.9, rel=1e-12)
    # replica
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["t", "y"]).dropna()
    hi = pdf[pdf.t]["y"].to_numpy()
    lo = pdf[~pdf.t]["y"].to_numpy()
    q = out["q_trim"]
    ql, qh = np.quantile(hi, [q, 1 - q], method="linear")
    low_rep = hi[hi <= qh].mean() - lo.mean()
    up_rep = hi[hi >= ql].mean() - lo.mean()
    assert out["lower"] == pytest.approx(min(low_rep, up_rep), rel=1e-9)
    assert out["upper"] == pytest.approx(max(low_rep, up_rep), rel=1e-9)
    # attrition here is independent of y, so the bounds bracket 2.0
    assert out["lower"] < 2.0 < out["upper"]
    assert out["lower"] < out["naive"] < out["upper"]


def test_lee_bounds_trims_control_when_it_selects_more(spark):
    from hdfe_spark.operators.causal import lee_bounds

    rows = []
    for i in range(2000):
        t = i % 2 == 0
        yv = float(1.0 * t + (i % 7) * 0.1)
        seen = ((i // 2) % 10) < (5 if t else 9)  # control selects more
        rows.append((t, yv if seen else None))
    df = spark.createDataFrame(rows, "t boolean, y double")
    out = lee_bounds(df, "y", "t").collect()[0]
    assert out["s_ctrl"] > out["s_treat"]
    assert out["lower"] <= out["upper"]
    # contrast is still treated - control
    assert out["naive"] > 0
