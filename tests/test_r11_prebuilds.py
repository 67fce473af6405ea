"""Round-11 pre-builds (registry queries deferred): the log-rank
test and rank-1 ALS. Expectations are independent Python replicas
mirroring the operators' documented IEEE op sequences."""

import pytest
from pyspark.sql import functions as F


def _logrank_replica(rows, a="a"):
    # rows: (t, d, g)
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])  # ca cb da db
    for t, d, g in rows:
        c = cells[t]
        if g == a:
            c[0] += 1
            c[2] += d
        else:
            c[1] += 1
            c[3] += d
    n_a = sum(c[0] for c in cells.values())
    n_b = sum(c[1] for c in cells.values())
    o1, e1, v = 0, 0.0, 0.0
    seen_a = seen_b = 0
    for t in sorted(cells):
        ca, cb, da, db = cells[t]
        n1, n2 = n_a - seen_a, n_b - seen_b
        seen_a += ca
        seen_b += cb
        dt = da + db
        if dt == 0:
            continue
        nt = n1 + n2
        o1 += da
        e1 = e1 + float(dt * n1) / float(nt)
        if nt > 1:
            v = v + (
                float(dt * n1) / float(nt)
                * (float(n2) / float(nt))
                * (float(nt - dt) / float(nt - 1))
            )
    chi2 = (float(o1) - e1) ** 2 / v
    return n_a, n_b, o1, e1, v, chi2


def test_logrank_matches_replica(spark):
    from hdfe_spark.operators.stats import logrank_test

    rows = [
        (1, 1, "a"), (2, 1, "a"), (2, 0, "a"), (4, 1, "a"), (5, 0, "a"),
        (1, 1, "b"), (1, 1, "b"), (3, 1, "b"), (3, 0, "b"), (6, 1, "b"),
        (2, 1, "b"),
    ]
    df = spark.createDataFrame(rows, "t long, d long, g string")
    r = logrank_test(df, "t", "d", "g", "a", "b").collect()[0]
    n_a, n_b, o1, e1, v, chi2 = _logrank_replica(rows)
    assert (r["n_a"], r["n_b"], r["o1"]) == (n_a, n_b, o1)
    assert r["e1"] == e1
    assert r["v"] == v
    assert r["chi2"] == chi2


def test_logrank_identical_groups_chi2_small(spark):
    from hdfe_spark.operators.stats import logrank_test

    rows = [(t, 1, g) for g in ("a", "b") for t in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "t long, d long, g string")
    r = logrank_test(df, "t", "d", "g", "a", "b").collect()[0]
    assert r["chi2"] == 0.0  # perfectly balanced risk sets


def test_logrank_null_event_raises(spark):
    from hdfe_spark.operators.stats import logrank_test

    df = spark.createDataFrame(
        [(1, None, "a"), (2, 1, "b")], "t long, d long, g string"
    )
    with pytest.raises(Exception, match="cannot be placed"):
        logrank_test(df, "t", "d", "g", "a", "b")


def test_logrank_empty_group_raises(spark):
    from hdfe_spark.operators.stats import logrank_test

    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "a")], "t long, d long, g string"
    )
    with pytest.raises(ValueError, match="empty group"):
        logrank_test(df, "t", "d", "g", "a", "b")


def _half_up(x):
    # Spark F.round on doubles is HALF_UP; Python round() is
    # banker's — the house replica convention is floor(x + 0.5)
    # (review r10c finding; same as test_r10_prebuilds)
    import math

    return math.floor(x + 0.5)


def _als_replica(rows, rscale=100, qbits=20):
    from collections import defaultdict

    qs = float(1 << qbits)
    by_u = defaultdict(list)
    for u, i, r in rows:
        by_u[u].append(_half_up(r * rscale))
    U = {
        u: _half_up(
            qs * float(sum(rqs)) / (float(rscale) * float(len(rqs)))
        )
        for u, rqs in by_u.items()
    }
    num = defaultdict(int)
    den = defaultdict(int)
    cnt = defaultdict(int)
    for u, i, r in rows:
        rq = _half_up(r * rscale)
        num[i] += rq * U[u]
        den[i] += U[u] * U[u]
        cnt[i] += 1
    out = {}
    for i in num:
        v = (
            float(num[i]) * qs / (float(rscale) * float(den[i]))
            if den[i] > 0
            else None
        )
        out[i] = (cnt[i], v)
    return out


def test_als_rank1_matches_replica(spark):
    from hdfe_spark.operators.ml import als_rank1

    rows = [
        (1, 10, 4.5), (1, 11, 3.0), (2, 10, 5.0), (2, 12, 2.5),
        (3, 11, 1.0), (3, 12, 4.0), (4, 10, 3.5),
    ]
    df = spark.createDataFrame(rows, "u long, i long, r double")
    got = {
        r["i"]: (r["n_ratings"], r["v"])
        for r in als_rank1(df, "u", "i", "r").collect()
    }
    assert got == _als_replica(rows)


def test_als_rank1_zero_factor_users_give_null_v(spark):
    from hdfe_spark.operators.ml import als_rank1

    # the only rater of item 20 has mean rating 0 -> U = 0 -> den 0
    rows = [(1, 20, 0.0), (2, 21, 2.0)]
    df = spark.createDataFrame(rows, "u long, i long, r double")
    got = {r["i"]: r["v"] for r in als_rank1(df, "u", "i", "r").collect()}
    assert got[20] is None
    # single rater: v = r / u = r / mean = 1.0 (ALS normalizes by
    # u^2 — the projection coefficient, not the mean)
    assert got[21] == 1.0


def test_als_rank1_power_iteration_separates_blocks(spark):
    from hdfe_spark.operators.ml import als_rank1

    # ASYMMETRIC blocks (review r10c: a symmetric fixture makes
    # every user mean equal, so separation was impossible and the
    # old test vacuous): heavy raters 1-2 (mean 3.5) love items
    # 10-11; light raters 3-4 (mean 1.5) love items 20-21. After
    # one alternation the items loved by the heavy block must
    # score strictly higher.
    rows = []
    for u in (1, 2):
        rows += [(u, 10, 5.0), (u, 11, 5.0), (u, 20, 1.0), (u, 21, 1.0)]
    for u in (3, 4):
        rows += [(u, 10, 1.0), (u, 11, 1.0), (u, 20, 2.0), (u, 21, 2.0)]
    df = spark.createDataFrame(rows, "u long, i long, r double")
    got = {r["i"]: r["v"] for r in als_rank1(df, "u", "i", "r").collect()}
    assert all(v is not None for v in got.values())
    assert got[10] == got[11] and got[20] == got[21]
    assert got[10] > got[20]
