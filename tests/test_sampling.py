"""Deterministic sampling/splitting: stability under repartitioning
and growth — the properties random sampling lacks."""

import pyspark.sql.functions as F

from hdfe_spark.operators.sampling import split_by_hash, stratified_sample


def test_stratified_sample_quota_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = stratified_sample(docs, "source", 5).select("doc_id").toPandas()
    b = (
        stratified_sample(docs.repartition(16), "source", 5)
        .select("doc_id")
        .toPandas()
    )
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # partitioning-proof
    counts = (
        stratified_sample(docs, "source", 5).groupBy("source").count().toPandas()
    )
    assert (counts["count"] <= 5).all()


def test_split_by_hash_stable_under_growth(spark, sf_dir):
    """A doc's split assignment must not change when the corpus
    grows — check the half corpus agrees with the full corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = split_by_hash(docs).select("doc_id", "split").toPandas()
    half = (
        split_by_hash(docs.filter(F.col("doc_id") % 2 == 0))
        .select("doc_id", "split")
        .toPandas()
    )
    merged = half.merge(full, on="doc_id", suffixes=("_half", "_full"))
    assert (merged["split_half"] == merged["split_full"]).all()
    # fractions roughly honored
    frac = full["split"].value_counts(normalize=True)
    assert 0.7 < frac.get("train", 0) < 0.9


def test_split_by_hash_no_shuffle(spark, sf_dir):
    from hdfe_spark.plans import assert_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert_plan(split_by_hash(docs), n_exchanges=0, n_python_stages=0)


def test_split_by_hash_full_coverage_at_boundary(spark):
    """train+val = 1.0 must label EVERY row, including ids whose md5
    prefix is 'ffff' (a clamped threshold used to strand ~1/65536 of
    ids in 'test')."""
    # md5('40691') = 'ffff...' — the adversarial bucket.
    df = spark.createDataFrame([(40691,), (1,), (2,)], ["doc_id"])
    got = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(df, train=0.9, val=0.1).collect()
    }
    assert got[40691] in ("train", "val")  # not stranded in test
    assert all(v in ("train", "val") for v in got.values())


def test_knuth_hash_portable_for_large_ids(spark):
    """Round-5 ADVICE: raw id*2654435761 wraps int64 silently in
    Spark (non-ANSI) above ~3.5e9 while DuckDB raises — the
    'any engine reproduces bit-for-bit' claim must hold for REAL
    corpus ids (snowflake ids are ~1e18). The mod-2^31 pre-reduction
    keeps the product in int64 on both engines."""
    import duckdb
    import pyspark.sql.functions as F

    ids = [0, 1, 7, 2**31 - 1, 2**31, 5_000_000_000, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    h = F.pmod(
        F.pmod(F.col("id"), F.lit(1 << 31)) * F.lit(2654435761),
        F.lit(1 << 32),
    )
    got = {r["id"]: r["h"] for r in df.select("id", h.alias("h")).collect()}
    con = duckdb.connect()
    for i in ids:
        want = con.execute(
            f"SELECT (({i} % 2147483648) * 2654435761) % 4294967296"
        ).fetchone()[0]
        assert got[i] == want, (i, got[i], want)


def test_poisson_bootstrap_matches_hashlib_replica(spark):
    import hashlib

    import pytest

    import numpy as np

    from hdfe_spark.operators.sampling import poisson_bootstrap_means

    th = [(0, "5e2d"), (1, "bc5a"), (2, "eb71"), (3, "fb23"),
          (4, "ff10"), (5, "ffd9"), (6, "fffa")]

    def weight(i, r):
        h = hashlib.md5(f"{i}#{r}".encode()).hexdigest()[:4]
        for k, hx in th:
            if h < hx:
                return k
        return 7

    vals = {i: round(float(i % 37) * 0.25, 6) for i in range(400)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vals.items()], "id long, v double"
    )
    got = {
        r["replicate"]: r
        for r in poisson_bootstrap_means(df, "id", "v", n_reps=4).collect()
    }
    for rep in range(4):
        ws = np.array([weight(i, rep) for i in vals])
        ys = np.array([round(vals[i] * 1e6) for i in vals])
        n_eff = int(ws.sum())
        mean = float((ws * ys).sum()) / n_eff / 1e6
        assert got[rep]["n_eff"] == n_eff
        assert got[rep]["mean"] == pytest.approx(mean, rel=1e-12)


def test_poisson_bootstrap_weight_mean_near_one(spark):
    from pyspark.sql import functions as F

    from hdfe_spark.operators.sampling import _poisson_weight

    df = spark.range(0, 20000).select(
        _poisson_weight(F.col("id"), 0).alias("w")
    )
    m = df.agg(F.avg("w"), F.max("w")).collect()[0]
    assert 0.97 < m[0] < 1.03  # Poisson(1) mean
    assert m[1] <= 7


def test_poisson_bootstrap_ci_covers_true_mean(spark):
    import numpy as np

    from hdfe_spark.operators.sampling import poisson_bootstrap_means

    rng = np.random.default_rng(4)
    v = np.round(rng.normal(10.0, 2.0, 5000), 6)
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(v)], "id long, v double"
    )
    means = np.array([
        r["mean"]
        for r in poisson_bootstrap_means(df, "id", "v", n_reps=16).collect()
    ])
    lo, hi = np.percentile(means, [2.5, 97.5])
    assert lo < v.mean() < hi
    # replicate spread ~ standard error of the mean
    se = v.std(ddof=1) / np.sqrt(len(v))
    assert 0.3 * se < means.std(ddof=1) < 3 * se
