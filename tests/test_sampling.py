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
