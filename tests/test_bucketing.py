"""Bucketed-layout tests: the co-located join really is shuffle-free,
and results equal the plain shuffled join."""

import pytest

import pyspark.sql.functions as F

from hdfe_spark.plans import plan_report
from hdfe_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    """Write orders + a lineitem aggregate bucketed by the join key.
    (warehouse.dir is a static conf → tables land in the default
    ./spark-warehouse; DROP TABLE removes the managed files.)"""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        n_buckets=8,
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    """With broadcast off (the 100 TB fact⋈fact regime — neither side
    fits an executor), the bucketed join plans as a sort-merge zip of
    co-located buckets: ZERO Exchange nodes."""
    lt, rt = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, lt, rt, on="o_orderkey").select(
            "o_orderkey", "o_totalprice", "qty"
        )
        rep = plan_report(out)
        assert rep["n_exchanges"] == 0  # bucket co-location: no shuffle
        assert rep["n_broadcast_exchanges"] == 0
        assert rep["n_sortmerge_joins"] == 1  # the co-located zip
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    lt, rt = bucketed
    got = (
        bucketed_join(spark, lt, rt, on="o_orderkey")
        .select("o_orderkey", "qty")
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    want = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_orderkey", "qty")
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_bucketed_groupby_skips_shuffle(spark, bucketed):
    """An aggregation keyed on the bucket column reads the layout and
    plans without an Exchange."""
    lt, _ = bucketed
    out = spark.table(lt).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert plan_report(out)["n_exchanges"] == 0


def test_external_path_bucketed_join_shuffle_free(spark, sf_dir, tmp_path):
    """The driver-query variant: EXTERNAL bucketed tables (explicit
    path, CWD-independent) keep their bucketing metadata — the join
    still plans with zero shuffle Exchanges, and re-writing the same
    table is idempotent across overwrites."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    try:
        for _ in range(2):  # overwrite must be idempotent
            write_bucketed(
                orders, "ext_orders_b", "o_orderkey", n_buckets=8,
                path=str(tmp_path / "ext_orders_b"),
            )
        write_bucketed(
            li, "ext_liagg_b", "o_orderkey", n_buckets=8,
            path=str(tmp_path / "ext_liagg_b"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = bucketed_join(spark, "ext_orders_b", "ext_liagg_b", on="o_orderkey")
            rep = plan_report(out)
            assert rep["n_exchanges"] == 0
            assert rep["n_sortmerge_joins"] == 1
            # inner join: only orders with ≥1 lineitem survive
            want = orders.join(li, "o_orderkey").count()
            assert out.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS ext_orders_b")
        spark.sql("DROP TABLE IF EXISTS ext_liagg_b")
