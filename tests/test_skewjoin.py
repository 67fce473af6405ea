"""Salted join: exact equivalence to the plain join (inner + left),
salt spreading of a hot key, and argument validation."""

import pyspark.sql.functions as F
import pytest

from hdfe_spark.operators.skewjoin import salted_join


def _key_counts(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_salted_inner_equals_plain(spark):
    # hot key 7 carries half the big side
    big = spark.range(0, 4000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 7 ELSE id % 50 END AS k", "id AS v"
    )
    small = spark.range(0, 50).selectExpr("id AS k", "id * 10 AS dim")
    got = _key_counts(salted_join(big, small, "k", n_salts=8), ["k", "v", "dim"])
    want = _key_counts(big.join(small, "k"), ["k", "v", "dim"])
    assert got == want


def test_salted_left_keeps_unmatched(spark):
    big = spark.range(0, 100).selectExpr("id AS k", "id AS v")
    small = spark.range(0, 30).selectExpr("id AS k", "id AS dim")
    got = _key_counts(
        salted_join(big, small, "k", n_salts=4, how="left"), ["k", "v", "dim"]
    )
    want = _key_counts(big.join(small, "k", "left"), ["k", "v", "dim"])
    assert got == want


def test_salt_spreads_hot_key(spark):
    """The hot key's rows land on several distinct salts."""
    big = spark.range(0, 1000).selectExpr("7 AS k", "id AS v")
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(8)).cast("int")
    )
    n_salts_used = salted.select("__salt").distinct().count()
    assert n_salts_used >= 6  # 1000 distinct rows over 8 salts


def test_salted_join_validates(spark):
    df = spark.range(1).selectExpr("id AS k")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", n_salts=0)
