"""Blocked fuzzy matching: pigeonhole exactness for distance 1 on
synthetic edits and on the documents fixture vs brute force."""

import pyspark.sql.functions as F

from hdfe_spark.operators.fuzzy import fuzzy_pairs


def test_fuzzy_pairs_catches_every_edit_position(spark):
    rows = [
        (1, "martin"),
        (2, "artin"),     # first-char deletion  -> d=1
        (3, "martln"),    # middle substitution  -> d=1
        (4, "martix"),    # last-char subst      -> d=1
        (5, "xartin"),    # first-char subst     -> d=1
        (6, "zzzzzz"),    # unrelated
        (7, "mrtln"),     # d=2 from martin, but d=1 from martln (3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs(df, max_distance=1, prefix_len=16).collect()
    }
    assert {(1, 2), (1, 3), (1, 4), (1, 5), (3, 7)} <= got
    assert (1, 7) not in got  # d=2 excluded
    assert all(6 not in p for p in got)


def test_fuzzy_pairs_equals_brute_force_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs(docs, prefix_len=16).collect()
    }
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), 1, 16
    )
    k = docs.select(F.col("doc_id").alias("id"), norm.alias("s")).filter(
        F.length("s") >= 1
    )
    a, b = k.alias("a"), k.alias("b")
    want = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(F.levenshtein(F.col("a.s"), F.col("b.s")) <= 1)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_fuzzy_blocking_skew_drops_vs_single_char(spark, sf_dir):
    """The round-4 watch item: single first/last-char blocks meant
    ~26-70 blocks with hot-block skew. The (gram, length) keys must
    cut the largest block's population share."""
    from hdfe_spark.operators.fuzzy import _block_keys

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), 1, 16
    )
    keyed = docs.select(norm.alias("__s"), F.length(norm).alias("__len")).filter(
        F.col("__len") >= 2
    )
    n = keyed.count()
    new_max = (
        keyed.select(F.explode(_block_keys(1)).alias("b"))
        .groupBy("b").count().agg(F.max("count")).collect()[0][0]
    )
    old_max = (
        keyed.select(F.substring("__s", 1, 1).alias("b"))
        .groupBy("b").count().agg(F.max("count")).collect()[0][0]
    )
    assert new_max < old_max  # strictly smaller hottest block
    assert new_max <= max(0.2 * n, 50)  # no block holds a fifth of the corpus


def test_fuzzy_pairs_length_one_strings(spark):
    """The m=1 pigeonhole hole (round-5 ADVICE): two length-1 strings
    at distance 1 differ in EVERY gram block, and a (1,2)-length pair
    can too. The gram-less GL length-band block must catch both."""
    rows = [
        (1, "a"),
        (2, "b"),      # d('a','b') = 1: every gram differs
        (3, "ab"),     # d('a','ab') = 1
        (4, "xb"),     # d('b','xb') = 1 (prepend)
        (5, "zzzz"),   # unrelated, longer
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs(df, max_distance=1, prefix_len=16).collect()
    }
    assert {(1, 2), (1, 3), (2, 4), (3, 4)} <= got
    assert all(5 not in p for p in got)
    # empty strings stay excluded by contract
    df2 = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, " ")], "doc_id long, text string"
    )
    got2 = fuzzy_pairs(df2, max_distance=1, prefix_len=16).collect()
    assert got2 == []
