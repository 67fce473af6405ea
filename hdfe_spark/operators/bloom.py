"""Bloom-filter semi-join: pre-filter a huge probe side against a
compact bit-set of the build side's keys before the real join.

The scale problem this solves: joining a 100 TB fact table against a
filtered dimension whose surviving keys are too many to broadcast as
an exact set, but whose *Bloom filter* fits in a few MB. Shipping the
filter to every probe task turns the join's shuffle from "all probe
rows" into "probe rows that might match" — the same idea as Spark's
internal runtime-filter rewrite (``bloom_filter_agg`` /
``might_contain``), which is not exposed to the public SQL/DataFrame
API; this is the declarative, engine-portable form.

Construction (classic Bloom, Bloom CACM'70):

- build side: each key hashes to ``n_hashes`` positions in an
  ``n_bits`` space (``xxhash64(key, seed)``, one seed per hash);
  positions are packed into 64-bit words by a single aggregation →
  a ``(word_idx, bits)`` table of at most ``n_bits/64`` rows — KBs,
  always broadcastable.
- probe side: ``n_hashes`` *broadcast* hash joins against that word
  table, one per hash (no shuffle, no explode/regroup cycle), each
  testing one bit. A row survives only if every bit is set.

No false negatives (every true match survives); false positives are
removed by the real join that follows, so ``bloom_semi_join`` +
``join`` ≡ plain ``join`` exactly — which is what the driver
certificate hash-checks. FPR ≈ (1 - e^(-kn/m))^k; size ``n_bits``
for the build side's expected distinct keys.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(key: Column, seed: int, n_bits: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))


def bloom_bits(
    build: DataFrame, key: str, n_bits: int = 1 << 20, n_hashes: int = 5
) -> DataFrame:
    """(word_idx, bits) Bloom bit-set of ``build[key]`` — one
    map-side-combined aggregation over ≤ n_bits/64 groups."""
    pos = F.explode(
        F.array(*[_position(F.col(key), s, n_bits) for s in range(n_hashes)])
    ).alias("__p")
    return (
        build.select(pos)
        .select(
            (F.col("__p") / 64).cast("long").alias("word_idx"),
            # F.shiftleft only takes a literal shift; the SQL form
            # accepts a column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))"
            ).alias("__b"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__b").alias("bits"))
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    build_key: str | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of ``probe`` whose ``key`` *might* be in
    ``build[build_key or key]`` (never drops a true match). Plan:
    ``n_hashes`` broadcast joins against the KB-sized bit-set table —
    zero shuffles on the probe side, whole-stage-codegen bit tests.

    The no-false-negative guarantee holds only if both sides hash the
    SAME bytes: ``xxhash64`` hashes an int 5 and a string '5'
    differently, while the equi-join that follows would cast them
    equal — a silent row-loss trap. Mismatched key dtypes therefore
    raise here instead of dropping rows."""
    bk = build_key or key
    pt, bt_ = probe.schema[key].dataType, build.schema[bk].dataType
    if pt != bt_:
        raise TypeError(
            f"bloom_semi_join key dtype mismatch: probe[{key}]={pt} vs "
            f"build[{bk}]={bt_}; xxhash64 hashes equal-but-differently-"
            "typed values to different bits, so the pre-filter could "
            "drop rows the equi-join would match. Cast one side first."
        )
    bits = bloom_bits(build, bk, n_bits, n_hashes)
    cur = probe
    conds = []
    for s in range(n_hashes):
        p = _position(F.col(key), s, n_bits)
        w, b, bt = f"__w{s}", f"__b{s}", f"__bits{s}"
        pm = f"__pm{s}"
        cur = (
            cur.withColumn(pm, (p % 64).cast("int"))
            .withColumn(w, (p / 64).cast("long"))
            .withColumn(
                b, F.expr(f"shiftleft(CAST(1 AS BIGINT), {pm})")
            )
            .join(
                F.broadcast(
                    bits.select(
                        F.col("word_idx").alias(w), F.col("bits").alias(bt)
                    )
                ),
                on=w,
                how="left",
            )
        )
        conds.append(
            F.col(bt).isNotNull()
            & (F.col(bt).bitwiseAND(F.col(b)) != 0)
        )
    keep = reduce(lambda a, c: a & c, conds)
    drop = [
        c
        for s in range(n_hashes)
        for c in (f"__w{s}", f"__b{s}", f"__bits{s}", f"__pm{s}")
    ]
    return cur.filter(keep).drop(*drop)
