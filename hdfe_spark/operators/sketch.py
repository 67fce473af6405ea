"""Heavy-hitter detection: distributed Misra-Gries candidate pruning
with an exact verification pass.

Beyond-reference surface (the reference engine has no sketch/streaming
summary operators); sibling of the engine's other sketches
(`approx_count_distinct` / `approx_percentile` in the registry), but
with EXACT output: returns precisely the keys whose global frequency
satisfies ``cnt * s >= n``, with exact counts.

Why not just ``groupBy(key).count()``? At 100 TB with a heavy-tailed
key universe (tokens, URLs, user ids) the full aggregation shuffles
every distinct key. Misra-Gries (1982) per partition keeps only ``k``
counters; the merged-summary form (Agarwal et al., "Mergeable
Summaries", PODS'12) has undercount error <= n_i/(k+1), so a key
ABSENT from partition i's summary has true local count <= n_i/(k+1),
and a key absent from every summary has global count
<= n/(k+1) < n/s for k = s. The candidate union therefore contains
every qualifying key (no false negatives); the exact pass then counts
ONLY candidates via a broadcast semi-join, bounding the wide shuffle
by ``n_partitions * k`` keys instead of the key universe.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition merged Misra-Gries summaries, unioned (NOT
    merged across partitions — the union keeps the no-false-negative
    guarantee and stays distributed). Returns distinct candidate
    keys, at most ``k`` per partition.

    Vectorized: each Arrow batch contributes a ``value_counts`` (C
    speed), merged into the running summary with the mergeable-
    summaries rule — add counts, then subtract the (k+1)-th largest
    and clip at zero whenever more than k counters survive. No
    per-row Python."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            bc = pdf[key_col].value_counts()
            counters = counters.add(bc, fill_value=0) if len(counters) else bc
            if len(counters) > k:
                thresh = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > thresh] - thresh
        yield pd.DataFrame({key_col: counters.index})

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} {df.schema[key_col].dataType.simpleString()}"
    ).distinct()


def heavy_hitters(df: DataFrame, key_col: str, s: int) -> DataFrame:
    """Exactly the keys with ``cnt * s >= n`` (overflow-safe integer
    threshold — no float), with exact counts.

    Plan: one narrow Misra-Gries scan (Arrow ``mapInPandas``, k = s
    counters per partition), a broadcast semi-join of the input
    against the candidate set, an exact count of candidates only, and
    a broadcast 1-row total for the threshold filter. Any key meeting
    the threshold has cnt >= n/s > n/(s+1), so it survives the
    candidate stage (docstring above) and the output is exact."""
    cand = misra_gries_candidates(df, key_col, k=s)
    total = df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    counts = (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(s) >= F.col("__n"))
        .select(key_col, "cnt")
    )


def cms_build(df: DataFrame, key_col: str, d: int = 4, n_hex: int = 2) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a key
    stream: ``d`` rows of ``16**n_hex`` counters. Hash j of a key is
    the first ``n_hex`` hex chars of ``md5(key || '#' || j)`` — the
    engine-portable md5 trick the feature hasher uses, so any SQL
    engine reproduces the sketch bit-for-bit (the driver oracle
    does). Returns (j, bucket, cnt): d × 16^n_hex rows, built by one
    explode + one hash aggregation with map-side combine — the
    sketch is mergeable across partitions/streams by bucket-wise add.
    """
    js = F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j")
    rows = df.select(F.col(key_col).alias("__k"), js)
    bucket = F.substring(
        F.md5(F.concat_ws("#", F.col("__k"), F.col("j"))), 1, n_hex
    )
    return (
        rows.select("j", bucket.alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, keys: DataFrame, key_col: str, d: int = 4, n_hex: int = 2
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a ``cms_build``
    sketch: min over the d hashed counters. Never underestimates
    (each counter >= the key's true count); overestimate is bounded
    by colliding mass, E[err] <= n/16^n_hex per row. Broadcast-sized
    joins: the sketch is d × 16^n_hex rows."""
    js = F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j")
    probes = keys.select(F.col(key_col), js).withColumn(
        "bucket",
        F.substring(F.md5(F.concat_ws("#", F.col(key_col), F.col("j"))), 1, n_hex),
    )
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def hll_distinct(
    df: DataFrame, key_col: str, b: int = 8
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count sketch (Flajolet et
    al. 2007) whose EVERY intermediate value is an exact integer —
    so a SQL oracle reproduces the estimate bit-for-bit, unlike
    Spark's own ``approx_count_distinct`` (private HLL++ seed/impl).

    Hash = md5 of the key rendered as a string (cross-engine stable,
    the `minhash` convention). Bucket = first ``b/4`` hex chars
    (``m = 2**b`` buckets); rank source = the NEXT 8 hex chars as a
    32-bit integer v, rho = (33 - bitlength(v)), v=0 -> 33. The
    harmonic-mean denominator sum(2^-M_j) is scaled by 2^33 so every
    term 2^(33 - M_j) is an exact BIGINT (M_j in [1, 33], 2^32 max;
    m buckets keep the sum far under 2^63); EMPTY buckets contribute
    2^33 each via one (m - seen) multiply — no bucket spine needed.
    The final estimate alpha_m * m^2 * 2^33 / S is the only float
    arithmetic: a fixed IEEE expression of integers, spelled
    identically in the oracle (alpha_m's defining expression
    0.7213/(1 + 1.079/m) is written out, never a rounded literal).
    No small-range linear-counting correction: ln() is libm and
    engines may disagree in the last ulp — the raw-estimate contract
    is exact-replicable instead, and n_empty is emitted so a caller
    can apply their own correction.

    Returns ONE row: (m, n_exact, n_empty, s33, est, rel_err) —
    n_exact (an exact count_distinct riding the same scan group) and
    rel_err = (est - n_exact)/n_exact make the row its own accuracy
    certificate (expected |rel_err| ~ 1.04/sqrt(m) ~ 6.5% at b=8).
    Empty (or all-NULL-key) input yields the defined all-empty-sketch
    row — n_exact = 0, n_empty = m, s33 = m * 2^33, est = alpha * m —
    with rel_err NULL (undefined at n_exact = 0), never NULL sums.

    Scale: the sketch itself is ONE map-side-combinable aggregation
    over m counters — at 100 TB the shuffle is m rows, not the key
    universe (drop n_exact/rel_err there: the exact count is the
    expensive half and exists here only as the certificate).
    """
    return _hll_rollup(df, key_col, b, group_cols=[])


def _hll_bucket_rho(key_col: str, b: int):
    """The deterministic HLL hash pipeline, spelled once: md5 of the
    key's string rendering -> bucket = first b/4 hex chars, rho =
    33 - bitlength of the next 8 hex chars (v=0 -> 33). Shared by
    `_hll_rollup` (batch, global and grouped) and
    `streaming.ops.streaming_hll` (the per-bucket MAX fold), so the
    bit-exact cross-engine contract has exactly one spelling."""
    hx = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(hx, 1, b // 4), 16, 10).cast("long")
    v32 = F.conv(F.substring(hx, b // 4 + 1, 8), 16, 10).cast("long")
    rho = F.when(v32 == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(v32))
    )
    return bucket, rho


def _hll_alpha(m: int):
    """alpha_m's defining expression 0.7213/(1 + 1.079/m), spelled
    once (never a rounded literal) — shared by `_hll_rollup` and
    `hll_finalize` so the estimate arithmetic cannot drift."""
    return F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))


def hll_finalize(bucket_table: DataFrame, b: int = 8) -> DataFrame:
    """Finalize a (``__bkt``, ``__mx``) per-bucket max-rho table —
    e.g. the `streaming_hll` sink after any number of micro-batches —
    into the sketch estimate row (m, n_empty, s33, est). The s33 /
    est arithmetic is the `hll_distinct` spelling exactly (exact
    integer sum scaled by 2^33; one IEEE division at the end); there
    is no n_exact/rel_err certificate here because a stream cannot
    carry the exact count_distinct the batch sketch rides for free.
    Scale: the input is at most m = 2**b rows — this is driver-cheap
    by construction."""
    if b % 4 != 0 or not 4 <= b <= 16:
        raise ValueError("b must be a multiple of 4 in [4, 16]")
    m = 1 << b
    two33 = F.lit(8589934592)  # 2^33
    agg = bucket_table.groupBy().agg(
        F.count(F.lit(1)).alias("__seen"),
        F.coalesce(
            F.sum(
                F.expr(
                    "shiftleft(cast(1 as bigint), cast(33 - __mx as int))"
                )
            ),
            F.lit(0).cast("long"),
        ).alias("__s_seen"),
        F.coalesce(F.max("__bkt"), F.lit(0)).alias("__maxb"),
        F.coalesce(F.min("__bkt"), F.lit(0)).alias("__minb"),
        F.coalesce(F.min("__mx"), F.lit(1)).alias("__minx"),
        F.coalesce(F.max("__mx"), F.lit(33)).alias("__maxx"),
        F.count_distinct(F.col("__bkt")).alias("__nbkt"),
        F.count(F.col("__mx")).alias("__nmx"),
    )
    # a table built at a different b (or with duplicate bucket rows)
    # would otherwise produce a silently-negative n_empty and a wrong
    # s33/est — raise loudly instead (ADVICE r9). assert_true returns
    # NULL when the check passes, so riding it into s33 via
    # coalesce(...,0) keeps the guard in the executed plan (a
    # dropped helper column would be pruned by Catalyst).
    # review r10: also reject negative buckets and NULL __mx rows —
    # both passed the first guard while silently corrupting
    # n_empty / s33 (min/max aggregates skip NULLs)
    guard = F.assert_true(
        (F.col("__maxb") < F.lit(m))
        & (F.col("__minb") >= F.lit(0))
        & (F.col("__minx") >= F.lit(1))
        & (F.col("__maxx") <= F.lit(33))
        & (F.col("__nbkt") == F.col("__seen"))
        & (F.col("__nmx") == F.col("__seen")),
        F.concat(
            F.lit(
                f"hll_finalize: bucket table inconsistent with b={b}"
                f" (m={m}): max __bkt="
            ),
            F.col("__maxb").cast("string"),
            F.lit(", __mx range ["),
            F.col("__minx").cast("string"),
            F.lit(", "),
            F.col("__maxx").cast("string"),
            F.lit("], rows/distinct buckets "),
            F.col("__seen").cast("string"),
            F.lit("/"),
            F.col("__nbkt").cast("string"),
        ),
    )
    s33 = (
        F.col("__s_seen")
        + (F.lit(m) - F.col("__seen")).cast("long") * two33
        + F.coalesce(guard.cast("long"), F.lit(0))
    )
    est = (
        _hll_alpha(m) * F.lit(float(m)) * F.lit(float(m)) * F.lit(8589934592.0)
    ) / s33.cast("double")
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("__seen")).cast("long").alias("n_empty"),
        s33.cast("long").alias("s33"),
        est.alias("est"),
    )


def _hll_rollup(
    df: DataFrame, key_col: str, b: int, group_cols: "list[str]"
) -> DataFrame:
    """Shared HLL core for `hll_distinct` (``group_cols=[]`` — the
    global single-row sketch) and `hll_by` (one sketch per group):
    ONE expression spelling for the md5 bucket/rho derivation, the
    two-level rollup, and the s33/est/rel_err output, so the two
    operators' bit-exact contracts can never drift apart. The
    empty-input coalesce is spelled once here too: it defines the
    global sketch's all-empty row and is a no-op per group (a group
    exists only with >= 1 seen bucket)."""
    if b % 4 != 0 or not 4 <= b <= 16:
        raise ValueError("b must be a multiple of 4 in [4, 16]")
    m = 1 << b
    bucket, rho = _hll_bucket_rho(key_col, b)
    per_bucket = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            bucket.alias("__bkt"),
            rho.alias("__rho"),
            F.col(key_col).alias("__k"),
        )
        .groupBy(*group_cols, "__bkt")
        .agg(
            F.max("__rho").alias("__mx"),
            F.count_distinct("__k").alias("__nd"),
        )
    )
    two33 = F.lit(8589934592)  # 2^33
    alpha = _hll_alpha(m)
    # coalesce: sum() over zero buckets is NULL — an empty (or
    # all-NULL-key) input must yield the defined all-empty-sketch row
    # (s33 = m * 2^33, est = alpha * m), not NULL columns
    agg = per_bucket.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__seen"),
        F.coalesce(
            F.sum(
                F.expr(
                    "shiftleft(cast(1 as bigint), cast(33 - __mx as int))"
                )
            ),
            F.lit(0).cast("long"),
        ).alias("__s_seen"),
        F.coalesce(F.sum("__nd"), F.lit(0).cast("long")).alias(
            "n_exact"
        ),
    )
    s33 = (
        F.col("__s_seen")
        + (F.lit(m) - F.col("__seen")).cast("long") * two33
    )
    est = (
        alpha * F.lit(float(m)) * F.lit(float(m)) * F.lit(8589934592.0)
    ) / s33.cast("double")
    return agg.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.lit(m) - F.col("__seen")).cast("long").alias("n_empty"),
        s33.cast("long").alias("s33"),
        est.alias("est"),
        F.when(
            F.col("n_exact") > 0,
            (est - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
        ).alias("rel_err"),
    )


def hll_by(
    df: DataFrame, group_col: str, key_col: str, b: int = 8
) -> DataFrame:
    """Per-group `hll_distinct`: one deterministic-HLL row PER GROUP
    (distinct users per day, distinct tokens per source, ...) with
    the identical bit-exact contract — every intermediate an exact
    integer, the estimate one fixed IEEE expression of integers, so
    a grouped SQL oracle reproduces every row bit-for-bit.

    Returns one row per group with >= 1 non-NULL key: (group, m,
    n_exact, n_empty, s33, est, rel_err). Groups whose every key is
    NULL are ABSENT (no group spine — same absence contract as
    `heavy_hitters`); a NULL group value is itself a group (GROUP BY
    NULL, identical on both engines). n_exact / rel_err are the
    per-group accuracy certificate, as in the global sketch.

    Scale: ONE aggregation keyed (group, bucket) — map-side
    combinable, shuffle volume <= groups x m counter rows however
    many input rows — then an m-fan-in rollup per group. At 100 TB
    drop n_exact/rel_err: the exact count_distinct is the expensive
    half and exists here only as the certificate.
    """
    return _hll_rollup(df, key_col, b, group_cols=[group_col])
