"""Deterministic sampling / splitting for training-data curation.

Beyond-reference surface: a 100 TB corpus pipeline needs per-source
quotas ("keep 10k docs per domain") and stable train/val/test splits
that never move a document between splits across runs, machines, or
engines. Random `sample()` gives neither: it is seed- and
partitioning-dependent. Both operators here key on a CONTENT hash
(md5 of the id rendered as text) — the same function exists in every
engine, so the selection is reproducible anywhere, including the
DuckDB oracles.

Scale notes: `stratified_sample` is one window shuffle keyed by the
stratum (the same cost class as any grouped op); rank is computed by
per-partition heaps only when a `limit` compiles that way — here
every stratum keeps n rows, so the window is the right plan.
`split_by_hash` is a pure projection + filter: no shuffle at all,
runs inside the scan's codegen stage, and pushes down to parquet
when the hash column is pre-materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(col: Column) -> Column:
    """Engine-portable deterministic pseudo-random order key: the md5
    hex digest of the value rendered as a string. (xxhash64 would be
    cheaper but exists only in Spark — md5 keeps the selection
    reproducible in any SQL engine, which is what makes the split
    auditable.)"""
    return F.md5(col.cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic ``n_per_stratum``-row sample per stratum:
    rows ranked by md5(id) within each stratum, the n smallest win.
    Same input ⇒ same sample, on any engine, any partitioning."""
    w = Window.partitionBy(strata_col).orderBy(
        _hash_key(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


# 4-hex-digit thresholds: 0x10000 buckets over the md5 prefix.
def _below_threshold(prefix: Column, fraction: float) -> Column:
    """``bucket(prefix) < fraction·0x10000`` as a portable hex-string
    compare. fraction ≥ 1.0 is always-true — a clamped 'ffff'
    threshold would strand the ~1/65536 of ids whose prefix IS 'ffff'
    outside a split whose upper bound is 1.0."""
    bucket = int(fraction * 0x10000)
    if bucket >= 0x10000:
        return F.lit(True)
    return prefix < F.lit(format(bucket, "04x"))


def split_by_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Label every row train/val/test by its md5(id) prefix bucket
    (65536 buckets): ``[0, train)`` → train, ``[train, train+val)`` →
    val, rest → test. A document's split NEVER changes when the corpus
    grows or repartitions — the property random splits lack — and the
    same expression reproduces the assignment in any engine. Pure
    narrow projection: no shuffle, stays in whole-stage codegen."""
    prefix = F.substring(_hash_key(F.col(id_col)), 1, 4)
    return df.withColumn(
        split_col,
        F.when(_below_threshold(prefix, train), F.lit("train"))
        .when(_below_threshold(prefix, train + val), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def _aes_key(id_col: str, weight_col: str) -> Column:
    """The Efraimidis-Spirakis key ln(u)/w with u from the Knuth
    multiplicative hash of the id — spelled ONCE and shared by
    `weighted_sample` and `weighted_sample_by`, whose documented
    contract is that their selections are bit-identical per group;
    two hand-copied expression blocks could silently drift."""
    h = F.pmod(
        F.pmod(F.col(id_col), F.lit(1 << 31)) * F.lit(2654435761),
        F.lit(1 << 32),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    return F.ln(u) / F.col(weight_col)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``k`` rows
    — inclusion probability proportional to ``weight_col`` — via the
    Efraimidis-Spirakis A-ES keys (IPL 2006, public): each row gets
    ``key = ln(u) / w`` for a uniform ``u``, the k LARGEST keys win
    (equivalent to the textbook ``u^(1/w)`` top-k, one monotone map
    away, minus the pow).

    ``u`` comes from a Knuth multiplicative hash of the id — integer
    arithmetic any engine reproduces bit-for-bit (same portability
    trick as ``_hash_key``; a real RNG would make the sample
    irreproducible across engines AND across retried Spark tasks,
    which is how silently-divergent training sets happen). The id is
    reduced mod 2^31 BEFORE the multiply so the product stays inside
    int64 on every engine (a raw ``id * 2654435761`` wraps silently
    in Spark's non-ANSI mode for ids above ~3.5e9 while DuckDB raises
    on the overflow — the bit-for-bit claim would be false exactly
    where it matters). Requires a numeric id column. Rows with
    non-positive weight are excluded (their key is undefined).

    Plan: narrow projection + ``TakeOrderedAndProject`` (per-partition
    top-k heaps, k-row driver merge) — no global sort, no shuffle of
    the corpus. At 100 TB this is the sampling primitive for
    quality-weighted corpus mixing."""
    key = _aes_key(id_col, weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", F.round(key, 10))
        .orderBy(F.col("es_key").desc(), F.col(id_col))
        .limit(k)
    )


# Poisson(1) CDF quantized to 16 bits, hex-encoded: a 4-hex md5
# prefix compares lexicographically = numerically, so the weight
# lookup is pure string CASE logic any engine reproduces bit-for-bit.
_POISSON_HEX = [
    (0, "5e2d"), (1, "bc5a"), (2, "eb71"), (3, "fb23"),
    (4, "ff10"), (5, "ffd9"), (6, "fffa"),
]


def _poisson_weight(id_col: Column, rep: int) -> Column:
    h = F.substring(
        F.md5(F.concat_ws("#", id_col.cast("string"), F.lit(str(rep)))),
        1,
        4,
    )
    expr = F.lit(7)  # tail mass beyond the table (~9e-5) caps at 7
    for k, hx in reversed(_POISSON_HEX):
        expr = F.when(h < F.lit(hx), F.lit(k)).otherwise(expr)
    return expr


def poisson_bootstrap_means(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_reps: int = 16,
    scale: float = 1e6,
) -> DataFrame:
    """Deterministic Poisson bootstrap of the mean: replicate r
    reweights every row by an iid-ish Poisson(1) draw keyed on
    ``md5(id#r)`` and takes the weighted mean — the standard
    single-pass distributed bootstrap (resampling n-out-of-n is a
    multinomial; Poisson(1) approximates it without coordination,
    and the hash key makes every draw reproducible on ANY engine:
    no RNG state, no partition order).

    ONE aggregation scan computes all ``n_reps`` replicates as
    2*n_reps map-side-combined expressions (never an explode — a
    row-amplifying join would be B x the corpus at 100 TB); the
    replicate means use exact fixed-point value sums, so each mean
    is one deterministic IEEE division. The caller takes replicate
    quantiles for the CI.

    Returns ``n_reps`` rows: replicate, n_eff (total drawn weight),
    mean. NULL values are excluded; the Poisson table is quantized
    to 16 bits with the >6 tail capped at 7 (bias ~1e-4, documented
    — this is a certificate-friendly PSEUDO-bootstrap by design).
    """
    idc = F.col(id_col)
    u = F.round(F.col(value_col) * scale).cast("decimal(38,0)")
    aggs = []
    for r in range(n_reps):
        w = _poisson_weight(idc, r)
        aggs.append(F.sum(w).cast("long").alias(f"w_{r}"))
        aggs.append(
            F.sum(w.cast("decimal(38,0)") * u).alias(f"wy_{r}")
        )
    m = (
        df.filter(F.col(value_col).isNotNull())
        .agg(*aggs)
        .collect()[0]
    )
    rows = []
    for r in range(n_reps):
        n_eff = int(m[f"w_{r}"] or 0)  # sum() over 0 rows is NULL
        if n_eff == 0:
            raise ValueError(
                f"bootstrap replicate {r} drew total weight 0 "
                "(input too small for a Poisson bootstrap)"
            )
        mean = float(m[f"wy_{r}"]) / float(n_eff) / scale
        rows.append((r, n_eff, mean))
    return df.sparkSession.createDataFrame(
        rows, "replicate int, n_eff long, mean double"
    )


def weighted_sample_by(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group `weighted_sample`: a deterministic weighted
    without-replacement sample of ``k`` rows from EVERY group —
    quality-weighted corpus mixing with a per-source quota (the
    global sampler can't guarantee per-source representation; the
    grouped one is the standard source-mixing primitive). Identical
    A-ES key construction (Knuth-hash uniform from the id, key =
    ln(u)/w, k largest win), so the selection is bit-reproducible
    on any engine and any partitioning; rows with non-positive
    weight are excluded, groups with fewer than k positive-weight
    rows return what they have, and a NULL group is itself a group
    (the `hll_by` convention).

    Plan: ONE group-partitioned window pass (rank over es_key DESC,
    id ASC — parallel across groups, never a global sort; the
    global sampler's TakeOrderedAndProject has no grouped analogue,
    so the window IS the scale path here). Returns the input rows
    plus ``es_key``.
    """
    if k < 1:
        raise ValueError("weighted_sample_by: k must be >= 1")
    key = _aes_key(id_col, weight_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("es_key").desc(), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", F.round(key, 10))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
