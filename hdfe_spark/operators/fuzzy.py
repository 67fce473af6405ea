"""Blocked fuzzy matching: edit-distance near-duplicates without
all-pairs comparison.

Entity-resolution / near-dup stage for short keys (titles, names,
normalized prefixes): find pairs within Levenshtein distance
``max_distance``. The naive form is an O(n²) cross join; the standard
fix is *blocking* — only pairs sharing a cheap block key are compared.

For ``max_distance=1`` the blocking here is EXACT by pigeonhole: one
edit touches either the first character or not. If not, the two
strings share their first character (same F-block); if it does, the
remainder — in particular the LAST character — is unchanged (same
L-block, for strings of length ≥ 2). So the union of first-char and
last-char blocks contains every distance-1 pair; the Levenshtein
verify then removes block collisions. (Same proof shape as the
Manku'07 pigeonhole banding used by ``simhash_neardup_pairs``; the
``fuzzy_exactness`` driver certificate checks it against brute force.)

Scale: two block-keyed self-joins (shuffle by single-char key — for
real corpora widen the key, e.g. first/last bigrams + length band,
trading recall proof for smaller blocks), codegen ``levenshtein``
verify, distinct on (id_a, id_b). A length pre-filter
(``|len(a)-len(b)| ≤ d``) prunes inside the block before the edit
distance evaluates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 1,
    prefix_len: int = 16,
) -> DataFrame:
    """Distinct id pairs (id_a < id_b) whose normalized ``prefix_len``
    character prefixes are within ``max_distance`` Levenshtein edits.
    Exact for ``max_distance=1`` (see module docstring); for larger
    distances the first/last blocking is a recall heuristic."""
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
        1,
        prefix_len,
    )
    keyed = df.select(
        F.col(id_col).alias("__id"),
        norm.alias("__s"),
        F.length(norm).alias("__len"),
    ).filter(F.col("__len") >= 2)

    blocked = keyed.select(
        "__id",
        "__s",
        "__len",
        F.explode(
            F.array(
                F.concat(F.lit("F"), F.substring("__s", 1, 1)),
                F.concat(F.lit("L"), F.col("__s").substr(F.col("__len"), F.lit(1))),
            )
        ).alias("__blk"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (
                F.abs(F.col("a.__len") - F.col("b.__len"))
                <= F.lit(max_distance)
            ),
        )
        .filter(
            F.levenshtein(F.col("a.__s"), F.col("b.__s")) <= max_distance
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.levenshtein(F.col("a.__s"), F.col("b.__s"))
            .cast("bigint")
            .alias("distance"),
        )
        .distinct()
    )
