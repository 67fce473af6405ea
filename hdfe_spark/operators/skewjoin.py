"""Salted equi-join: explicit skew mitigation for hot join keys.

When one join key holds a disproportionate share of rows (see
``operators/profile.py: key_skew_stats`` for the diagnostic), a plain
hash join sends the whole hot key to one reducer. AQE's skew-join
split (on by default in ``session.py``) handles the *sort-merge* case
at runtime; explicit salting is the declarative form that also covers
what AQE cannot touch — broadcast-ineligible skew under
shuffled-hash joins, or downstream stages that inherit the join's
partitioning.

Mechanics (the classic salting rewrite):

- the big/skewed side tags each row with a deterministic salt in
  ``[0, n_salts)`` (hash of the whole row — duplicate rows of the hot
  key spread because their non-key columns differ);
- the smaller side replicates each row to ALL salts (bounded ×n_salts
  fan-out — choose the side accordingly);
- the join runs on ``(key…, salt)``, splitting the hot key's rows
  across ``n_salts`` reducers.

The salt never appears in the output and any salt assignment yields
the same multiset of matched rows, so ``salted_join ≡ join`` exactly —
the driver certificate hash-checks that equivalence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side's rows
    salted across ``n_salts`` sub-keys. ``how`` ∈ {'inner', 'left'}
    (the forms where per-row salting preserves semantics directly)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    n = int(n_salts)
    if n <= 0:
        raise ValueError(f"n_salts must be positive, got {n}")

    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n)).cast("int")
    )
    # the generator must be the top-level expression (casting it wraps
    # it in an expression tree Spark rejects); sequence() of int
    # literals already yields int elements matching __salt's type
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    out = salted_big.join(replicated, [*on, "__salt"], how)
    return out.drop("__salt")
