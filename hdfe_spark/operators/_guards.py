"""Shared input-contract guards for grouped operators.

Two recurring hazards when an operator re-emits a caller column
next to FIXED output names (advice r12, generalizing the review-r11
``chi2_gof_by`` fix):

- a group/query column named like a fixed output yields duplicate
  column names and AMBIGUOUS_REFERENCE errors downstream — raise at
  build time instead (`no_output_collision`);
- a column name interpolated raw into ``F.expr(...)`` breaks or
  misparses on non-identifier names (spaces, hyphens, reserved
  words) — backtick-quote it (`quote_ident`).
"""

from __future__ import annotations

from typing import Sequence


def no_output_collision(
    op_name: str, role: str, name: str, fixed: Sequence[str]
) -> None:
    """Raise if the caller's ``name`` (their group/query/out column)
    collides with one of the operator's ``fixed`` output columns.
    ``role`` is the parameter name for the error message."""
    if name in fixed:
        raise ValueError(
            f"{op_name}: {role} {name!r} collides with a fixed"
            f" output column ({'/'.join(fixed)}) — rename it"
            " upstream"
        )


def no_inplace_overwrite(
    op_name: str, out_col: str, columns: Sequence[str]
) -> None:
    """Raise if a transform's ``out_col`` already names an input
    column — ``withColumn`` would silently REPLACE the caller's data
    instead of appending a result."""
    if out_col in columns:
        raise ValueError(
            f"{op_name}: out_col {out_col!r} already exists in the"
            " input — the transform would silently replace it; pick"
            " a fresh name"
        )


def quote_ident(name: str) -> str:
    """Backtick-quote a column name for safe interpolation into an
    ``F.expr`` SQL fragment (embedded backticks escaped by doubling
    — the Spark identifier convention), so names with spaces,
    hyphens, or reserved words parse like the ``F.col`` discipline
    used everywhere else."""
    return "`" + name.replace("`", "``") + "`"
