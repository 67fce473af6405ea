"""Design-based causal estimators: difference-in-differences and the
event-study generalization.

Beyond-reference surface on the reference's estimation theme
(``hdfe/hdfe.py:49-181``): the 2×2 DiD ATT is algebraically the
interaction coefficient of the saturated OLS
``y ~ 1 + treat + post + treat·post`` (pinned in tests against
``estimate``), but computing it as a difference of four conditional
means needs ONE map-side-combined aggregation — no Gram, no solve, no
shuffle wider than a single-row reduce. The event study is the same
contrast per period: one grouped aggregation on the period column,
one collected 2-scalar base row folded back as literals (the
``ks_2sample``/``bh_fdr`` precedent), never a join or a global sort —
at 100 TB the only shuffle is the period-keyed aggregate with
map-side partials, and only n_periods rows exist downstream of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdfe_spark.operators._guards import no_output_collision


def did(df: DataFrame, y: str, treat: str, post: str) -> DataFrame:
    """2×2 difference-in-differences.

    ``treat`` and ``post`` are boolean columns; ``y`` the outcome.
    Returns ONE row: the four cell means, the four cell counts, and
    ``att = (m_treat_post − m_treat_pre) − (m_ctrl_post − m_ctrl_pre)``.
    An empty cell leaves its mean (and the ATT) NULL rather than
    guessing. Rows where ``treat``/``post`` is NULL belong to no cell
    and are excluded from every mean — the conditional-aggregate
    convention used across the stats family.

    Means are computed as ``cast(sum, double) / count`` rather than
    ``avg`` so a DECIMAL outcome column keeps its sum EXACT (one IEEE
    division per cell) — the engine's cross-engine determinism
    discipline; a double outcome behaves like ``avg``.
    """
    t, p = F.col(treat), F.col(post)
    cells = {
        "treat_post": t & p,
        "treat_pre": t & ~p,
        "ctrl_post": ~t & p,
        "ctrl_pre": ~t & ~p,
    }
    yv = F.col(y)
    agg = df.agg(
        *[
            F.sum(F.when(c, yv)).cast("double").alias(f"s_{k}")
            for k, c in cells.items()
        ],
        *[
            F.count(F.when(c, F.lit(1))).alias(f"n_{k}")
            for k, c in cells.items()
        ],
    ).select(
        *[
            F.when(
                F.col(f"n_{k}") > 0, F.col(f"s_{k}") / F.col(f"n_{k}")
            ).alias(f"m_{k}")
            for k in cells
        ],
        *[F.col(f"n_{k}") for k in cells],
    )
    return agg.select(
        (
            (F.col("m_treat_post") - F.col("m_treat_pre"))
            - (F.col("m_ctrl_post") - F.col("m_ctrl_pre"))
        ).alias("att"),
        *[F.col(f"m_{k}") for k in cells],
        *[F.col(f"n_{k}") for k in cells],
    )


def event_study(
    df: DataFrame, y: str, treat: str, period: str, base_period
) -> DataFrame:
    """Event-study (dynamic DiD): the DiD contrast of every period
    against ``base_period``.

    One aggregation grouped on ``period`` computes the per-period
    treated/control means and counts; the base period's two means are
    collected (two scalars) and folded back as literals, so
    ``att = (m_t(k) − m_t(base)) − (m_c(k) − m_c(base))`` is a narrow
    projection over n_periods rows. The base period's own row is kept
    (its att is 0 by construction — the standard normalization).
    Raises if the base period is absent or has an empty arm: a silent
    NULL baseline would NULL every coefficient.
    """
    no_output_collision(
        "event_study", "period", period,
        ["att", "m_treat", "m_ctrl", "n_treat", "n_ctrl"],
    )
    t, yv = F.col(treat), F.col(y)
    per = df.groupBy(F.col(period)).agg(
        F.sum(F.when(t, yv)).cast("double").alias("s_treat"),
        F.sum(F.when(~t, yv)).cast("double").alias("s_ctrl"),
        F.count(F.when(t, F.lit(1))).alias("n_treat"),
        F.count(F.when(~t, F.lit(1))).alias("n_ctrl"),
    ).select(
        F.col(period),
        F.when(F.col("n_treat") > 0, F.col("s_treat") / F.col("n_treat"))
        .alias("m_treat"),
        F.when(F.col("n_ctrl") > 0, F.col("s_ctrl") / F.col("n_ctrl"))
        .alias("m_ctrl"),
        "n_treat", "n_ctrl",
    )
    base = per.where(F.col(period) == F.lit(base_period)).collect()
    if not base:
        raise ValueError(
            f"event_study: base_period {base_period!r} has no rows"
        )
    b = base[0]
    if b["m_treat"] is None or b["m_ctrl"] is None:
        raise ValueError(
            f"event_study: base_period {base_period!r} has an empty"
            " treated or control arm — pick a base with both"
        )
    return per.select(
        F.col(period),
        (
            (F.col("m_treat") - F.lit(float(b["m_treat"])))
            - (F.col("m_ctrl") - F.lit(float(b["m_ctrl"])))
        ).alias("att"),
        "m_treat", "m_ctrl", "n_treat", "n_ctrl",
    )
