"""Propensity-score matching: nearest-neighbor ATT, distributed.

Beyond-reference surface on the reference's estimation theme
(``hdfe/hdfe.py:49-181``): matching is the third classical
identification strategy beside weighting (`ipw_ate`/`aipw_ate`) and
regression (`estimate`/`dml_plm`). The expensive step — every
treated unit's nearest control in propensity-score space — is a 1-D
nearest-neighbor problem, which at 100 TB must NOT become a global
``ORDER BY`` window (single-task WindowExec) or an all-pairs join.
Here it is the `rank.py` range-partition layout: compress both arms
to their DISTINCT-SCORE tables, range-partition the merged score
axis, resolve prev/next control within each sorted partition, and
stitch partition boundaries with an n_partitions-row driver exchange
— the `prefix_sum` phase structure with "last non-null carry"
instead of a running total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hdfe_spark.operators.rank import _pid, _pinned_sorted


def psm_att(
    df: DataFrame,
    y: str,
    treat: str,
    score: str,
    caliper: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Average treatment effect on the treated by 1-nearest-neighbor
    propensity-score matching WITH replacement, for a KNOWN/estimated
    propensity ``score`` column (the `ipw_ate` convention — this
    operator does not fit one).

    Semantics (deterministic, oracle-replayable): controls sharing
    one exact score value collapse to that score's mean outcome
    (ties at distance 0 thus average — the kernel-at-zero
    convention); each treated unit matches the control SCORE nearest
    its own, equal-distance ties to the LOWER score; ``att`` is the
    treated-mean of ``y − ȳ_ctrl(matched)``. With ``caliper``,
    treated units whose nearest control is farther than the caliper
    stay unmatched and drop from the ATT (reported in
    ``n_unmatched``).

    Scale: both arms compress to distinct-score tables first (one
    groupBy each — matching cost then scales with |distinct scores|,
    not rows; near-continuous fitted scores should be rounded
    upstream, which is also what a caliper design implies). The
    merged axis is range-partitioned and locally sorted
    (`rank._pinned_sorted`); previous/next control per treated score
    resolve with partition-LOCAL windows plus an
    n_partitions-row boundary exchange through the driver — no
    global-order window, no cross join, no per-pair work.

    Returns one row:
    (att, n_treat, n_matched, n_unmatched, n_ctrl).
    """
    t = F.col(treat)
    s = F.col(score)
    yv = F.col(y)
    dtypes = dict(df.dtypes)
    valid = t.isNotNull() & s.isNotNull() & yv.isNotNull()
    for c in (score, y):
        if dtypes.get(c) in ("double", "float"):
            valid = valid & ~F.isnan(F.col(c))
    base = df.filter(valid)

    ctrl = base.filter(~t).groupBy(s.alias("__s")).agg(
        F.count(F.lit(1)).alias("__cn"),
        (F.sum(yv).cast("double") / F.count(F.lit(1))).alias("__cm"),
    )
    trt = base.filter(t).groupBy(s.alias("__s")).agg(
        F.count(F.lit(1)).alias("__tn"),
        F.sum(yv).cast("double").alias("__ts"),
    )
    merged = ctrl.select(
        "__s", F.lit(0).alias("__side"), "__cm",
        F.col("__cn"),
        F.lit(None).cast("long").alias("__tn"),
        F.lit(None).cast("double").alias("__ts"),
    ).unionByName(
        trt.select(
            "__s", F.lit(1).alias("__side"),
            F.lit(None).cast("double").alias("__cm"),
            F.lit(None).cast("long").alias("__cn"),
            "__tn", "__ts",
        )
    )

    # Phase 1: range-partition + local sort over (score, side) —
    # side 0 (control) before side 1 (treated) at an exactly-shared
    # score, so a distance-0 control is the prev match.
    pinned = _pinned_sorted(merged, ["__s", "__side"], num_partitions)
    pid = _pid().alias("__pid")

    # Phase 2: per-partition boundary controls -> driver
    # (n_partitions rows): the LAST control at-or-below each
    # partition (prev carry) and the FIRST control above (next
    # carry). max_by/min_by skip rows whose key is NULL (treated).
    ctrl_s = F.when(F.col("__side") == 0, F.col("__s"))
    brows = sorted(
        (r["__pid"], r["ls"], r["lm"], r["fs"], r["fm"], r["nc"])
        for r in pinned.select(
            pid, F.col("__s"), F.col("__side"), F.col("__cm"),
            F.col("__cn"),
        ).groupBy("__pid").agg(
            F.max(ctrl_s).alias("ls"),
            F.expr(
                "max_by(__cm, CASE WHEN __side = 0 THEN __s END)"
            ).alias("lm"),
            F.min(ctrl_s).alias("fs"),
            F.expr(
                "min_by(__cm, CASE WHEN __side = 0 THEN __s END)"
            ).alias("fm"),
            # total control rows ride the boundary collect for free
            # (one pass instead of a second ctrl aggregation)
            F.coalesce(F.sum("__cn"), F.lit(0)).alias("nc"),
        ).collect()
    )
    n_ctrl = int(sum(r[5] for r in brows))
    bounds = [r[:5] for r in brows]
    prev_carry: dict = {}
    last = (None, None)
    for p, ls, lm, fs, fm in bounds:
        prev_carry[p] = last
        if ls is not None:
            last = (ls, lm)
    next_carry: dict = {}
    nxt = (None, None)
    for p, ls, lm, fs, fm in reversed(bounds):
        next_carry[p] = nxt
        if fs is not None:
            nxt = (fs, fm)
    spark = df.sparkSession
    s_type = dict(merged.dtypes)["__s"]
    carry = F.broadcast(
        spark.createDataFrame(
            [
                (p, prev_carry[p][0], prev_carry[p][1],
                 next_carry[p][0], next_carry[p][1])
                for p, *_ in bounds
            ],
            f"__pid long, __pbs {s_type}, __pbm double,"
            f" __nbs {s_type}, __nbm double",
        )
    )

    # Phase 3: partition-LOCAL prev/next windows (parallel — each
    # frame bounded by one range partition), stitched with the
    # broadcast carries.
    wp = (
        Window.partitionBy("__pid")
        .orderBy("__s", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("__pid")
        .orderBy("__s", "__side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    cs = F.when(F.col("__side") == 0, F.col("__s"))
    cm = F.when(F.col("__side") == 0, F.col("__cm"))
    local = (
        pinned.withColumn("__pid", _pid())
        .join(carry, "__pid")
        .select(
            "*",
            F.coalesce(
                F.last(cs, ignorenulls=True).over(wp), F.col("__pbs")
            ).alias("__ps"),
            F.coalesce(
                F.last(cm, ignorenulls=True).over(wp), F.col("__pbm")
            ).alias("__pm"),
            F.coalesce(
                F.first(cs, ignorenulls=True).over(wn), F.col("__nbs")
            ).alias("__ns"),
            F.coalesce(
                F.first(cm, ignorenulls=True).over(wn), F.col("__nbm")
            ).alias("__nm"),
        )
        .filter(F.col("__side") == 1)
    )
    dp = F.col("__s").cast("double") - F.col("__ps").cast("double")
    dn = F.col("__ns").cast("double") - F.col("__s").cast("double")
    use_prev = F.col("__ps").isNotNull() & (
        F.col("__ns").isNull() | (dp <= dn)
    )
    m = F.when(use_prev, F.col("__pm")).otherwise(F.col("__nm"))
    dist = F.when(use_prev, dp).otherwise(dn)
    if caliper is not None:
        m = F.when(dist <= F.lit(float(caliper)), m)
    matched = local.select(
        F.col("__tn"), F.col("__ts"), m.alias("__m")
    )
    agg = matched.agg(
        F.sum("__tn").alias("n_treat"),
        F.sum(F.when(F.col("__m").isNotNull(), F.col("__tn"))).alias(
            "n_matched"
        ),
        F.sum(F.when(F.col("__m").isNotNull(), F.col("__ts"))).alias(
            "__ts_m"
        ),
        F.sum(
            F.when(
                F.col("__m").isNotNull(),
                F.col("__tn").cast("double") * F.col("__m"),
            )
        ).alias("__cs_m"),
    )
    nm = F.coalesce(F.col("n_matched"), F.lit(0))
    return agg.select(
        F.when(
            nm > 0,
            (F.col("__ts_m") - F.col("__cs_m")) / nm.cast("double"),
        ).alias("att"),
        F.coalesce(F.col("n_treat"), F.lit(0)).cast("long")
        .alias("n_treat"),
        nm.cast("long").alias("n_matched"),
        (F.coalesce(F.col("n_treat"), F.lit(0)) - nm).cast("long")
        .alias("n_unmatched"),
        F.lit(n_ctrl).cast("long").alias("n_ctrl"),
    )


def cem_att(
    df: DataFrame,
    y: str,
    treat: str,
    covariates: "list[str]",
    bins: int = 10,
) -> DataFrame:
    """Coarsened exact matching ATT (Iacus–King–Porro 2012) — the
    stratified counterpart of `psm_att`: covariates are coarsened
    onto fixed-width bins, units match EXACTLY on the joint bin
    signature (a stratum), strata missing either arm are pruned, and
    controls are reweighted within strata to the treated
    distribution: ``att = (1/M_t) Σ_s [Σy_t(s) − (n_t(s)/n_c(s))·
    Σy_c(s)]``.

    Scale: one min/max pre-pass (2k scalars — the bin edges fold as
    literals, identical IEEE arithmetic on any engine), then ONE
    groupBy on the joint bin signature (map-side partials) and a
    strata-sized final reduce. No join, no window, no driver-side
    data. NULL/NaN in y, treat, or any covariate drops the row (the
    listwise discipline).

    Returns one row: (att, n_strata_matched, n_treat_matched,
    n_ctrl_matched, n_treat_total, n_ctrl_total).
    """
    if bins < 1:
        raise ValueError("cem_att: bins >= 1")
    if not covariates:
        raise ValueError("cem_att: needs >= 1 covariate")
    t = F.col(treat)
    yv = F.col(y)
    dtypes = dict(df.dtypes)
    valid = t.isNotNull() & yv.isNotNull()
    for c in covariates + [y]:
        valid = valid & F.col(c).isNotNull()
        if dtypes.get(c) in ("double", "float"):
            valid = valid & ~F.isnan(F.col(c))
    base = df.filter(valid)

    # bin edges from one pre-pass; a constant covariate gets one bin
    mm = base.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{i}")
          for i, c in enumerate(covariates)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{i}")
          for i, c in enumerate(covariates)],
    ).collect()[0]
    keys = []
    for i, c in enumerate(covariates):
        lo = mm[f"__lo_{i}"]
        hi = mm[f"__hi_{i}"]
        if lo is None:
            raise ValueError("cem_att: empty sample")
        width = (float(hi) - float(lo)) / float(bins)
        if width <= 0:
            keys.append(F.lit(0))
            continue
        # floor((v - lo)/width) clamped so v == hi lands in the top
        # bin, not a one-past-the-end stratum of its own
        b = F.floor(
            (F.col(c).cast("double") - F.lit(float(lo)))
            / F.lit(width)
        )
        keys.append(F.least(b, F.lit(bins - 1)).cast("long"))

    strata = base.groupBy(
        *[k.alias(f"__b{i}") for i, k in enumerate(keys)]
    ).agg(
        F.count(F.when(t, 1)).alias("__nt"),
        F.count(F.when(~t, 1)).alias("__nc"),
        F.sum(F.when(t, yv)).cast("double").alias("__syt"),
        F.sum(F.when(~t, yv)).cast("double").alias("__syc"),
    )
    m = (F.col("__nt") > 0) & (F.col("__nc") > 0)
    ntd = F.col("__nt").cast("double")
    ncd = F.col("__nc").cast("double")
    agg = strata.agg(
        F.sum(F.when(m, 1).otherwise(0)).cast("long")
        .alias("n_strata_matched"),
        F.sum(F.when(m, F.col("__nt"))).alias("__mt"),
        F.sum(F.when(m, F.col("__nc"))).alias("__mc"),
        F.sum(F.col("__nt")).alias("__nt_tot"),
        F.sum(F.col("__nc")).alias("__nc_tot"),
        F.sum(
            F.when(m, F.col("__syt") - (ntd / ncd) * F.col("__syc"))
        ).alias("__num"),
    )
    mt = F.coalesce(F.col("__mt"), F.lit(0))
    return agg.select(
        F.when(mt > 0, F.col("__num") / mt.cast("double")).alias("att"),
        F.col("n_strata_matched"),
        mt.cast("long").alias("n_treat_matched"),
        F.coalesce(F.col("__mc"), F.lit(0)).cast("long")
        .alias("n_ctrl_matched"),
        F.coalesce(F.col("__nt_tot"), F.lit(0)).cast("long")
        .alias("n_treat_total"),
        F.coalesce(F.col("__nc_tot"), F.lit(0)).cast("long")
        .alias("n_ctrl_total"),
    )
