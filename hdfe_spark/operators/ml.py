"""Classic supervised learners re-expressed as certificate-friendly
Spark plans: AdaBoost decision stumps with quantized weights, and a
multinomial Naive Bayes trainer/scorer with integer counts and
quantized log-probabilities.

Beyond-reference surface (the reference engine stops at linear
models, `/root/reference/hdfe/hdfe.py:14-302`); these are the
"cheap model over corpus features" tier a curation pipeline reaches
for right after the engine's logistic family: a boosted-stump
quality score and an NB language/topic classifier.

House exactness conventions throughout:
- every distributed SUM is over INTEGERS (DECIMAL(38,0)) — weights
  and log-probabilities are quantized to fixed-point before any
  aggregation, so the moments are order-free on any engine (the
  `logistic2` argument: a floor() landing exactly on a boundary
  after a last-ulp libm difference has density ~2^-bits per ulp);
- per-round / per-class argmins are total orders (error ASC, then
  threshold/class ASC, then polarity) a SQL oracle replays verbatim;
- iteration counts are FIXED and small, each round one aggregation
  pass — the `kmeans`/`pagerank` unrolled-oracle convention.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def _guard_binary_label(fn: str, df: DataFrame, label_col: str) -> None:
    # Delegate to the shared quantized-family guard (stats.py) so a
    # future fix to the integral-label check lands here too.
    from hdfe_spark.operators.stats import _check_integral_y

    _check_integral_y(
        fn,
        df,
        label_col,
        "a binary label must be integral/boolean (threshold upstream)",
    )


def adaboost_stumps(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    n_rounds: int = 3,
    wbits: int = 16,
) -> DataFrame:
    """AdaBoost.M1 over decision stumps on ONE numeric feature —
    `best_split`'s boosted sibling and the smallest real ensemble:
    each round fits the exactly-best weighted threshold stump, then
    reweights rows multiplicatively toward the mistakes.

    Engine-exact in a distributed setting because the row weights
    are INTEGERS end to end: init w = 2^wbits per row; after each
    round w' = floor(w * f + 0.5) where f is one of TWO driver-known
    IEEE doubles (exp(-alpha) for correctly classified rows,
    exp(+alpha) for mistakes — alpha = 0.5*ln((W-err)/err) computed
    once on the driver from exact integer totals). Weighted error
    sums are therefore DECIMAL(38,0) aggregations with no float
    order dependence; a SQL oracle unrolls rounds as CTE layers
    replaying the identical floor expression. (w can exceed 2^53
    after enough rounds; both engines then round w identically via
    IEEE nearest in the double cast — deterministic, documented.)

    Stump search per round pays ONE groupBy over distinct feature
    values + one distributed prefix sum (never a row sort): for the
    candidate threshold t, polarity +1 predicts positive on
    x <= t, and err(+1) = W_neg(left) + W_pos(right); err(-1) is its
    complement. The argmin total order is (error ASC, threshold ASC,
    polarity +1 first). A round whose best error is 0 raises loudly
    (alpha would be infinite — the feature separates the labels;
    use `best_split`); err >= W/2 yields alpha <= 0 and is allowed
    (the standard M1 behavior, the ensemble just down-weights that
    stump).

    Labels must be integral/boolean in {0, 1} (guarded on the first
    pass). NULL feature/label rows are excluded. Returns one row per
    round: (round, threshold, polarity, err_q, w_total_q, alpha) —
    err_q / w_total_q are the exact integer weighted error and total
    (the quantized weights' units), alpha the stump's vote weight.
    """
    if n_rounds < 1:
        raise ValueError("adaboost_stumps: n_rounds >= 1")
    _guard_binary_label("adaboost_stumps", df, label_col)
    from hdfe_spark.operators.rank import prefix_sum

    base = (
        df.filter(
            F.col(feature_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(
            F.col(feature_col).alias("__x"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .withColumn("__w", F.lit(1 << wbits).cast(_D38))
        .localCheckpoint(eager=True)
    )
    chk = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__y").alias("ymin"),
        F.max("__y").alias("ymax"),
    ).collect()[0]
    if int(chk["n"]) < 2:
        raise ValueError("adaboost_stumps: needs >= 2 rows")
    if int(chk["ymin"]) < 0 or int(chk["ymax"]) > 1:
        raise ValueError(
            f"adaboost_stumps: label_col {label_col!r} has values "
            "outside {0, 1}"
        )
    out = []
    for rnd in range(1, n_rounds + 1):
        cells = base.groupBy(F.col("__x").alias("__v")).agg(
            F.sum(F.col("__w") * F.col("__y")).cast(_D38).alias("__wp"),
            F.sum(F.col("__w") * (F.lit(1) - F.col("__y")))
            .cast(_D38)
            .alias("__wn"),
        )
        cum = prefix_sum(cells, ["__v"], "__wp", out_col="__cp")
        cum = prefix_sum(cum, ["__v"], "__wn", out_col="__cn")
        tot = cum.agg(
            F.sum("__wp").cast(_D38).alias("wp"),
            F.sum("__wn").cast(_D38).alias("wn"),
        ).collect()[0]
        wp, wn = int(tot["wp"]), int(tot["wn"] or 0)
        w_total = wp + wn
        # err(+1) = left negatives + right positives (exact ints)
        err_plus = (
            F.col("__cn") + (F.lit(str(wp)).cast(_D38) - F.col("__cp"))
        ).cast(_D38)
        err_minus = (
            F.lit(str(w_total)).cast(_D38) - err_plus
        ).cast(_D38)
        scored = cum.select(
            F.col("__v"),
            F.when(err_plus <= err_minus, err_plus)
            .otherwise(err_minus)
            .alias("__err"),
            F.when(err_plus <= err_minus, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("__pol"),
        )
        best = scored.orderBy(
            F.col("__err").asc(), F.col("__v").asc(), F.col("__pol").desc()
        ).limit(1).collect()[0]
        err = int(best["__err"])
        thr, pol = best["__v"], int(best["__pol"])
        if err == 0:
            raise ValueError(
                "adaboost_stumps: a stump separates the labels "
                "perfectly (alpha infinite) — use best_split"
            )
        if w_total > (1 << 63) - 1:
            # the output schema's err_q/w_total_q are int64 (pinned
            # by the registered oracle); weights grow ~exp(alpha)
            # per round, so fail HERE with a usable message instead
            # of at the very end in createDataFrame (ADVICE r9)
            raise ValueError(
                f"adaboost_stumps: round {rnd} total weight "
                f"{w_total} exceeds int64 — lower weight_bits or "
                "n_rounds"
            )
        alpha = 0.5 * math.log((w_total - err) / err)
        f_ok = math.exp(-alpha)
        f_bad = math.exp(alpha)
        out.append((rnd, thr, pol, err, w_total, alpha))
        if rnd == n_rounds:
            break
        pred_pos = (
            (F.col("__x") <= F.lit(thr))
            if pol == 1
            else (F.col("__x") > F.lit(thr))
        )
        correct = pred_pos == (F.col("__y") == 1)
        base = base.withColumn(
            "__w",
            F.floor(
                F.col("__w").cast("double")
                * F.when(correct, F.lit(f_ok)).otherwise(F.lit(f_bad))
                + F.lit(0.5)
            ).cast(_D38),
        ).localCheckpoint(eager=True)
    ftype = df.schema[feature_col].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        out,
        f"round int, threshold {ftype}, polarity int, err_q long, "
        "w_total_q long, alpha double",
    )


def nb_train(
    df: DataFrame,
    class_col: str,
    token_col: str,
) -> DataFrame:
    """Multinomial Naive Bayes trainer over (class, token) rows —
    pure integer aggregation, the `event_transitions` output shape:
    one row per observed (class, token) with the token count and the
    class margin, trivially hash-exact on any engine.

    Input is one row per token OCCURRENCE (explode upstream with the
    engine's tokenizer); NULL class/token rows are excluded. Returns
    (class, token, n, n_class) where n_class is the class's total
    token count. Scale: one hash aggregation keyed by (class, token)
    with map-side combine + one class-keyed margin join — the same
    two-shuffle plan as the transition matrix.
    """
    base = df.filter(
        F.col(class_col).isNotNull() & F.col(token_col).isNotNull()
    ).select(
        F.col(class_col).alias("class"), F.col(token_col).alias("token")
    )
    counts = base.groupBy("class", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    margins = counts.groupBy(F.col("class").alias("__mc")).agg(
        F.sum("n").cast("long").alias("n_class")
    )
    return counts.join(
        margins, counts["class"] == margins["__mc"]
    ).select("class", "token", "n", "n_class")


def nb_score(
    tokens: DataFrame,
    model: DataFrame,
    doc_col: str,
    token_col: str,
    vocab_size: int,
    qbits: int = 20,
    max_classes: int = 1000,
) -> DataFrame:
    """Multinomial Naive Bayes scorer: classify each document by
    argmax over classes of Σ_tokens qlog(p(token|class)), with
    add-one smoothing p = (n + 1) / (n_class + vocab_size) and the
    log QUANTIZED to ``qbits`` fractional bits:

        qlog = floor(ln((n + 1) / (n_class + V)) * 2^qbits)

    so every per-document score is an exact INTEGER sum (order-free
    across engines — the `logistic2` quantization argument; ln() on
    the exact rational is one libm call per distinct (n, n_class)
    pair, and a floor-boundary collision needs a last-ulp
    disagreement landing within 2^-qbits of an integer). Uniform
    class prior (curation classifiers are trained on balanced
    slices; fold a prior in upstream by appending pseudo-tokens).

    Plan (100 TB shape): the class list is collected (bounded by
    ``max_classes``) and CROSS-JOINED against the document tokens as
    a broadcast — each token row fans out to n_classes rows, then
    one left join against the (class, token) model brings in qlog,
    with unseen tokens falling back to the class's smoothing floor
    qlog(1 / (n_class + V)). One (doc, class) aggregation and one
    per-doc argmin-struct finish it: two shuffles total, both keyed
    by the document.

    Returns (doc, pred_class, score_q, n_tokens): the argmax class
    (score DESC, class ASC tie-break — a total order), its integer
    score, and the doc's scored token count. Documents whose tokens
    are all NULL are absent (no score is defined).
    """
    if vocab_size < 1:
        raise ValueError("nb_score: vocab_size >= 1")
    Q = float(1 << qbits)
    classes = model.select(
        "class", "n_class"
    ).distinct()
    cls_rows = classes.limit(max_classes + 1).collect()
    if len(cls_rows) > max_classes:
        raise ValueError(
            f"nb_score: more than {max_classes} classes — raise "
            "max_classes"
        )
    if not cls_rows:
        raise ValueError("nb_score: empty model")
    spark = tokens.sparkSession
    cls = spark.createDataFrame(
        [(r["class"], int(r["n_class"])) for r in cls_rows],
        classes.schema,
    )
    qlog = F.floor(
        F.log(
            (F.col("n").cast("double") + F.lit(1.0))
            / (F.col("n_class").cast("double") + F.lit(float(vocab_size)))
        )
        * F.lit(Q)
    ).cast("long")
    weighted = model.select(
        F.col("class").alias("__c"),
        F.col("token").alias("__t"),
        qlog.alias("__ql"),
    )
    miss = F.floor(
        F.log(
            F.lit(1.0)
            / (F.col("n_class").cast("double") + F.lit(float(vocab_size)))
        )
        * F.lit(Q)
    ).cast("long")
    base = tokens.filter(
        F.col(doc_col).isNotNull() & F.col(token_col).isNotNull()
    ).select(
        F.col(doc_col).alias("doc"), F.col(token_col).alias("token")
    )
    fanned = base.crossJoin(
        F.broadcast(cls.select("class", miss.alias("__miss")))
    )
    scored = (
        fanned.join(
            weighted,
            (fanned["class"] == weighted["__c"])
            & (fanned["token"] == weighted["__t"]),
            "left",
        )
        .select(
            "doc",
            "class",
            F.coalesce(F.col("__ql"), F.col("__miss")).alias("__q"),
        )
        .groupBy("doc", "class")
        .agg(
            F.sum("__q").cast("long").alias("score_q"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )
    # argmax by (score DESC, class ASC): min-struct over the negated
    # always-numeric score (the label_propagation convention)
    pick = scored.groupBy("doc").agg(
        F.min(
            F.struct(
                (-F.col("score_q")).alias("ns"),
                F.col("class"),
                F.col("score_q"),
                F.col("n_tokens"),
            )
        ).alias("m")
    )
    return pick.select(
        "doc",
        F.col("m.class").alias("pred_class"),
        F.col("m.score_q").alias("score_q"),
        F.col("m.n_tokens").alias("n_tokens"),
    )
