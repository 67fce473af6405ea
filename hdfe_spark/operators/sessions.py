"""Gap-based sessionization over event streams/tables.

Beyond-reference surface (the reference is panel econometrics; event
sessionization is its direct analogue for training-data event logs —
SURVEY.md §2.5 scopes beyond-reference operators to the driver's
fixture tables). Batch form is the classic gap-and-islands rewrite:
one window pass (lag → boundary flag → running sum), so cost is one
shuffle+sort on the entity key regardless of session count. The
streaming form is Spark's native ``session_window`` (state merged per
key, evicted by watermark).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: "int | float" = 1_800,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign every event a per-entity session index: a new session
    starts when the time since the entity's previous event exceeds
    ``gap`` (in ``ts_col`` units — pass nanoseconds for the events
    fixture's bigint-ns timestamps).

    One window pass; sessions are 0-indexed in time order per entity.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap))
    ).cast("long")
    run = Window.partitionBy(entity_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(run) - 1)


def session_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: "int | float" = 1_800,
) -> DataFrame:
    """Per-session summary (one row per (entity, session)): event
    count, start/end, duration. Builds on ``sessionize``; the grouped
    agg reuses the sessionize shuffle's partitioning (same key
    prefix), so AQE plans a single exchange."""
    s = sessionize(df, entity_col, ts_col, gap)
    return s.groupBy(entity_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )


def attribute_last_touch(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    type_col: str,
    touch_types: Sequence[str],
    conversion_types: Sequence[str],
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Last-touch attribution: every conversion event is credited to
    the entity's most recent STRICTLY PRECEDING touch event (by the
    ``order_cols`` total order); conversions with no prior touch
    attribute to NULL (organic).

    The marketing-analytics workhorse over the same event logs the
    curation pipeline reads: one window pass per entity (frame
    UNBOUNDED PRECEDING .. 1 PRECEDING with an ignore-nulls last()),
    shuffles only on the entity key — never a self-join of the event
    table against itself, which at 100 TB would square the touch
    volume.

    Output: the conversion rows plus ``touch_type`` and
    ``touch_<c>`` for each carry column (all NULL when organic).
    ``order_cols`` must totally order each entity's events (ties
    would make "most recent" nondeterministic).
    """
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    touch_struct = F.when(
        is_touch,
        F.struct(
            F.col(type_col).alias("t"),
            *[F.col(c).alias(c) for c in carry_cols],
        ),
    )
    last_touch = F.last(touch_struct, ignorenulls=True).over(w)
    out = df.withColumn("_lt", last_touch).filter(
        F.col(type_col).isin(list(conversion_types))
    )
    sel = [
        *df.columns,
        F.col("_lt").getField("t").alias("touch_type"),
        *[
            F.col("_lt").getField(c).alias(f"touch_{c}")
            for c in carry_cols
        ],
    ]
    return out.select(*sel)


def funnel(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    type_col: str,
    steps: Sequence[str],
    within: "int | None" = None,
) -> DataFrame:
    """Ordered multi-step funnel conversion per entity: the EARLIEST
    completion of ``steps`` in sequence — step i must occur STRICTLY
    after the chosen step i-1 event, and (if ``within`` is given)
    within ``within`` order-units of step 1. The product-analytics
    primitive ("view → click → signup → purchase: where do users
    drop off?") over the same event logs the curation pipeline
    reads.

    Semantics are the standard greedy-earliest funnel: t_1 = the
    chosen step-1 anchor; t_i = the first step-i event after
    t_{i-1} (and <= t_1 + within). WITHOUT a window, greedy from the
    entity's first step-1 event is OPTIMAL for sequence containment
    (matching the earliest feasible event never excludes a later
    completion), so one anchor suffices. WITH a window that proof
    breaks — a later step-1 anchor can complete where the first
    cannot (A@0, A@100, B@105, within=10) — so EVERY step-1 event is
    tried as an anchor and the best walk wins (most steps completed;
    earliest anchor on ties). Exact, not heuristic, in both modes.

    Plan (100 TB shape): ONE shuffle — a single groupBy collects the
    entity's relevant events, then the walk is a pure JVM
    array-expression fold (no Python, no self-joins — a k-way
    self-join of the event table against itself would square the
    event volume). Greedy mode folds ONE sorted (time, step) array
    through a state-machine accumulator — a single O(n·k) pass per
    entity (review r13: the earlier per-step-array walk nested each
    step's filter inside the next step's lambda, and interpreted
    higher-order functions re-evaluate nested subtrees per element —
    O(n^k) on a hot key; the measured envelope is in SCALE.md).
    Windowed mode keeps per-step sorted arrays and tries every
    step-1 anchor; its nested probes cost O(|anchors| · n^(k-1))
    array-element evaluations per entity worst-case, so it is for
    per-entity activity volumes (the sessionize boundedness
    assumption), NOT hot keys. Per-entity arrays are bounded by the
    entity's own activity either way. ``order_col`` must be integral
    (epoch micros, emitted as bigint): min/filter over integers is
    engine-exact.

    Returns one row per entity with >= 1 step-1 event: entity,
    steps_completed, and t_1..t_k (NULL beyond the completed
    prefix)."""
    if not steps or len(steps) < 2:
        raise ValueError("funnel: needs >= 2 steps")
    from pyspark.sql import types as T

    otype = df.schema[order_col].dataType
    if not isinstance(
        otype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"funnel: order_col {order_col!r} is "
            f"{otype.simpleString()}; funnel timestamps must be "
            "integral (epoch micros) for engine-exact min/filter"
        )
    k = len(steps)
    stype = "struct<c:int," + ",".join(
        f"t{i + 1}:bigint" for i in range(k)
    ) + ">"

    if within is None:
        # Greedy mode: ONE sorted (time, step) array per entity and a
        # SINGLE-PASS state-machine fold — O(n·k) per entity. The
        # previous per-step-array walk nested each step's filter
        # inside the next step's lambda predicate, and interpreted
        # higher-order functions re-evaluate nested subtrees PER
        # ELEMENT: O(n^k) on a hot key (review r13 — measured: 10M
        # one-entity events never finished; chained projections
        # don't help because CollapseProject re-inlines
        # single-reference aliases). The fold's greedy transition
        # — advance iff the event is the next needed step and
        # STRICTLY after the last matched time — is the textbook
        # one-pass equivalent of the sequential definition.
        # Repeated step TYPES are legal ('view -> click -> view'):
        # each event carries its type's FIRST-occurrence id, and the
        # fold compares it against the NEEDED step's first-occurrence
        # id (review r13b — an event-to-single-step-index map would
        # never let a later duplicate step fire).
        sid = [steps.index(s) for s in steps]
        ev = F.when(
            F.col(type_col) == F.lit(steps[0]), F.lit(0)
        )
        for i in range(1, k):
            ev = ev.when(F.col(type_col) == F.lit(steps[i]), F.lit(i))
        g = (
            df.filter(F.col(order_col).isNotNull() & ev.isNotNull())
            .groupBy(F.col(entity_col))
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(order_col).cast("long").alias("t"),
                            ev.cast("int").alias("s"),
                        )
                    )
                ).alias("__ev")
            )
        )

        # accumulator: struct(c int, t1..tk bigint, m = time of the
        # last match — m rides as its own field so the transition
        # never indexes t_c dynamically)
        def _advance(acc, x):
            c = acc.getField("c")
            fields = [(c + F.lit(1)).alias("c")]
            for i in range(k):
                fields.append(
                    F.when(c == F.lit(i), x.getField("t"))
                    .otherwise(acc.getField(f"t{i + 1}"))
                    .alias(f"t{i + 1}")
                )
            fields.append(x.getField("t").alias("m"))
            return F.struct(*fields)

        def _fold(acc, x):
            done = acc.getField("c") >= F.lit(k)
            # the needed step's first-occurrence id, selected by the
            # current progress counter (k-branch CASE, not an index)
            needed = F.lit(sid[0])
            for i in range(1, k):
                needed = F.when(
                    acc.getField("c") == F.lit(i), F.lit(sid[i])
                ).otherwise(needed)
            fired = (~done) & (x.getField("s") == needed) & (
                (acc.getField("c") == F.lit(0))
                | (x.getField("t") > acc.getField("m"))
            )
            return F.when(fired, _advance(acc, x)).otherwise(acc)

        init = F.expr(
            "named_struct('c', 0, "
            + ", ".join(
                f"'t{i + 1}', cast(null as bigint)" for i in range(k)
            )
            + ", 'm', cast(null as bigint))"
        )
        best = F.aggregate(F.col("__ev"), init, _fold)
        out = g.select(
            entity_col,
            best.getField("c").cast("long").alias("steps_completed"),
            *[
                best.getField(f"t{i + 1}").alias(f"t_{i + 1}")
                for i in range(k)
            ],
        )
        return out.filter(F.col("t_1").isNotNull())

    aggs = [
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col(type_col) == F.lit(s),
                    F.col(order_col).cast("long"),
                )
            )
        ).alias(f"__a{i}")
        for i, s in enumerate(steps)
    ]
    g = df.filter(F.col(order_col).isNotNull()).groupBy(
        F.col(entity_col)
    ).agg(*aggs)

    def walk_from(anchor):
        """Greedy walk t_1..t_k from a given step-1 anchor, as a
        (completed, t1..tk) struct expression."""
        ts = [anchor]
        w_lit = F.lit(int(within))
        for i in range(1, k):
            arr = F.col(f"__a{i}")
            prev, t0 = ts[i - 1], ts[0]
            cand = F.filter(
                arr,
                (
                    lambda p, a0: (
                        lambda x: (x > p) & (x - a0 <= w_lit)
                    )
                )(prev, t0),
            )
            # try_element_at: empty candidate set -> NULL, not an
            # ANSI index error
            ts.append(F.try_element_at(cand, F.lit(1)))
        completed = F.lit(0)
        for t in ts:
            completed = completed + t.isNotNull().cast("int")
        return F.struct(
            completed.alias("c"),
            *[ts[i].cast("bigint").alias(f"t{i + 1}") for i in range(k)],
        )

    # every step-1 event is a candidate anchor; fold keeps the
    # first walk with the strictly highest step count, so ties
    # resolve to the EARLIEST anchor (the array is sorted)
    walks = F.transform(F.col("__a0"), lambda a: walk_from(a))
    best = F.aggregate(
        walks,
        F.lit(None).cast(stype),
        lambda acc, s: F.when(
            acc.isNull() | (s.getField("c") > acc.getField("c")), s
        ).otherwise(acc),
    )
    out = g.select(
        entity_col,
        best.getField("c").cast("long").alias("steps_completed"),
        *[best.getField(f"t{i + 1}").alias(f"t_{i + 1}") for i in range(k)],
    )
    return out.filter(F.col("t_1").isNotNull())


def retention_cohorts(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    bucket: int,
) -> DataFrame:
    """Cohort retention matrix: entities are cohorted by the time
    bucket of their FIRST event (cohort = first_order div bucket),
    and each (cohort, offset) cell counts how many of that cohort
    were active in bucket cohort+offset — the "week-N retention"
    triangle behind every growth dashboard, and the activity-decay
    audit for longitudinal training corpora.

    Plan (100 TB shape): the raw events reduce ONCE to distinct
    (entity, bucket) activity pairs — a shuffle on (entity, bucket),
    after which everything runs over the far smaller pair table: the
    per-entity first bucket is a groupBy of the PAIRS (re-keys by
    entity — a second, pair-sized exchange; the keys differ so the
    first exchange cannot be reused, which is why the reduction
    happens first), the pair-to-cohort equi-join re-uses that
    entity keying, and the final (cohort, offset) count is tiny. All
    integer arithmetic (div/counts); the only float is the final
    retention ratio — one IEEE division of two exact longs per cell.
    NULL order AND NULL entity rows are excluded (an anonymous event
    can neither found a cohort nor count as retention — keeping it
    in one side only would deflate every ratio).

    Returns one row per observed (cohort, offset): cohort (bucket
    index), offset (>= 0), n_active, cohort_size, retention."""
    if bucket <= 0:
        raise ValueError("retention_cohorts: bucket must be positive")
    ev = df.filter(
        F.col(order_col).isNotNull() & F.col(entity_col).isNotNull()
    ).select(
        F.col(entity_col).alias("__e"),
        # SQL `div` (exact integer division, never a float detour —
        # floor(a/b) on doubles is inexact past 2^53); order values
        # are assumed non-negative (epoch time), where truncating
        # and flooring division agree on both engines
        F.expr(
            f"cast(`{order_col}` as bigint) div {int(bucket)}"
        ).alias("__b"),
    )
    active = ev.distinct()
    # first bucket from the DEDUPED pairs, not the raw events — the
    # min is identical and the aggregation input is far smaller
    first = active.groupBy("__e").agg(F.min("__b").alias("__cohort"))
    sizes = first.groupBy("__cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        active.join(first, "__e")
        .groupBy(
            F.col("__cohort").alias("cohort"),
            (F.col("__b") - F.col("__cohort")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.join(
        F.broadcast(sizes.withColumnRenamed("__cohort", "cohort")),
        "cohort",
    ).select(
        "cohort",
        "offset",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )


def _ordered_event_stream(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    state_col: str,
    tiebreak_cols,
):
    """Shared prep for the per-entity sequence operators
    (`event_transitions`, `event_ngrams`): NULL-filtered (entity,
    order, state, tiebreaks) projection, the NULLS-LAST total-order
    window (Spark windows default NULLS FIRST where SQL engines sort
    NULLS LAST — the round-9 cross-engine pairing lesson), and the
    duplicate-full-key predicate the in-plan guard fires on. One
    spelling so the order contract cannot drift between the ops."""
    ties = list(tiebreak_cols or [])
    ev = df.filter(
        F.col(entity_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(state_col).isNotNull()
    ).select(
        F.col(entity_col).alias("__e"),
        F.col(order_col).alias("__o"),
        F.col(state_col).alias("__s"),
        *[F.col(t).alias(f"__t{i}") for i, t in enumerate(ties)],
    )
    okey = [F.col("__o")] + [F.col(f"__t{i}") for i in range(len(ties))]
    w = Window.partitionBy("__e").orderBy(
        *[c.asc_nulls_last() for c in okey]
    )
    full_key = F.struct(*okey)
    dup = full_key.eqNullSafe(F.lag(full_key).over(w))
    return ev, w, dup


def event_transitions(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    state_col: str,
    tiebreak_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for every observed (src, dst) state pair, the count
    of consecutive transitions src -> dst and the empirical
    transition probability P(dst | src) — the sequence-model prior
    behind next-event prediction, funnel diagnosis, and curriculum
    ordering of event-log training data (which state follows which,
    and how deterministically).

    Plan (100 TB shape): ONE window pass keyed by the entity (the
    same sort any per-entity sequence op pays — the successor of
    each event via ``lead`` over (order, tiebreaks)), then two
    state-vocabulary-sized aggregations: the (src, dst) pair count
    and its src margin. The wide shuffle is bounded by the event
    table once; everything after is |states|² at most. The
    probability is ONE IEEE division of two exact longs — no float
    summation anywhere, so a SQL oracle mirrors it exactly.

    Order determinism: the fold order must be a TOTAL order or the
    pairing is engine-dependent. With ``tiebreak_cols`` the sort key
    is (order, *tiebreaks); duplicate full keys within an entity
    raise IN-PLAN (adjacent-row equality check on the already-sorted
    window — zero extra shuffle), the `_dup_order_guard` convention
    of the ordered-fold family (`stats.ewma`).

    NULL entity / order / state rows are excluded up front (an
    unattributable or unorderable event can neither emit nor receive
    a transition); NULLs in a tiebreak column are fine and sort LAST
    (``asc_nulls_last``, explicitly — Spark's window default is
    NULLS FIRST while SQL engines such as DuckDB default to NULLS
    LAST, so the pairing would silently diverge cross-engine on the
    default), and the guard still catches genuine duplicates because
    two NULL-tiebreak rows with equal order values compare equal on
    the null-safe guard key.

    Returns one row per observed (src, dst): src, dst, n (exact
    transition count), n_src (outgoing margin of src), p = n/n_src.
    """
    ev, w, dup = _ordered_event_stream(
        df, entity_col, order_col, state_col, tiebreak_cols
    )
    nxt = F.when(
        dup,
        F.raise_error(
            F.concat(
                F.lit(
                    "event_transitions: duplicate order values within "
                    "entity "
                ),
                F.col("__e").cast("string"),
                F.lit(" — the transition pairing would be engine-dependent"),
            )
        ).cast(df.schema[state_col].dataType),
    ).otherwise(F.lead("__s").over(w))
    pairs = (
        ev.select(F.col("__s").alias("src"), nxt.alias("dst"))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    margins = pairs.groupBy("src").agg(F.sum("n").alias("n_src"))
    return pairs.join(margins, "src").select(
        "src",
        "dst",
        "n",
        "n_src",
        (F.col("n").cast("double") / F.col("n_src").cast("double")).alias(
            "p"
        ),
    )


def event_ngrams(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    state_col: str,
    k: int = 3,
    tiebreak_cols: "Sequence[str] | None" = None,
    min_count: int = 1,
) -> DataFrame:
    """Consecutive k-state sequence counts over per-entity event
    streams — `event_transitions`' higher-order sibling (k = 2 IS
    the transition pair count): the sequence-mining primitive behind
    behavioral motifs, funnel-path discovery, and next-k-step
    priors. "Consecutive" means adjacent in the entity's
    NULL-state-filtered stream, the `event_transitions` semantics.

    Plan (100 TB shape): the SAME single entity-keyed window pass
    (shared `_ordered_event_stream` prep — NULLS-LAST total order,
    in-plan duplicate-key guard), k-1 ``lead`` columns riding the
    one sort, then ONE aggregation over the observed k-grams.
    Output volume is bounded by min(|events|, |states|^k) — pass
    ``min_count`` > 1 to prune the tail (the `assoc_rules`
    min-support convention; pruning happens AFTER the exact count,
    so surviving counts are exact, never sampled).

    Returns one row per observed k-gram with count >= min_count:
    s1..sk (the states, in order), n (exact count). A SQL oracle
    mirrors it with k-1 window leads and a GROUP BY.
    """
    if k < 2:
        raise ValueError("event_ngrams: k must be >= 2")
    if min_count < 1:
        raise ValueError("event_ngrams: min_count must be >= 1")
    ev, w, dup = _ordered_event_stream(
        df, entity_col, order_col, state_col, tiebreak_cols
    )
    state_t = df.schema[state_col].dataType
    guard_first = F.when(
        dup,
        F.raise_error(
            F.concat(
                F.lit(
                    "event_ngrams: duplicate order values within entity "
                ),
                F.col("__e").cast("string"),
                F.lit(" — the k-gram pairing would be engine-dependent"),
            )
        ).cast(state_t),
    ).otherwise(F.col("__s"))
    cols = [guard_first.alias("s1")] + [
        F.lead("__s", i).over(w).alias(f"s{i + 1}") for i in range(1, k)
    ]
    grams = ev.select(*cols).filter(F.col(f"s{k}").isNotNull())
    out = grams.groupBy(*[f"s{i + 1}" for i in range(k)]).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out
