"""Distributed least squares with high-dimensional fixed effects.

Reference parity: ``estimate`` (``hdfe/hdfe.py:49-181``) — strategy
dispatch, three physical plans, optional rank repair, residuals,
homoskedastic and cluster-robust variance.

Plans (picked exactly like the reference's dispatch,
``hdfe/hdfe.py:66,73,121``):

- **Plan A ("pooled")** — no fixed effects: solve the normal equations
  from a one-pass distributed Gram ``(X'X, X'y)``; k×k solve on the
  driver. Replaces the reference's driver-sized ``np.linalg.lstsq``
  (``hdfe/hdfe.py:66-71``) with a single aggregation over any data
  size. Multi-outcome y handled in the same pass.
- **Plan B ("within")** — 1 FE (or ``within_if_fe=True``): the
  Frisch–Waugh–Lovell rewrite (``hdfe/hdfe.py:73-120``). FEs #2+
  become drop-last dummy columns appended to x; x is demeaned within
  FE#1 by a window aggregate; slopes solve from the demeaned Gram
  (``X̃'y = X̃'ỹ`` since ``X̃ ⊥`` the group-mean projection — the
  reference exploits the same identity by regressing raw y on
  demeaned x); FE#1 effects recovered as group means of residuals
  (``hdfe/hdfe.py:107-116``), then netted out of the residual.
- **Plan C ("alternating")** — ≥2 FEs with ``within_if_fe=False``:
  where the reference materializes ALL dummy blocks and runs
  single-node LSQR (``hdfe/hdfe.py:121-144``), the scale path is
  **alternating-projection demeaning** (Guimarães & Portugal 2010 /
  the reghdfe algorithm): iteratively sweep window-demeaning over
  each FE until group means vanish, then solve the k×k demeaned Gram.
  Slope coefficients equal the reference's (they are uniquely
  identified); FE effects are recovered per-FE and are identified
  only up to additive constants (the reference's LSQR min-norm
  normalization differs — documented deviation).

Every data-sized computation is one of: a window aggregate (shuffle on
the FE key), a grouped aggregate (shuffle on FE/cluster key with
map-side partials), or the Gram aggregation (map-side partial k×k
fan-in). Only k×k / (levels×k) matrices reach the driver.

Variance (``hdfe/hdfe.py:147-181``):

- homoskedastic ``V = σ̂²(X'X)⁻¹``, dof ``n - k_total``
  (``hdfe/hdfe.py:176-179``); for the within plan, ``(X'X)⁻¹`` of the
  full design ``[D₁|x]`` is computed blockwise via the Schur
  complement (the Schur complement of the dummy block is exactly the
  demeaned Gram), so no ``levels×levels`` dense inverse is formed
  unless FE-coefficient covariances are explicitly requested with a
  small level count.
- cluster-robust (Liang–Zeger sandwich, ``hdfe/hdfe.py:159-175``):
  per-cluster scores ``u_g = X_g'e_g`` via one grouped aggregation →
  (n_clusters×k) driver matrix → ``(X'X)⁻¹ (Σ u_g u_g') (X'X)⁻¹``.

Note: the reference's Plan-A ``estimate_variance=True`` path is broken
(``x.A`` on ndarray, ``hdfe/hdfe.py:155`` — SURVEY.md §4); this engine
supports it properly.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hdfe_spark.operators.collinearity import (
    find_collinear_cols_gram,
    gram_matrix,
)
from hdfe_spark.operators.encoding import make_dummies


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _solve(G: np.ndarray, Xty: np.ndarray) -> np.ndarray:
    """Min-norm solve of ``G b = X'y`` (rank-deficient safe)."""
    b, *_ = np.linalg.lstsq(G, Xty, rcond=None)
    return b


class EstimateResult:
    """Everything ``estimate`` can return.

    ``b`` rows align with ``coef_names``: for the within plan the FE#1
    effects come first (levels in sorted order, matching the
    reference's factorized-code ordering, ``hdfe/hdfe.py:114-116``),
    then slope coefficients.

    The FE block of ``b`` is **lazy**: for the within plan, accessing
    ``b`` / ``coef_names`` triggers one levels-sized driver collect of
    the (already computed) per-level FE table. ``slopes`` and
    ``fixed_effects`` (a DataFrame per FE) never collect levels to the
    driver, so slopes-only callers stay OOM-safe with 10⁸-level FEs.
    """

    def __init__(
        self,
        *,
        x_cols: list[str],
        plan: str,
        n: int,
        b: np.ndarray | None = None,
        coef_names: list[str] | None = None,
        slopes: np.ndarray | None = None,
        lazy_fe=None,  # () -> (b_full, coef_names)
        lazy_tables=None,  # () -> (fixed_effects dict, residuals DF)
        fixed_effects: dict[str, DataFrame] | None = None,
        residuals: DataFrame | None = None,
        V: list[np.ndarray] | None = None,
        v_coef_names: list[str] | None = None,
    ):
        self.x_cols = x_cols
        self.plan = plan
        self.n = n
        self._b = b
        self._coef_names = coef_names
        self._slopes = slopes
        self._lazy_fe = lazy_fe
        self._lazy_tables = lazy_tables
        self._fixed_effects = fixed_effects
        self._residuals = residuals
        self.V = V
        self.v_coef_names = v_coef_names

    def _materialize(self) -> None:
        if self._b is None and self._lazy_fe is not None:
            self._b, self._coef_names = self._lazy_fe()

    def _build_tables(self) -> None:
        # Deferred construction, not just deferred execution: even an
        # eager=False localCheckpoint runs its plan's query stages at
        # CREATION under AQE, so the recovery pipeline's DataFrames
        # must not exist until someone asks for them.
        if self._lazy_tables is not None:
            fe, resid = self._lazy_tables()
            self._lazy_tables = None
            if self._fixed_effects is None:
                self._fixed_effects = fe
            if self._residuals is None:
                self._residuals = resid

    @property
    def fixed_effects(self) -> dict[str, DataFrame]:
        self._build_tables()
        return self._fixed_effects or {}

    @fixed_effects.setter
    def fixed_effects(self, v) -> None:
        self._fixed_effects = v

    @property
    def residuals(self) -> DataFrame | None:
        self._build_tables()
        return self._residuals

    @residuals.setter
    def residuals(self, v) -> None:
        self._residuals = v

    @property
    def b(self) -> np.ndarray:  # (k_coefs, n_outcomes)
        self._materialize()
        return self._b

    @property
    def coef_names(self) -> list[str]:
        self._materialize()
        return self._coef_names

    @property
    def slopes(self) -> np.ndarray:
        """Slope-coefficient block of ``b`` (drops FE effects).
        Never triggers the FE collect."""
        if self._slopes is not None:
            return self._slopes
        b = self.b
        return b[-len(self.x_cols):, :] if self.x_cols else b[:0, :]


def _append_residuals(
    df: DataFrame, y_cols: list[str], x_cols: list[str], b: np.ndarray
) -> DataFrame:
    """``resid_y = y - Σ b_i x_i`` as one narrow projection (b is a
    driver-side k×m literal folded into the plan — no join)."""
    exprs = []
    for j, yc in enumerate(y_cols):
        pred = None
        for i, xc in enumerate(x_cols):
            term = F.col(xc) * F.lit(float(b[i, j]))
            pred = term if pred is None else pred + term
        resid = F.col(yc) - pred if pred is not None else F.col(yc)
        exprs.append(resid.alias(f"resid_{yc}"))
    return df.select("*", *exprs)


def _sum_sq(df: DataFrame, cols: list[str]) -> np.ndarray:
    row = df.agg(
        *[F.sum(F.col(c) * F.col(c)).alias(c) for c in cols]
    ).collect()[0]
    return np.array([float(row[c]) if row[c] is not None else 0.0 for c in cols])


def _cluster_scores(
    df: DataFrame, cluster: str, resid_cols: list[str], x_cols: list[str]
) -> dict[str, np.ndarray]:
    """Per-cluster scores ``u_g = Σ_{i∈g} e_i·x_i`` for every outcome
    in ONE grouped aggregation (``hdfe/hdfe.py:159-173`` runs a Python
    loop per outcome; here all outcomes × regressors fuse into one
    hash aggregate). Returns {outcome: (n_clusters × k) ndarray}."""
    exprs = []
    for rc in resid_cols:
        for xc in x_cols:
            exprs.append(F.sum(F.col(rc) * F.col(xc)).alias(f"__u_{rc}__{xc}"))
    rows = df.groupBy(cluster).agg(*exprs).collect()
    out = {}
    for rc in resid_cols:
        out[rc] = np.array(
            [[float(r[f"__u_{rc}__{xc}"] or 0.0) for xc in x_cols] for r in rows]
        )
    return out


def _homoskedastic_V(
    G_inv: np.ndarray, rss: np.ndarray, n: int, k_total: int
) -> list[np.ndarray]:
    dof = max(n - k_total, 1)
    return [G_inv * (float(es) / dof) for es in rss]


def estimate(
    df: DataFrame,
    y: str | Sequence[str],
    x: str | Sequence[str],
    categorical_controls: Sequence[str] | None = None,
    check_rank: bool = False,
    estimate_variance: bool = False,
    get_residual: bool = False,
    cluster: str | None = None,
    tol: float = 1e-9,
    within_if_fe: bool = True,
    ap_tol: float = 1e-8,
    ap_max_iter: int = 100,
) -> EstimateResult:
    """Distributed analogue of reference ``estimate``
    (``hdfe/hdfe.py:49-181``). ``y``/``x`` are column names in ``df``.
    """
    y_cols = _as_list(y)
    x_cols = list(_as_list(x))
    cc = list(categorical_controls or [])
    want_resid = get_residual or estimate_variance or cluster is not None

    if not cc:
        return _plan_pooled(
            df, y_cols, x_cols, check_rank, estimate_variance,
            want_resid, get_residual, cluster, tol,
        )
    if len(cc) == 1 or within_if_fe:
        return _plan_within(
            df, y_cols, x_cols, cc, check_rank, estimate_variance,
            want_resid, get_residual, cluster, tol,
        )
    return _plan_alternating(
        df, y_cols, x_cols, cc, check_rank, estimate_variance,
        want_resid, get_residual, cluster, tol, ap_tol, ap_max_iter,
    )


# ---------------------------------------------------------------- Plan A

def _plan_pooled(
    df, y_cols, x_cols, check_rank, estimate_variance,
    want_resid, get_residual, cluster, tol,
) -> EstimateResult:
    """No FEs → normal equations from one distributed Gram pass
    (reference ``hdfe/hdfe.py:66-71``)."""
    if check_rank:
        G, Xty, n = gram_matrix(df, x_cols, y_cols)
        ci, ki = find_collinear_cols_gram(G, tol=tol)
        if ci:
            x_cols = [x_cols[i] for i in ki]
            G = G[np.ix_(ki, ki)]
            Xty = Xty[ki, :]
    else:
        G, Xty, n = gram_matrix(df, x_cols, y_cols)

    b = _solve(G, Xty)
    res = EstimateResult(
        b=b, coef_names=list(x_cols), x_cols=list(x_cols),
        plan="pooled", n=n,
    )
    if not want_resid:
        return res

    with_resid = _append_residuals(df, y_cols, x_cols, b)
    resid_cols = [f"resid_{yc}" for yc in y_cols]
    if get_residual:
        res.residuals = with_resid

    if estimate_variance:
        G_inv = np.linalg.pinv(G)
        if cluster is None:
            rss = _sum_sq(with_resid, resid_cols)
            res.V = _homoskedastic_V(G_inv, rss, n, len(x_cols))
        else:
            scores = _cluster_scores(with_resid, cluster, resid_cols, x_cols)
            res.V = [
                G_inv @ (scores[rc].T @ scores[rc]) @ G_inv for rc in resid_cols
            ]
        res.v_coef_names = list(x_cols)
    return res


# ---------------------------------------------------------------- Plan B

def _plan_within(
    df, y_cols, x_cols, cc, check_rank, estimate_variance,
    want_resid, get_residual, cluster, tol,
) -> EstimateResult:
    """Within estimator / FWL demeaning (reference
    ``hdfe/hdfe.py:73-120``). FE#1 absorbed; FEs #2+ as drop-last
    dummy columns appended to x (``hdfe/hdfe.py:74-78``)."""
    fe1 = cc[0]
    work = df
    x_all = list(x_cols)
    for other_fe in cc[1:]:
        work, dummy_names = make_dummies(work, other_fe, drop_col=True)
        x_all += dummy_names

    # Demean x within fe1 — one window pass for all columns.
    w = Window.partitionBy(fe1)
    dm_cols = [f"__dm_{c}" for c in x_all]
    work = work.select(
        "*", *[(F.col(c) - F.avg(c).over(w)).alias(d) for c, d in zip(x_all, dm_cols)]
    )

    # Demeaned Gram + X̃'y in one pass (X̃'y == X̃'ỹ by orthogonality).
    G_dm, Xty, n = gram_matrix(work, dm_cols, y_cols)
    if check_rank:
        ci, ki = find_collinear_cols_gram(G_dm, tol=tol)
        if ci:
            x_all = [x_all[i] for i in ki]
            dm_cols = [dm_cols[i] for i in ki]
            G_dm = G_dm[np.ix_(ki, ki)]
            Xty = Xty[ki, :]

    b_x = _solve(G_dm, Xty)

    # Residual against RAW x (reference: error = y - x·b,
    # hdfe/hdfe.py:105), then FE effects = group means of that error.
    with_resid = _append_residuals(work, y_cols, x_all, b_x)
    resid_cols = [f"resid_{yc}" for yc in y_cols]
    fe_agg = with_resid.groupBy(fe1).agg(
        *[F.avg(rc).alias(f"fe_{yc}") for rc, yc in zip(resid_cols, y_cols)],
        F.count(F.lit(1)).alias("__fe_count"),
    )
    fe_effect_cols = [f"fe_{yc}" for yc in y_cols]
    if want_resid:
        # fe_agg feeds ≥2 downstream actions (netting join + variance)
        # — checkpoint lazily so the demean+residual pipeline upstream
        # of it runs once, not per action.
        fe_agg = fe_agg.localCheckpoint(eager=False)

    # FE block of the coefficient vector is LAZY: collected (sorted by
    # level — reference factorized-code order, hdfe/hdfe.py:114-116)
    # only if the caller reads .b/.coef_names. Slopes-only callers
    # never pull a levels-sized block onto the driver.
    def _collect_fe_block():
        fe_rows = fe_agg.orderBy(fe1).collect()
        fe_block = np.array(
            [[float(r[c]) for c in fe_effect_cols] for r in fe_rows]
        )
        b_full = np.vstack([fe_block.reshape(len(fe_rows), len(y_cols)), b_x])
        names = [f"{fe1}={r[fe1]}" for r in fe_rows] + x_all
        return b_full, names

    res = EstimateResult(
        slopes=b_x, lazy_fe=_collect_fe_block, x_cols=x_all,
        plan="within", n=n,
        fixed_effects={fe1: fe_agg.select(fe1, *fe_effect_cols)},
    )

    if not want_resid:
        return res

    # Net the FE out of the residual (broadcast join on fe1 —
    # reference hdfe/hdfe.py:119-120, but keyed by value, not position).
    netted = with_resid.join(F.broadcast(fe_agg.drop("__fe_count")), on=fe1, how="left")
    netted = netted.select(
        *[c for c in with_resid.columns if c not in resid_cols],
        *[
            (F.col(rc) - F.coalesce(F.col(fc), F.lit(0.0))).alias(rc)
            for rc, fc in zip(resid_cols, fe_effect_cols)
        ],
    )
    if get_residual:
        res.residuals = netted

    if estimate_variance:
        # Level count from one count-aggregate — never a levels-sized
        # collect unless the small-FE covariance block is requested.
        n_levels = fe_agg.count()
        k_x = len(x_all)
        k_total = n_levels + k_x
        # Blockwise (X'X)⁻¹ for X = [D₁ | x]: A = diag(counts),
        # B = per-level x sums, Schur complement S = x'x − B'A⁻¹B =
        # demeaned Gram G_dm. No levels×levels dense matrix needed for
        # the slope block; FE blocks are formed only when small.
        S_inv = np.linalg.pinv(G_dm)
        if cluster is None:
            rss = _sum_sq(netted, resid_cols)
            dof = max(n - k_total, 1)
            if n_levels <= 2000:
                sums = work.groupBy(fe1).agg(
                    F.count(F.lit(1)).alias("__fe_count"),
                    *[F.sum(c).alias(c) for c in x_all],
                ).orderBy(fe1).collect()
                B = np.array([[float(r[c] or 0.0) for c in x_all] for r in sums])
                fe_counts = np.array([int(r["__fe_count"]) for r in sums])
                A_inv = np.diag(1.0 / fe_counts)
                AinvB = A_inv @ B
                V_dd = A_inv + AinvB @ S_inv @ AinvB.T
                V_dx = -AinvB @ S_inv
                G_inv_full = np.block([[V_dd, V_dx], [V_dx.T, S_inv]])
                res.V = [G_inv_full * (float(es) / dof) for es in rss]
                res.v_coef_names = res.coef_names
            else:
                res.V = [S_inv * (float(es) / dof) for es in rss]
                res.v_coef_names = list(x_all)
        else:
            # Cluster-robust on the within-transformed model (slopes):
            # scores from demeaned x against FE-netted residuals.
            scores = _cluster_scores(netted, cluster, resid_cols, dm_cols)
            res.V = [
                S_inv @ (scores[rc].T @ scores[rc]) @ S_inv for rc in resid_cols
            ]
            res.v_coef_names = list(x_all)
    return res


# ---------------------------------------------------------------- Plan C

# FE level tables up to this many rows are broadcast for join-based
# demeaning; above it, fall back to a window pass (same shuffle cost
# as any grouped op at that cardinality, no driver/broadcast blowup).
_BROADCAST_DEMEAN_MAX_LEVELS = 1_000_000


def _unpersist_checkpoint(ckpt_df) -> None:
    """Release the persisted RDD behind a ``localCheckpoint``'d
    DataFrame. Only call once nothing un-materialized depends on it
    (a later checkpoint with truncated lineage, or results already on
    the driver). Reaches through the LogicalRDD node; if the internal
    surface ever shifts, leaking the blocks beats failing the job."""
    try:
        ckpt_df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _plan_alternating(
    df, y_cols, x_cols, cc, check_rank, estimate_variance,
    want_resid, get_residual, cluster, tol, ap_tol, ap_max_iter,
) -> EstimateResult:
    """≥2 FEs at scale: alternating-projection demeaning
    (Guimarães & Portugal 2010 / reghdfe) replacing the reference's
    materialize-all-dummies + LSQR (``hdfe/hdfe.py:121-144``).

    Slopes match the reference exactly (uniquely identified); FE
    effects are identified up to constants and recovered per-FE by
    iterated back-fitting — **lazily**: the back-fit DataFrames are
    only executed if the caller reads ``fixed_effects``/``residuals``.

    Scale design of the sweep loop:

    - operates on a **narrow projection** (FE keys + demeaned cols),
      never the full input row — at TPC-H widths this cuts per-sweep
      bytes ~5-10×;
    - each per-FE demean is ``groupBy(fe).agg(avg)`` (map-side partial
      aggregation, level-sized shuffle) + a **broadcast join**
      subtract — the fact table itself is never shuffled, vs a window
      pass which shuffles+sorts every row per FE per sweep; FEs with
      more than ``_BROADCAST_DEMEAN_MAX_LEVELS`` levels fall back to
      the window form;
    - convergence is ``max |group mean| < ap_tol × column RMS``
      (relative — an absolute test on e.g. price-scaled data forces
      dozens of extra sweeps), checked from level-sized aggregates;
    - ``localCheckpoint(eager=False)`` per sweep bounds the plan, and
      materializes together with the convergence check's action.
    """
    all_cols = list(x_cols) + list(y_cols)
    dm = {c: f"__dm_{c}" for c in all_cols}
    dmv = list(dm.values())
    keep = list(dict.fromkeys(cc + ([cluster] if cluster else [])))
    sw = df.select(*keep, *[F.col(c).alias(d) for c, d in dm.items()])

    # One-time per-FE level counts: pick demean strategy, reused for
    # the absorbed-dof correction in the variance path.
    levels = {fe: df.select(fe).distinct().count() for fe in cc}

    # Relative convergence scale: largest column RMS (one pass).
    rms_row = sw.agg(
        *[F.sqrt(F.avg(F.col(d) * F.col(d))).alias(d) for d in dmv]
    ).collect()[0]
    scale = max(
        [float(rms_row[d]) for d in dmv if rms_row[d] is not None] or [1.0]
    ) or 1.0

    # Lifetimes: checkpoint s materializes lazily inside sweep s+1's
    # first means scan, so at any moment at most TWO checkpoints (and
    # one sweep's level-sized means tables) are live — everything
    # older is unpersisted as the loop advances. Without this,
    # ``ap_max_iter`` copies of the working set pin executor storage
    # and evict/poison every later job in the session.
    import os as _os
    import time as _time

    _dbg = bool(_os.environ.get("HDFE_DEBUG_AP"))
    live_ckpts: list = []
    prev_means: list = []
    for _sweep in range(ap_max_iter):
        _t_sweep = _time.perf_counter()
        stats = []
        cur_means = []
        for fe in cc:
            if levels[fe] <= _BROADCAST_DEMEAN_MAX_LEVELS:
                means = sw.groupBy(fe).agg(
                    *[F.avg(d).alias(f"__m_{d}") for d in dmv]
                ).persist()
                cur_means.append(means)
                # Convergence piggybacks on the means ALREADY computed
                # for demeaning (reghdfe-style increment test): the
                # level-sized max-|mean| agg is free, vs a dedicated
                # full-table groupBy pass per FE per sweep.
                stats.append(
                    means.agg(
                        F.max(
                            F.greatest(
                                *[F.abs(F.col(f"__m_{d}")) for d in dmv]
                            )
                        ).alias("m")
                    )
                )
                sw = sw.join(F.broadcast(means), on=fe, how="left").select(
                    *keep,
                    *[
                        (F.col(d) - F.coalesce(F.col(f"__m_{d}"), F.lit(0.0))).alias(d)
                        for d in dmv
                    ],
                )
            else:
                # >1M-level FE: window demean; pay one grouped agg for
                # the increment stat (still cheaper than sorting).
                stats.append(
                    sw.groupBy(fe)
                    .agg(F.greatest(*[F.abs(F.avg(d)) for d in dmv]).alias("m"))
                    .agg(F.max("m").alias("m"))
                )
                w = Window.partitionBy(fe)
                sw = sw.select(
                    *keep,
                    *[(F.col(d) - F.avg(d).over(w)).alias(d) for d in dmv],
                )
        sw = sw.localCheckpoint(eager=False)
        checks = stats[0]
        for other in stats[1:]:
            checks = checks.unionAll(other)
        worsts = [r["m"] for r in checks.collect() if r["m"] is not None]
        # That collect scanned (and so materialized) the PREVIOUS
        # checkpoint; this sweep's is still pending. Release sweep
        # s-2's blocks and sweep s-1's means tables — nothing
        # un-materialized references them any more.
        live_ckpts.append(sw)
        while len(live_ckpts) > 2:
            _unpersist_checkpoint(live_ckpts.pop(0))
        for m in prev_means:
            m.unpersist(False)
        prev_means = cur_means
        if _dbg:
            print(
                f"[ap] sweep {_sweep}: {_time.perf_counter() - _t_sweep:.2f}s "
                f"worst={max(map(float, worsts)) if worsts else None:.3g}",
                flush=True,
            )
        if worsts and max(map(float, worsts)) < ap_tol * scale:
            break

    dm_x = [dm[c] for c in x_cols]
    dm_y = [dm[c] for c in y_cols]
    G_dm, Xty, n = gram_matrix(sw, dm_x, dm_y)
    # gram materialized the final checkpoint; its predecessors and the
    # last sweep's means are now dead.
    for c in live_ckpts[:-1]:
        _unpersist_checkpoint(c)
    for m in prev_means:
        m.unpersist(False)
    x_used = list(x_cols)
    if check_rank:
        ci, ki = find_collinear_cols_gram(G_dm, tol=tol)
        if ci:
            x_used = [x_cols[i] for i in ki]
            dm_x = [dm_x[i] for i in ki]
            G_dm = G_dm[np.ix_(ki, ki)]
            Xty = Xty[ki, :]
    b_x = _solve(G_dm, Xty)

    res = EstimateResult(
        b=b_x, coef_names=list(x_used), x_cols=list(x_used),
        plan="alternating", n=n,
    )

    # FE recovery by back-fitting on r = y − x·b (few sweeps) over the
    # ORIGINAL df — behind a builder closure so NOTHING (not even plan
    # construction — AQE runs checkpoint stages at creation) happens
    # unless the caller reads ``fixed_effects`` / ``residuals``.
    def _build_backfit():
        resid_cols = [f"resid_{yc}" for yc in y_cols]
        eff_cols = [f"fe_{yc}" for yc in y_cols]
        fe_tables: dict[str, DataFrame] = {}
        cur = _append_residuals(df, y_cols, x_used, b_x)
        for _ in range(3):
            for fe in cc:
                inc = cur.groupBy(fe).agg(
                    *[F.avg(rc).alias(ec) for rc, ec in zip(resid_cols, eff_cols)]
                )
                cur = cur.join(F.broadcast(inc), on=fe, how="left").select(
                    *[c for c in cur.columns if c not in resid_cols],
                    *[
                        (F.col(rc) - F.coalesce(F.col(ec), F.lit(0.0))).alias(rc)
                        for rc, ec in zip(resid_cols, eff_cols)
                    ],
                ).drop(*eff_cols)
                # Accumulate this round's increment into the FE's table.
                if fe in fe_tables:
                    prev = fe_tables[fe]
                    joined = prev.join(
                        inc.select(
                            fe, *[F.col(ec).alias(f"__i_{ec}") for ec in eff_cols]
                        ),
                        on=fe,
                        how="outer",
                    )
                    fe_tables[fe] = joined.select(
                        fe,
                        *[
                            (
                                F.coalesce(F.col(ec), F.lit(0.0))
                                + F.coalesce(F.col(f"__i_{ec}"), F.lit(0.0))
                            ).alias(ec)
                            for ec in eff_cols
                        ],
                    )
                else:
                    fe_tables[fe] = inc
            cur = cur.localCheckpoint(eager=False)
        fe_out = {
            fe: t.localCheckpoint(eager=False) for fe, t in fe_tables.items()
        }
        return fe_out, cur

    res._lazy_tables = _build_backfit

    if estimate_variance:
        # Slopes-only variance on the fully-demeaned model with
        # absorbed-dof correction (reghdfe convention). Residuals come
        # from the already-converged narrow sweep table (r = ỹ − X̃b —
        # identical to the FE-netted residual at convergence), so the
        # back-fit pipeline is not executed for variance.
        k_absorbed = levels[cc[0]] + sum(levels[fe] - 1 for fe in cc[1:])
        k_total = len(x_used) + k_absorbed
        S_inv = np.linalg.pinv(G_dm)
        swr = _append_residuals(sw, dm_y, dm_x, b_x)
        rdm_cols = [f"resid_{d}" for d in dm_y]
        if cluster is None:
            rss = _sum_sq(swr, rdm_cols)
            dof = max(n - k_total, 1)
            res.V = [S_inv * (float(es) / dof) for es in rss]
        else:
            scores = _cluster_scores(swr, cluster, rdm_cols, dm_x)
            res.V = [
                S_inv @ (scores[rc].T @ scores[rc]) @ S_inv for rc in rdm_cols
            ]
        res.v_coef_names = list(x_used)
    # Gram + variance are done with the sweep table; nothing returned
    # references it (back-fit reads the original df), so release the
    # final checkpoint's blocks before handing back.
    _unpersist_checkpoint(sw)
    return res
