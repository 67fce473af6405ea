"""Similarity search over embedding columns (``array<float>``).

Beyond-reference surface (BASELINE.json north star). Three tiers:

- ``cosine_topk`` — brute-force exact top-k for one query vector,
  followed by a global top-k (``orderBy().limit(k)`` compiles to
  ``TakeOrderedAndProject`` — per-partition heaps then a k-row driver
  merge, NOT a full sort).
- ``lsh_bucket`` / ``ann_topk_lsh`` — random-hyperplane LSH
  (Charikar 2002): sign-pattern bucket per vector; queries probe only
  their bucket.
- ``ivf_topk`` — IVF-style coarse quantizer: MLlib KMeans centroids,
  vectors assigned to nearest centroid, queries probe the ``n_probe``
  nearest lists — the classic FAISS-IVF layout as a bucketed scan.

Implementation note: the per-row vector math (dot products, norms,
sign signatures) is vectorized Arrow pandas UDFs — each batch is one
``numpy`` matrix multiply. The JVM higher-order-function alternative
(``aggregate(zip_with(...))``) is interpreted (not codegen'd) and its
expression tree grows with dim × n_planes; measured ~6× slower at
dim=64 and worse as either grows. All math casts FLOAT→DOUBLE
(FIXTURES.md F6 caveat) and L2-normalizes batch-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stack(series: pd.Series) -> np.ndarray:
    """Arrow array column → (batch, dim) float64 matrix."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _normalize_rows(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)


def make_cosine_udf(query: np.ndarray):
    """pandas UDF: vec → cosine(vec, query); one GEMV per Arrow batch."""
    qn = np.asarray(query, dtype=np.float64)
    qn = qn / max(np.linalg.norm(qn), 1e-30)

    @F.pandas_udf(T.DoubleType())
    def cos(vecs: pd.Series) -> pd.Series:
        M = _normalize_rows(_stack(vecs))
        return pd.Series(M @ qn)

    return cos


def make_bucket_udf(planes: np.ndarray):
    """pandas UDF: vec → int64 sign-pattern bucket over hyperplanes."""
    P = np.asarray(planes, dtype=np.float64)
    weights = (1 << np.arange(P.shape[0])).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        M = _stack(vecs)
        bits = (M @ P.T > 0).astype(np.int64)
        return pd.Series(bits @ weights)

    return bucket


def make_multi_bucket_udf(planes_tables: np.ndarray):
    """pandas UDF: vec → array<long> of one sign-pattern bucket per
    LSH table. ``planes_tables`` is (n_tables, n_planes, dim); all
    tables' signatures come from ONE (batch × dim) @ (dim × T·b)
    matrix multiply per Arrow batch — the multi-table analogue of
    ``make_bucket_udf``, so banded LSH costs one Python stage, not
    one per table."""
    P = np.asarray(planes_tables, dtype=np.float64)
    n_tables, n_planes, dim = P.shape
    flat = P.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        M = _stack(vecs)
        bits = (M @ flat.T > 0).astype(np.int64)  # (batch, T*b)
        codes = bits.reshape(len(M), n_tables, n_planes) @ weights
        return pd.Series(codes.tolist())

    return buckets


def make_pair_cosine_udf():
    """pandas UDF: (vec_a, vec_b) → cosine, vectorized per batch."""

    @F.pandas_udf(T.DoubleType())
    def pcos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = _normalize_rows(_stack(a))
        B = _normalize_rows(_stack(b))
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return pcos


def _planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    return int(df.select(F.size(F.col(vec_col)).alias("d")).first()["d"])


def cosine_topk(
    df: DataFrame,
    query: "np.ndarray | list[float]",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for one query vector. Brute force — the
    correctness baseline and the right plan below ~10⁸ vectors: one
    scan, one Arrow pass, per-partition top-k heaps, k-row merge."""
    cos = make_cosine_udf(np.asarray(query, dtype=np.float64))
    return (
        df.select(F.col(id_col), cos(F.col(vec_col)).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    df: DataFrame,
    queries: "np.ndarray | list[tuple[int, list[float]]] | DataFrame",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for MANY queries in one corpus scan (the
    kNN-graph builder). Returns (query_id, vec_id, cosine) — k rows
    per query, ties broken by ascending id.

    The query set is dimension-sized (a kNN graph over the corpus
    itself is built in id-range chunks of queries): it is closed over
    by an Arrow kernel as a (q × d) matrix, each corpus batch scores
    against ALL queries in one GEMM, and — the scale lever — each
    batch emits only its LOCAL top-k per query, so the global
    (window) top-k shuffles at most ``partitions × q × k`` candidate
    rows, never ``n × q`` scores.
    """
    from pyspark.sql import Window as W

    if isinstance(queries, DataFrame):
        rows = queries.select(query_id_col, vec_col).collect()
        qids = np.array([r[0] for r in rows], dtype=np.int64)
        Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    else:
        qids = np.arange(len(queries), dtype=np.int64)
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in queries])
    Qn = _normalize_rows(Q)
    kk = int(k)

    out_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def local_topk(batches):
        for pdf in batches:
            M = _normalize_rows(_stack(pdf[vec_col]))
            ids = pdf[id_col].to_numpy(np.int64)
            S = M @ Qn.T  # (batch, q)
            take = min(kk, S.shape[0])
            # argpartition per query column: local candidates only
            part = np.argpartition(-S, take - 1, axis=0)[:take, :]
            qcol = np.repeat(qids, take)
            rcol = part.T.reshape(-1)
            yield pd.DataFrame(
                {
                    query_id_col: qcol,
                    id_col: ids[rcol],
                    "cosine": S[rcol, np.repeat(np.arange(len(qids)), take)],
                }
            )

    cand = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        local_topk, schema=out_schema
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= kk)
        .drop("__rn")
    )


def lsh_bucket(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
    bucket_col: str = "__bucket",
) -> DataFrame:
    """Random-hyperplane signature bucket: bit i = sign(v·rᵢ). The
    plane matrix is seeded driver-side and closed over by the UDF
    (small: n_planes × dim doubles)."""
    if dim is None:
        dim = _vec_dim(df, vec_col)
    bucket = make_bucket_udf(_planes(n_planes, dim, seed))
    return df.withColumn(bucket_col, bucket(F.col(vec_col)))


def lsh_index(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
    dim: int | None = None,
    materialize: bool = True,
) -> "tuple[DataFrame, np.ndarray]":
    """Compute the multi-table LSH signatures ONCE (the add-phase of a
    FAISS-style index): returns ``(df + __bkts array<long>, planes)``.
    Signature computation is the expensive part of a probe (one
    (n × dim) @ (dim × tables·planes) GEMM over the whole corpus), so
    amortizing it across queries is the scale lever — pass the result
    to ``ann_topk_lsh(index=...)`` and each probe is a codegen'd
    bucket filter + candidate-only scoring. ``materialize=True``
    truncates lineage (``localCheckpoint``) so probes re-scan the
    signed corpus, not the signature kernel."""
    if dim is None:
        dim = _vec_dim(df, vec_col)
    P = np.stack([_planes(n_planes, dim, seed + t) for t in range(n_tables)])
    v = df.withColumn("__bkts", make_multi_bucket_udf(P)(F.col(vec_col)))
    if materialize:
        v = v.localCheckpoint()
    return v, P


def ann_topk_lsh(
    df: DataFrame | None,
    query: "np.ndarray | list[float]",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
    index: "tuple[DataFrame, np.ndarray] | None" = None,
) -> DataFrame:
    """Approximate top-k: score only vectors that share an LSH bucket
    with the query in at least one of ``n_tables`` independent
    hyperplane tables (each table keeps ~n/2^n_planes candidates;
    recall rises with tables, candidate count ≤ tables × bucket size).
    All tables' signatures come from ONE Arrow kernel
    (``make_multi_bucket_udf``); the per-table bucket match is a
    codegen'd OR of ``n_tables`` equality filters — no shuffle before
    the final k-row ``TakeOrderedAndProject`` merge. Exact cosines for
    whatever is scored.

    Pass ``index=lsh_index(...)`` to amortize the corpus signature
    GEMM across queries; without it, signatures are computed inline
    for this one call (convenience only — at 1M+ vectors the
    signature pass costs more than brute-force scoring would)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    if index is None:
        if df is None:
            raise ValueError("ann_topk_lsh needs df or index=lsh_index(...)")
        v, P = lsh_index(
            df, vec_col=vec_col, n_planes=n_planes, n_tables=n_tables,
            seed=seed, dim=len(qn), materialize=False,
        )
    else:
        v, P = index
    pows = (1 << np.arange(P.shape[1])).astype(np.int64)
    q_codes = ((P @ qn > 0).astype(np.int64) @ pows)  # (n_tables,)

    # element_at is 1-based and needs an INT index (not BIGINT)
    match = F.element_at(F.col("__bkts"), 1) == int(q_codes[0])
    for t in range(1, len(q_codes)):
        match = match | (F.element_at(F.col("__bkts"), t + 1) == int(q_codes[t]))
    cos = make_cosine_udf(qn)
    return (
        v.filter(match)
        .select(F.col(id_col), cos(F.col(vec_col)).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed: int = 42,
    path: str | None = None,
) -> "tuple[DataFrame, np.ndarray]":
    """Build the IVF coarse quantizer ONCE (the FAISS train+add
    phases): fit MLlib KMeans, assign every vector to its nearest
    centroid, and return ``(assigned, centers)``.

    With ``path``, the assignment is written **partitioned by**
    ``__centroid`` and read back — every subsequent probe filters on
    the partition column, so the scan prunes to ``n_probe``
    directories (`PartitionFilters` in the plan) and never touches
    the other ``n_centroids − n_probe`` fractions of the corpus. This
    is the 100 TB layout; without ``path`` the assignment is kept as
    an in-session DataFrame (still filter-pruned, not scan-pruned).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = df.withColumn(
        "__mlvec",
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))),
    ).persist()  # KMeans iterates; released once the assignment is materialized
    km = KMeans(
        k=n_centroids, seed=seed, featuresCol="__mlvec", predictionCol="__centroid"
    )
    model = km.fit(v)
    centers = np.array(model.clusterCenters())
    assigned = model.transform(v).drop("__mlvec")
    if path is not None:
        assigned.write.mode("overwrite").partitionBy("__centroid").parquet(path)
        assigned = df.sparkSession.read.parquet(path)
    else:
        # Materialize the assignment (truncated lineage) so the
        # persisted __mlvec blocks can be released now instead of
        # pinning executor storage for the life of the session.
        assigned = assigned.localCheckpoint()
    v.unpersist(False)
    return assigned, centers


def ivf_topk(
    df: DataFrame | None,
    query: "np.ndarray | list[float]",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    index: "tuple[DataFrame, np.ndarray] | None" = None,
) -> DataFrame:
    """IVF coarse-quantized ANN: probe the ``n_probe`` centroids
    nearest the query, exact cosine within the probed lists, global
    top-k via per-partition heaps (``TakeOrderedAndProject``).

    Pass ``index=ivf_index(...)`` to amortize quantizer training and
    assignment across queries (and to get partition-pruned scans when
    the index was materialized with ``path=``); without it, the index
    is built from ``df`` for this one call — convenience only."""
    if index is None:
        if df is None:
            raise ValueError("ivf_topk needs df or index=ivf_index(...)")
        index = ivf_index(
            df, vec_col=vec_col, id_col=id_col,
            n_centroids=n_centroids, seed=seed,
        )
    assigned, centers = index

    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    sims = centers @ qn / np.maximum(np.linalg.norm(centers, axis=1), 1e-30)
    probe = [int(i) for i in np.argsort(-sims)[:n_probe]]

    cos = make_cosine_udf(qn)
    return (
        assigned.filter(F.col("__centroid").isin(probe))
        .select(F.col(id_col), cos(F.col(vec_col)).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# ------------------------------------------------------- product quant

def _kmeans_np(X: np.ndarray, k: int, seed: int, n_iter: int = 25) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side sample (codebook
    training only — FAISS-style: sublinear in corpus size). Empty
    clusters keep their previous center, so the result is
    deterministic for a fixed (sample, seed)."""
    rng = np.random.default_rng(seed)
    centers = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    if len(centers) < k:  # degenerate tiny sample: pad by repetition
        centers = np.concatenate([centers] * (k // len(centers) + 1))[:k]
    for _ in range(n_iter):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            pts = X[a == j]
            if len(pts):
                centers[j] = pts.mean(0)
    return centers


def make_pq_encode_udf(codebooks: np.ndarray):
    """Arrow kernel: L2-normalize each vector, then per subspace emit
    the index of the nearest codeword. codebooks: (M, K, dsub)."""
    M, K, dsub = codebooks.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        X = _normalize_rows(_stack(vecs))
        codes = np.empty((len(X), M), dtype=np.int32)
        for m in range(M):
            sub = X[:, m * dsub : (m + 1) * dsub]
            d = ((sub[:, None, :] - codebooks[m][None, :, :]) ** 2).sum(-1)
            codes[:, m] = d.argmin(1)
        return pd.Series(list(codes))

    return enc


def make_adc_udf(lut: np.ndarray):
    """Arrow kernel: asymmetric-distance score of a code row against
    the query's per-subspace inner-product lookup table (M, K) —
    O(M) adds per vector instead of O(dim) multiplies."""
    M = lut.shape[0]
    rows = np.arange(M)

    @F.pandas_udf(T.DoubleType())
    def adc(codes: pd.Series) -> pd.Series:
        C = np.stack(codes.values).astype(np.int64)  # (b, M)
        return pd.Series(lut[rows[None, :], C].sum(axis=1))

    return adc


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    max_train: int = 16384,
) -> np.ndarray:
    """Train the (M, K, dsub) per-subspace PQ codebooks on a bounded,
    DETERMINISTIC driver-side sample: the ``max_train`` smallest ids
    (``orderBy(id).limit`` → one TakeOrderedAndProject, no full sort).
    Plain ``limit()`` would depend on Spark's incidental scan order,
    so the pinned recall certificates could flip on a Spark upgrade or
    a repartitioned fixture; id-ordered sampling makes (sample, seed)
    — and therefore the codebooks — a pure function of the data.

    Shared by ``pq_index`` and ``ivfpq_index`` so the IVFPQ build
    trains once and never encodes a corpus it will throw away."""
    dim = _vec_dim(df, vec_col)
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    dsub = dim // n_subspaces
    sample = (
        df.select(id_col, vec_col).orderBy(id_col).limit(max_train).toPandas()
    )
    X = _normalize_rows(_stack(sample[vec_col]))
    return np.stack(
        [
            _kmeans_np(X[:, m * dsub : (m + 1) * dsub], n_codes, seed + m)
            for m in range(n_subspaces)
        ]
    )


def pq_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    max_train: int = 16384,
) -> "tuple[DataFrame, np.ndarray]":
    """Product-quantization index (Jégou et al. TPAMI'11, the FAISS
    ``IndexPQ`` layout): train one k-means codebook per subspace on a
    bounded driver-side sample (≤ ``max_train`` vectors — training is
    sublinear in corpus size by design), then encode EVERY vector to
    ``n_subspaces`` small codes in one Arrow pass.

    The encoded table carries only (id, codes): n_subspaces ints per
    vector instead of dim floats — the memory compression that lets a
    100 TB corpus's index fit a fraction of the cluster. Returns
    ``(encoded, codebooks)``; reuse across probes (index-once /
    probe-many, same contract as ``ivf_index``/``lsh_index``)."""
    codebooks = train_pq_codebooks(
        df, vec_col=vec_col, id_col=id_col, n_subspaces=n_subspaces,
        n_codes=n_codes, seed=seed, max_train=max_train,
    )
    enc = make_pq_encode_udf(codebooks)
    encoded = (
        df.select(F.col(id_col), F.col(vec_col))
        .withColumn("__codes", enc(F.col(vec_col)))
        .select(id_col, "__codes")
        .localCheckpoint()  # truncate lineage; codes are tiny
    )
    return encoded, codebooks


def pq_topk(
    df: DataFrame | None,
    query: "np.ndarray | list[float]",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    index: "tuple[DataFrame, np.ndarray] | None" = None,
) -> DataFrame:
    """PQ/ADC approximate top-k by cosine: the query builds its (M, K)
    inner-product lookup table driver-side (KBs), every encoded vector
    is scored with M table adds (asymmetric distance computation), and
    the global top-k merges through per-partition heaps
    (``TakeOrderedAndProject``). Scores approximate the cosine of the
    *reconstructed* vector — quality is pinned by the ``pq_recall``
    driver certificate."""
    if index is None:
        if df is None:
            raise ValueError("pq_topk needs df or index=pq_index(...)")
        index = pq_index(
            df, vec_col=vec_col, id_col=id_col,
            n_subspaces=n_subspaces, n_codes=n_codes, seed=seed,
        )
    encoded, codebooks = index
    M, K, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    lut = np.stack(
        [codebooks[m] @ qn[m * dsub : (m + 1) * dsub] for m in range(M)]
    )  # (M, K)
    adc = make_adc_udf(lut)
    return (
        encoded.select(F.col(id_col), adc(F.col("__codes")).alias("adc_score"))
        .orderBy(F.col("adc_score").desc(), F.col(id_col))
        .limit(k)
    )


def ivfpq_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 42,
) -> "tuple[DataFrame, np.ndarray, np.ndarray]":
    """Combined IVF+PQ index (the FAISS ``IndexIVFPQ`` layout): the
    coarse quantizer routes each vector to a centroid list (probe-time
    partition pruning), and within every list the vector is stored as
    ``n_subspaces`` PQ codes (memory compression). The two index
    families compose: at 100 TB the IVF side prunes the scan to
    ``n_probe/n_centroids`` of the corpus and the PQ side shrinks what
    remains by ~dim·4/n_subspaces ×.

    Returns ``(encoded, centers, codebooks)`` where ``encoded`` holds
    (id, __centroid, __codes)."""
    assigned, centers = ivf_index(
        df, vec_col=vec_col, id_col=id_col,
        n_centroids=n_centroids, seed=seed,
    )
    codebooks = train_pq_codebooks(
        df, vec_col=vec_col, id_col=id_col,
        n_subspaces=n_subspaces, n_codes=n_codes, seed=seed,
    )
    enc = make_pq_encode_udf(codebooks)
    encoded = (
        assigned.withColumn("__codes", enc(F.col(vec_col)))
        .select(id_col, "__centroid", "__codes")
        .localCheckpoint()
    )
    return encoded, centers, codebooks


def ivfpq_topk(
    query: "np.ndarray | list[float]",
    k: int = 10,
    n_probe: int = 4,
    index: "tuple[DataFrame, np.ndarray, np.ndarray] | None" = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFPQ ANN: probe the ``n_probe`` nearest centroid lists, score
    survivors by PQ/ADC lookup-table adds, merge top-k through
    per-partition heaps. The compounded approximation (list pruning ×
    code quantization) is what the ``ivfpq_recall`` certificate
    pins."""
    if index is None:
        raise ValueError("ivfpq_topk needs index=ivfpq_index(...)")
    encoded, centers, codebooks = index
    M, K, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    sims = centers @ qn / np.maximum(np.linalg.norm(centers, axis=1), 1e-30)
    probe = [int(i) for i in np.argsort(-sims)[:n_probe]]
    lut = np.stack(
        [codebooks[m] @ qn[m * dsub : (m + 1) * dsub] for m in range(M)]
    )
    adc = make_adc_udf(lut)
    return (
        encoded.filter(F.col("__centroid").isin(probe))
        .select(F.col(id_col), adc(F.col("__codes")).alias("adc_score"))
        .orderBy(F.col("adc_score").desc(), F.col(id_col))
        .limit(k)
    )


def hard_negatives(
    df: DataFrame,
    queries: "np.ndarray | list | DataFrame",
    k: int = 5,
    lo: float = 0.3,
    hi: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    query, the top-``k`` most-similar corpus vectors whose cosine
    lies in the band [``lo``, ``hi``) — above ``lo`` so the negative
    is HARD (informative gradient), below ``hi`` so near-duplicates
    of the anchor (false negatives that would poison the loss) are
    excluded. Self-matches fall out with the band (cos=1 >= hi).

    Same plan shape as ``knn_join`` (one corpus scan, per-batch GEMM
    against all anchors) with the crucial difference that the BAND
    MASK applies before the local top-k — a filter after a plain
    top-k would let near-duplicates occupy the k slots and starve
    the output. Shuffles at most partitions x q x k candidate rows.

    Determinism: each batch is pre-sorted by ``id_col`` and the
    local top-k uses a STABLE sort, so boundary ties (duplicate
    corpus vectors are common in dedup corpora) keep the LOWEST ids
    — matching the global (cosine desc, id asc) re-rank and a SQL
    ``QUALIFY row_number()`` oracle. Cosine is computed dot-FIRST
    (``(M @ Q.T) / (||m||·||q||)``, not normalize-then-GEMM): for
    integer-valued inputs the GEMM sums are exact in float64
    regardless of summation order, and the remaining ops
    (sqrt → multiply → max-guard → divide) are single correctly-
    rounded IEEE steps, so a SQL engine evaluating the same
    expression tree produces bit-identical cosines (the
    ``hard_negatives`` certificate quantizes inputs to exploit
    this). For general float inputs results are standard
    float-accurate cosine.
    """
    from pyspark.sql import Window as W

    if isinstance(queries, DataFrame):
        rows = queries.select(query_id_col, vec_col).collect()
        qids = np.array([r[0] for r in rows], dtype=np.int64)
        Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    else:
        qids = np.arange(len(queries), dtype=np.int64)
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in queries])
    qnorm = np.sqrt((Q * Q).sum(axis=1))
    kk, flo, fhi = int(k), float(lo), float(hi)

    out_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def local_topk(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            M = _stack(pdf[vec_col])[order]
            mnorm = np.sqrt((M * M).sum(axis=1))
            # dot-first: exact GEMM for integer-valued inputs, then
            # one multiply + one divide per cell (engine-portable)
            denom = np.maximum(np.outer(mnorm, qnorm), 1e-30)
            S = (M @ Q.T) / denom  # (batch, q)
            in_band = (S >= flo) & (S < fhi)
            S_masked = np.where(in_band, S, -np.inf)
            take = min(kk, S.shape[0])
            # stable sort over id-ordered rows: boundary ties keep
            # the lowest ids, matching the global re-rank's
            # (cosine desc, id asc) order exactly
            part = np.argsort(-S_masked, axis=0, kind="stable")[:take, :]
            qcol = np.repeat(qids, take)
            rcol = part.T.reshape(-1)
            scores = S_masked[rcol, np.repeat(np.arange(len(qids)), take)]
            keep = np.isfinite(scores)
            yield pd.DataFrame(
                {
                    query_id_col: qcol[keep],
                    id_col: ids[rcol[keep]],
                    "cosine": scores[keep],
                }
            )

    cand = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        local_topk, schema=out_schema
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= kk)
        .drop("__rn")
    )


def silhouette_fixed(
    df: DataFrame,
    vec_col: str,
    centroids: "list[list[float]]",
    qbits: int = 20,
) -> DataFrame:
    """Simplified silhouette against FIXED centroid vectors — the
    cluster-quality readout (Rousseeuw 1987's silhouette with the
    standard centroid simplification): each vector is assigned to
    its nearest centroid (Euclidean, first-index tie-break — the
    `kmeans_fixed` convention), a = that distance, b = the distance
    to the nearest OTHER centroid, s = (b - a)/max(a, b).

    Engine-exactness: the centroids are driver-known literals, every
    distance is a pinned LEFT-FOLD over dimensions (init 0.0, acc +
    (x_i - c_i)^2 — the `ewma` fold argument, replayed by the oracle
    as list_reduce(list_prepend(0.0, ...))), a/b come from
    array_sort over the k computed doubles (identical on both
    engines because the inputs are identical doubles), and each
    row's s is QUANTIZED to round(s * 2^qbits) so the per-cluster
    sums are exact integers; mean_sil is one final division. A
    vector equal to two centroids (max(a,b) = 0) scores s = 0 by
    convention; a vector whose dimension differs from the
    centroids' RAISES in-plan (a silent drop would bias the
    readout), while NULL vectors are excluded like any aggregate
    NULL.

    Returns one row per cluster: (cluster, n, sil_q, mean_sil).
    Plan: one narrow codegen projection (k ordered folds per row) +
    one k-row aggregation — zero joins, zero shuffles wider than k
    rows; the centroid list is expression literals, never data.
    """
    k = len(centroids)
    if k < 2:
        raise ValueError("silhouette_fixed: needs >= 2 centroids")
    dim = len(centroids[0])
    if any(len(c) != dim for c in centroids):
        raise ValueError("silhouette_fixed: centroid dims differ")

    def dist(c):
        lit = F.array(*[F.lit(float(x)) for x in c])
        sq = F.zip_with(
            F.col(vec_col),
            lit,
            lambda a, b: (a.cast("double") - b)
            * (a.cast("double") - b),
        )
        return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))

    dists = F.array(*[dist(c) for c in centroids])
    srt = F.array_sort(dists)
    a = F.element_at(srt, 1)
    b = F.element_at(srt, 2)
    # wrong-dimension vectors RAISE (review r10: the loud-guard
    # convention — a silent drop would report cluster quality over
    # a biased subpopulation); NULL vectors are excluded like NULLs
    # in any aggregate
    cluster = F.when(
        F.size(vec_col) != dim,
        F.raise_error(
            F.concat(
                F.lit(
                    f"silhouette_fixed: vector dimension != {dim}: "
                ),
                F.size(vec_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise((F.array_position(dists, a) - 1).cast("long"))
    s = F.when(
        F.greatest(a, b) > 0.0, (b - a) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    sq_col = F.round(s * F.lit(float(1 << qbits))).cast("long")
    per = (
        df.filter(F.col(vec_col).isNotNull())
        .select(cluster.alias("cluster"), sq_col.alias("__sq"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__sq").cast("long").alias("sil_q"),
        )
    )
    return per.select(
        "cluster",
        "n",
        "sil_q",
        (
            F.col("sil_q").cast("double")
            / (F.col("n").cast("double") * F.lit(float(1 << qbits)))
        ).alias("mean_sil"),
    )
