"""hdfe_spark — a PySpark-native panel-analytics / training-data engine.

Re-expresses the capability surface of the reference library
``esantorella/hdfe`` (grouped aggregate/transform kernels, panel lag
expansion, sparse categorical encoding, high-dimensional fixed-effects
least squares, rank repair, robust variance) as idiomatic Spark
DataFrame transformations, and extends it with the large-scale
training-data operators a 100 TB pipeline needs (dedup, similarity
search, text analysis, multimodal column plumbing).

Design stance (see SURVEY.md §7):

- Every operator takes and returns ``pyspark.sql.DataFrame`` and
  composes into a single lazy Catalyst plan where possible.
- Grouping/windowing/shuffle/pruning are left to Catalyst; no custom
  planner rules.
- Python only touches k×k / (n_groups×k) driver-side matrices; all
  data-sized work is distributed (one Gram aggregation, one Window
  pass, ...).
- Arbitrary user functions go through Arrow-batched
  ``applyInPandas`` — never row-at-a-time Python UDFs.
"""

from hdfe_spark.operators.groupby import Groupby, grouped_agg, grouped_transform
from hdfe_spark.operators.lags import make_lags, make_one_lag
from hdfe_spark.operators.encoding import make_dummies, get_all_dummies
from hdfe_spark.operators.collinearity import (
    find_collinear_cols,
    remove_collinear_cols,
    gram_matrix,
)
from hdfe_spark.operators.estimate import estimate, EstimateResult
from hdfe_spark.operators.dedup import (
    exact_dedup_by_hash,
    minhash_dedup,
    minhash_candidate_pairs,
    simhash_dedup,
    simhash_neardup_pairs,
    embedding_neardup_pairs,
)
from hdfe_spark.operators.similarity import (
    cosine_topk,
    knn_join,
    ann_topk_lsh,
    ivf_index,
    ivf_topk,
)
from hdfe_spark.operators.asof import asof_join
from hdfe_spark.operators.graph import connected_components, dedup_by_components
from hdfe_spark.operators.sessions import session_stats, sessionize
from hdfe_spark.operators.text import (
    fingerprint_neardup_pairs,
    tf_idf,
    token_stats,
    quality_score,
    lang_id,
    doc_fingerprint,
)

__all__ = [
    "Groupby",
    "grouped_agg",
    "grouped_transform",
    "make_lags",
    "make_one_lag",
    "make_dummies",
    "get_all_dummies",
    "find_collinear_cols",
    "remove_collinear_cols",
    "gram_matrix",
    "estimate",
    "EstimateResult",
    # training-data pipeline layer
    "exact_dedup_by_hash",
    "minhash_dedup",
    "minhash_candidate_pairs",
    "simhash_dedup",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    "cosine_topk",
    "knn_join",
    "ann_topk_lsh",
    "ivf_index",
    "ivf_topk",
    "token_stats",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "fingerprint_neardup_pairs",
    "tf_idf",
    "sessionize",
    "session_stats",
    "connected_components",
    "dedup_by_components",
    "asof_join",
]

__version__ = "0.1.0"
