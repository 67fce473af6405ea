"""Capture ``.explain("formatted")`` for headline queries into
``plans/<tag>/<query>_<suffix>.txt`` (the optimization-round evidence
files; the judge checks plan claims against these).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r15 before
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "grouped_agg", "grouped_transform", "grouped_apply", "demean", "lags",
    "factorize", "dummies", "gram", "ols_pooled", "ols_within_fe", "ols_2fe",
    "se_cluster", "residuals", "all_dummies", "fe_effects", "exact_dedup",
    "token_stats", "quality", "lang_id", "tfidf_topk", "sessionize",
    "asof_join", "pipeline_curate", "minhash_dedup", "simhash_dedup",
    "cosine_topk", "knn_join", "ngram_jaccard", "embedding_neardup_lsh",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE

    import __spark_entry__ as entrymod
    from hdfe_spark.session import get_spark

    spark = get_spark(app_name="hdfe_spark_plans")
    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(False)


if __name__ == "__main__":
    main()
