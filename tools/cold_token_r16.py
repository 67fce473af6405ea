"""token_stats cold-cost attribution (VERDICT r15 item 4).

Hypothesis: the 1.3 s cold-vs-warm gap on `token_stats` is FIRST-USE
JVM work (java.util.regex JIT + codegen for the regex/split/higher-
order-function expression classes) that any first text query would
pay, not work attributable to the token_stats operator. Test: fresh
JVM per scenario (bench-identical warmup), then time the declared
queries in different orders. If token_stats is cheap when another
text query runs first — and that query inherits the cold cost — the
gap is shared VM warmup and a per-query "fix" would only shift it.

Usage: python tools/cold_token_r16.py <order>   # order in
  {token_first, quality_first, lang_first}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    order = sys.argv[1]
    seqs = {
        "token_first": ["token_stats", "quality", "lang_id"],
        "quality_first": ["quality", "token_stats", "lang_id"],
        "lang_first": ["lang_id", "token_stats", "quality"],
    }
    names = seqs[order]

    import __spark_entry__ as entrymod
    from hdfe_spark.session import get_spark
    from hdfe_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"cold_token_{order}")
    load_table(spark, "lineitem", SF_DIR).agg(F.count(F.lit(1))).collect()
    qs = entrymod.queries()
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{order} {name}: {time.perf_counter() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
