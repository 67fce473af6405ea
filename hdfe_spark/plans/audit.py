"""Physical-plan auditing: the scale checklist as code.

The reference has no optimizer to audit (SURVEY.md §4: hard-coded
numpy fast paths). In the Spark engine, the plan IS the performance
contract at 100 TB, so the things a reviewer would eyeball in
``df.explain("formatted")`` — shuffle count, broadcast vs sort-merge
joins, filter/column pushdown into the parquet scan, whole-stage
codegen coverage, Arrow/Python stage count — are extracted here into a
dict that tests can assert on and the bench can report. Every operator
in this engine has a plan-shape test (``tests/test_plans.py``) so a
regression that, say, turns a broadcast join into a sort-merge join or
adds a second shuffle to ``demean`` fails CI, not the cluster.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` as a string (PySpark only prints it)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_report(df: DataFrame) -> dict:
    """Extract the scale-relevant facts from a physical plan.

    Keys:

    - ``n_exchanges`` — shuffle boundaries (AQE may later coalesce
      them, but each is a full network pass at 100 TB).
    - ``n_broadcast_joins`` / ``n_sortmerge_joins`` — small-side joins
      must broadcast; a sort-merge join against a dimension table is a
      plan bug.
    - ``n_python_stages`` — Arrow/pandas evaluation stages
      (ArrowEval / FlatMapGroupsInPandas / MapInPandas / ...); the
      slow path, to be minimized and batch-shaped when present.
    - ``n_codegen_spans`` — whole-stage-codegen regions.
    - ``pushed_filters`` — list of filters that reached the parquet
      scan; ``scan_schemas`` — the pruned ReadSchema per scan (a scan
      reading all columns for a 2-column projection is a plan bug).
    - ``has_take_ordered`` — global top-k compiled to
      TakeOrderedAndProject (per-partition heaps), not a full sort.
    """
    s = explain_string(df, "formatted")
    simple = explain_string(df, "simple")
    report = {
        # Shuffle exchanges only: total Exchange nodes minus broadcast ones.
        "n_exchanges": simple.count("Exchange") - simple.count("BroadcastExchange"),
        "n_broadcast_joins": simple.count("BroadcastHashJoin")
        + simple.count("BroadcastNestedLoopJoin"),
        "n_sortmerge_joins": simple.count("SortMergeJoin"),
        "n_python_stages": sum(
            simple.count(op)
            for op in (
                "ArrowEvalPython",
                "BatchEvalPython",
                "FlatMapGroupsInPandas",
                "MapInPandas",
                "FlatMapGroupsInPandasWithState",
            )
        ),
        "n_codegen_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "has_take_ordered": "TakeOrderedAndProject" in simple,
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", s),
        "scan_schemas": re.findall(r"ReadSchema: (struct<[^\n]*)", s),
    }
    report["n_broadcast_exchanges"] = simple.count("BroadcastExchange")
    # Key-hash repartitions specifically (round-robin spreads of a
    # too-narrow scan are benign; a surprise hashpartitioning is not).
    report["n_hash_exchanges"] = len(
        re.findall(r"Exchange hashpartitioning", simple)
    )
    return report


def assert_plan(df: DataFrame, **expect) -> dict:
    """Assert plan facts: ``assert_plan(df, n_exchanges=1,
    n_sortmerge_joins=0)``. Supports ``<key>_max`` upper bounds.
    Returns the report for further checks."""
    rep = plan_report(df)
    for key, want in expect.items():
        if key.endswith("_max"):
            k = key[: -len("_max")]
            got = rep[k]
            assert got <= want, f"{k}: got {got}, want ≤ {want}\n{explain_string(df)}"
        else:
            got = rep[key]
            assert got == want, f"{key}: got {got}, want {want}\n{explain_string(df)}"
    return rep
