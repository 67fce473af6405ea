"""Sequence packing: assign documents to fixed-capacity context
windows — the transform that turns a curated corpus into LLM training
sequences.

Training pipelines concatenate documents in a fixed order and cut the
stream into ``capacity``-token windows (documents straddle
boundaries; GPT-style packing). That makes a document's window id a
pure function of the EXCLUSIVE running total of tokens before it:

    bin    = prefix_tokens DIV capacity
    offset = prefix_tokens MOD capacity

so the whole operator is ``operators/rank.py::prefix_sum`` (the
distributed exact running total — no single-partition window) plus
two integer projections. Deterministic on any engine for an integer
token column and a total order, which is what the driver's
window-cumsum DuckDB oracle hash-checks.

Scale: one range shuffle + pinned materialization (the prefix-sum
machinery), then narrow arithmetic. At 100 TB the per-partition sum
collect is ``n_partitions`` longs — never data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdfe_spark.operators._guards import quote_ident
from hdfe_spark.operators.rank import prefix_sum


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_by: Sequence[str],
    capacity: int,
    bin_col: str = "bin",
    offset_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``bin_col`` (0-based context-window id) and ``offset_col``
    (token offset of this document's first token inside its window)
    under the total order ``order_by``. ``token_col`` must be integer
    (token counts); ``capacity`` is the window length in tokens."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    cum = prefix_sum(
        df, order_by, token_col, out_col="__cum", num_partitions=num_partitions
    )
    prefix = F.col("__cum") - F.col(token_col)  # exclusive running total
    return (
        cum.withColumn(
            bin_col,
            F.expr(
                f"(__cum - {quote_ident(token_col)}) div {capacity}"
            ),
        )
        .withColumn(offset_col, prefix % capacity)
        .drop("__cum")
    )
