"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


class NonScalarCellError(ValueError):
    """An oracle-checked output column contains list/ndarray/dict cells.

    The DRIVER's canonicalizer sorts the collected frame with pandas
    ``sort_values`` over every column and crashes on unhashable cells
    (the round-6 ``inverted_index`` err: ``postings: array<string>`` →
    ``TypeError: unhashable type: 'list'``).  The old replica gate
    silently tupled lists before sorting, so it modeled the driver too
    charitably and green-lit a query the driver could never hash.  The
    replica must PREDICT the driver, so non-scalar cells are a hard
    FAIL here: scalar-render arrays on both engines instead
    (Spark ``array_join(sort_array(...), ',')`` ↔ DuckDB
    ``array_to_string(list_sort(...), ',')``) or emit long form.
    """


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray, dict, set))).any():
            raise NonScalarCellError(
                f"column {c!r} contains non-scalar cells; the driver's pandas "
                "canonicalizer cannot sort them — scalar-render the array "
                "(array_join / array_to_string) or emit long form"
            )
    return pdf.sort_values(list(pdf.columns), na_position="first").reset_index(drop=True)


def _num_kind(v) -> str | None:
    """Classify a scalar the way the driver's canonical hash sees it.

    The driver hashes the *repr* of canonicalized values, so ``5`` (Spark
    bigint) and ``5.0`` (DuckDB DECIMAL(38,0) -> pandas float64) hash
    differently even though Python ``==`` says they're equal.  Treat
    int-vs-float as a mismatch here so the local gate predicts the driver.

    ``decimal.Decimal`` is its own kind: Spark collects DECIMAL columns
    as ``Decimal('1061400897.6700')`` while DuckDB's pandas bridge
    degrades DECIMAL(38,4) to float64 ``1061400897.67`` — numerically
    equal, repr-hash different (the round-5 ``decimal_agg`` red, which
    the old float-classing masked). Decimal-vs-float must FAIL here.
    """
    if isinstance(v, (bool, np.bool_)):
        return "b"
    if isinstance(v, (int, np.integer)):
        return "i"
    if isinstance(v, decimal.Decimal):
        return "d"
    if isinstance(v, (float, np.floating)):
        return "f"
    return None


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    ka, kb = _num_kind(a), _num_kind(b)
    if ka is not None or kb is not None:
        if ka != kb:
            return False  # dtype-strict: 5 != 5.0 for hashing purposes
        if ka == "d":
            # Decimals hash by repr: same value at a different scale
            # (Decimal('1.5') vs Decimal('1.50')) is a driver mismatch.
            return str(a) == str(b)
        if ka == "f":
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
        return a == b
    return a == b


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    try:
        s = normalize(spark_pdf)
        d = normalize(duck_pdf)
    except NonScalarCellError as e:
        problems.append(f"non-scalar output (driver canonicalizer would crash): {e}")
        return problems
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(f"col {c}: {len(bad)}/{len(sv)} mismatches, first at {i}: {x!r} != {y!r}")
    return problems


def main():
    import __spark_entry__ as entrymod
    from hdfe_spark.session import get_spark

    only = set(sys.argv[1:])
    if os.environ.get("ORACLE_VANILLA"):
        # Replicate the driver exactly: a bare builder session — no
        # engine confs (load_table must set everything it needs at
        # runtime), default 200 shuffle partitions.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
    else:
        spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(spark_pdf) >= 0
            print(f"rows-only  {name}: {len(spark_pdf)} rows")
            n_rowsonly += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
