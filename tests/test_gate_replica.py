"""The local driver-replica gate (`tools/check_oracle.py`) must
PREDICT the driver's repr-hash comparison, not merely numeric
equality. Round 5's only red (`decimal_agg`) slipped through because
the replica classed `decimal.Decimal` as float-comparable while the
driver hashed `Decimal('1061400897.6700')` vs float64
`1061400897.67` differently. These tests pin the hardened kinds."""

import decimal
import importlib.util
import os
import sys

import numpy as np
import pandas as pd

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(_TOOLS, "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


gate = _load()


def test_decimal_vs_float_is_a_mismatch():
    # The exact round-5 failure pair: numerically equal, hash-different.
    d = decimal.Decimal("1061400897.6700")
    f = 1061400897.67
    assert not gate.values_equal(d, f)
    assert not gate.values_equal(f, d)


def test_decimal_scale_matters():
    # Same value at a different scale reprs differently -> driver fail.
    assert not gate.values_equal(
        decimal.Decimal("1.5"), decimal.Decimal("1.50")
    )
    assert gate.values_equal(
        decimal.Decimal("1.50"), decimal.Decimal("1.50")
    )


def test_int_vs_float_still_strict():
    assert not gate.values_equal(5, 5.0)
    assert gate.values_equal(5, np.int64(5))
    assert gate.values_equal(5.0, np.float64(5.0))


def test_old_decimal_agg_form_would_fail_compare():
    # Simulate the round-5 wire shapes end-to-end through compare():
    # Spark returns Decimal, DuckDB's .df() bridge returns float64.
    spark_pdf = pd.DataFrame(
        {"flag": ["A"], "sum_price_exact": [decimal.Decimal("1061400897.6700")]}
    )
    duck_pdf = pd.DataFrame({"flag": ["A"], "sum_price_exact": [1061400897.67]})
    problems = gate.compare("decimal_agg_old", spark_pdf, duck_pdf)
    assert problems, "gate must now predict the driver's decimal_agg fail"


def test_string_rendered_form_passes_compare():
    spark_pdf = pd.DataFrame(
        {"flag": ["A"], "sum_price_exact": ["1061400897.6700"]}
    )
    duck_pdf = pd.DataFrame(
        {"flag": ["A"], "sum_price_exact": ["1061400897.6700"]}
    )
    assert gate.compare("decimal_agg_new", spark_pdf, duck_pdf) == []


def test_nonscalar_cells_fail_compare():
    """The round-6 `inverted_index` err class: the DRIVER's pandas
    canonicalizer crashes on list cells; the replica must FAIL such
    outputs instead of tupling them up (the old charitable path)."""
    spark_pdf = pd.DataFrame(
        {"token": ["a"], "df": [1], "postings": [["d1", "d2"]]}
    )
    duck_pdf = pd.DataFrame(
        {"token": ["a"], "df": [1], "postings": [["d1", "d2"]]}
    )
    problems = gate.compare("inverted_index_old", spark_pdf, duck_pdf)
    assert problems and "non-scalar" in problems[0], problems


def test_ndarray_cells_fail_compare():
    spark_pdf = pd.DataFrame({"k": [1], "v": [np.array([1.0, 2.0])]})
    duck_pdf = pd.DataFrame({"k": [1], "v": [np.array([1.0, 2.0])]})
    problems = gate.compare("arr", spark_pdf, duck_pdf)
    assert problems and "non-scalar" in problems[0], problems


def test_scalar_rendered_postings_pass_compare():
    spark_pdf = pd.DataFrame({"token": ["a"], "df": [1], "postings": ["3,7,9"]})
    duck_pdf = pd.DataFrame({"token": ["a"], "df": [1], "postings": ["3,7,9"]})
    assert gate.compare("inverted_index_new", spark_pdf, duck_pdf) == []
