"""Whole-frame coercion drivers + role/dtype inference (reference API parity:
coerce_dataframe_to_selected_types, coerce_dataframe_by_roles,
validate_dataframe, guess_datatype/guess_role)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, TimestampType

from ndap_data_validator_spark.operators.coerce import (
    coerce_by_dtypes,
    coerce_by_roles,
    null_census,
)
from ndap_data_validator_spark.rules.inference import (
    guess_assignments,
    guess_dtype,
    guess_role,
)


def test_coerce_by_dtypes(spark):
    df = spark.createDataFrame(
        [("1", "1.5", "yes"), ("2.5", "x", "no"), (None, None, "maybe")],
        "a string, b string, c string",
    )
    coerced, report = coerce_by_dtypes(
        df, {"a": "integer", "b": "float", "c": "boolean"}
    )
    assert dict(coerced.dtypes) == {"a": "bigint", "b": "double", "c": "boolean"}
    rep = {r["column"]: r["conversion_errors"] for r in report.collect()}
    assert rep == {"a": 1, "b": 1, "c": 1}


def test_coerce_by_roles_defaults_others(spark):
    df = spark.createDataFrame([("x", "1")], "a string, b string")
    coerced, report = coerce_by_roles(df, {"b": "Measures"}, {"b": "float"})
    assert dict(coerced.dtypes) == {"a": "string", "b": "double"}
    rep = {r["column"]: r["conversion_errors"] for r in report.collect()}
    assert rep == {"a": 0, "b": 0}


def test_null_census(spark):
    df = spark.createDataFrame(
        [("a", None), (None, None), ("c", "x")], "p string, q string"
    )
    got = {r["column"]: r["nulls"] for r in null_census(df).collect()}
    assert got == {"p": 1, "q": 2, "<total>": 3}


def test_guess_dtype_and_role():
    assert guess_dtype(LongType()) == "integer"
    assert guess_dtype(DoubleType()) == "float"
    assert guess_dtype(TimestampType()) == "datetime"
    assert guess_dtype(StringType()) == "string"
    assert guess_role("created_date", StringType()) == ("Time", None)
    assert guess_role("fiscal_year", LongType()) == ("Time", None)  # name wins
    assert guess_role("amount", LongType()) == ("Measures", "integer")
    assert guess_role("ratio", DoubleType()) == ("Measures", "float")
    assert guess_role("state", StringType()) == ("Others", None)


def test_guess_assignments(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "x")], "qty long, rate double, name string"
    ).withColumn("ts", F.current_timestamp())
    got = {a.column: (a.role, a.measure_type) for a in guess_assignments(df)}
    assert got == {
        "qty": ("Measures", "integer"),
        "rate": ("Measures", "float"),
        "name": ("Others", None),
        "ts": ("Time", None),
    }
